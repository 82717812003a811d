"""Experiment: can a scratch-serialized max-plus step lift the S=256
Pallas Viterbi VMEM gate?

Background (BASELINE.md "large-S Viterbi VMEM-stack findings"): the
max-plus step best[j,b] = max_i(v[i,b] + T[i,j]) written as Sp unrolled
rank-1 broadcast-maxes lets Mosaic schedule all Sp independent adds
ahead of the max chain and stack-allocate ALL Sp [Sp,Bg] f32 temporaries
(S=256: ~32 MB, OOM at every batch-group size; value-carried max chains
and scratch ACCUMULATORS do not stop the hoisting because the adds do
not depend on them).

Hypothesis tested here: route each ROW-BLOCK's broadcast-add through a
single VMEM scratch ref (write tmp_ref, read it back for the reduce).
Write-after-read hazards on tmp_ref across block iterations force full
serialization, so the live set is one [BLK, Sp, Bg] block (~1 MB at
BLK=8) regardless of Sp.

Run on the TPU chip:  python tools/exp_maxplus_s256.py
Prints one line per formulation: fits / OOM, ms per max-plus sweep,
and max|delta| vs the XLA reference.
"""

import functools
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 64          # sequential max-plus sweeps inside the kernel


def _kernel_unrolled(v_ref, t_ref, o_ref):
    """Formulation A: round-1/2 production shape (repro of the OOM)."""
    Sp = t_ref.shape[0]

    def step(_, v):
        best = v[0:1, :] + t_ref[0, :][:, None]
        for i in range(1, Sp):
            best = jnp.maximum(best, v[i:i + 1, :] + t_ref[i, :][:, None])
        return best - jnp.max(best, axis=0, keepdims=True)

    o_ref[:, :] = jax.lax.fori_loop(0, STEPS, step, v_ref[:, :])


def _kernel_scratch_blocks(blk, v_ref, t_ref, o_ref, tmp_ref, acc_ref):
    """Formulation B: block adds serialized through one scratch ref."""
    Sp = t_ref.shape[0]
    n_blk = Sp // blk

    def step(_, v):
        # acc starts at block 0's reduce; remaining blocks fold in.
        tmp_ref[:, :, :] = (
            v[0:blk, :][:, None, :] + t_ref[0:blk, :][:, :, None]
        )
        acc_ref[:, :] = jnp.max(tmp_ref[:, :, :], axis=0)
        for b in range(1, n_blk):
            i0 = b * blk
            tmp_ref[:, :, :] = (
                v[i0:i0 + blk, :][:, None, :]
                + t_ref[i0:i0 + blk, :][:, :, None]
            )
            acc_ref[:, :] = jnp.maximum(
                acc_ref[:, :], jnp.max(tmp_ref[:, :, :], axis=0)
            )
        best = acc_ref[:, :]
        return best - jnp.max(best, axis=0, keepdims=True)

    o_ref[:, :] = jax.lax.fori_loop(0, STEPS, step, v_ref[:, :])


def _ref_sweep(v, t):
    def step(v, _):
        best = jnp.max(v[:, None, :] + t[:, :, None], axis=0)
        return best - jnp.max(best, axis=0, keepdims=True), None

    out, _ = jax.lax.scan(step, v, None, length=STEPS)
    return out


def run(name, fn, v, t):
    try:
        out = jax.block_until_ready(fn(v, t))
    except Exception as e:  # noqa: BLE001 — report compile OOMs
        msg = str(e).split("\n")[0][:160]
        print(f"{name:28s} FAIL: {msg}")
        return
    ref = _ref_sweep(v, t)
    err = float(jnp.max(jnp.abs(out - ref)))
    n, reps = time.perf_counter, 20
    t0 = n()
    for _ in range(reps):
        out = fn(v, t)
    jax.block_until_ready(out)
    ms = (n() - t0) / reps * 1e3
    print(f"{name:28s} ok   {ms:8.3f} ms/{STEPS}-sweep   maxerr {err:.2e}")


def main():
    Sp, Bg = 256, 128
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(Sp, Bg), jnp.float32)
    t = jnp.asarray(rng.randn(Sp, Sp), jnp.float32)

    out_shape = jax.ShapeDtypeStruct((Sp, Bg), jnp.float32)

    a = jax.jit(pl.pallas_call(_kernel_unrolled, out_shape=out_shape))
    run(f"A unrolled Sp={Sp}", a, v, t)

    for blk in (8, 16, 32):
        kern = functools.partial(_kernel_scratch_blocks, blk)
        b = jax.jit(pl.pallas_call(
            kern,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((blk, Sp, Bg), jnp.float32),
                pltpu.VMEM((Sp, Bg), jnp.float32),
            ],
        ))
        run(f"B scratch blk={blk}", b, v, t)


if __name__ == "__main__":
    main()
