"""Benchmark the CFG inside-outside EM and CYK decode engines.

Measures, on the local accelerator:
  * cfg_em_stats batched E-step (inside chart + fused outside counts)
  * cfg_inside_loglik (the match-bonus grid's inner pass)
  * batched CYK Viterbi decode (chart + in-device traceback)

Usage:  python tools/bench_cfg.py [--windows N] [--span L] [--states S]

Timing protocol: async-chain dispatch, scalar fetch as the only sync
(BASELINE.md: block_until_ready can return early through the tunnel).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument("--span", type=int, default=256)
    ap.add_argument("--states", type=int, default=8)
    ap.add_argument("--tracks", type=int, default=2)
    ap.add_argument("--vocab", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tehmm_tpu.models.cfg import (
        _cfg_decode_batch, cfg_inside_loglik, make_cfg_params,
    )
    from tehmm_tpu.models.cfg_em import _cfg_em_stats_batched
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.models.params import init_random
    from tehmm_tpu.utils.platform import setup_jax

    setup_jax()
    N, L, S, T, V = (args.windows, args.span, args.states,
                     args.tracks, args.vocab)
    print(f"device={jax.devices()[0]}  N={N} L={L} S={S} T={T} V={V}",
          flush=True)

    rng = np.random.RandomState(0)
    hmm = init_random(S, [V] * T, seed=0)
    params = make_cfg_params(hmm, pair_states=[1], match_bonus=1.0)
    sym = jnp.asarray(rng.randint(1, V, size=(N, L, T)), jnp.int32)
    obs = track_log_likelihoods(hmm.log_em, sym)

    # rooflines (round-4 VERDICT weak #3: CFG rates had no stated
    # ceiling).  The prob-space contractions pin Precision.HIGHEST
    # (f32 = 6 MXU passes): effective peak 197/6 TFLOP/s.  CYK Viterbi
    # is max-plus (no matmuls): its ceiling is the VPU add+max rate
    # measured by tools/bench_decode_roofline.py (2.48e12 op/s on the
    # dev v5e; re-measure with that tool on other chips).
    MXU_6PASS_PEAK = 197e12 / 6
    VPU_ADDMAX_CEILING = 2.48e12

    from tehmm_tpu.utils.profiling import marginal_time

    def timed(tag, fn, fetch, iters=args.iters, cells_per_iter=None,
              mxu_flops_per_iter=None, vpu_ops_per_iter=None):
        """Two-point marginal rate (the shared protocol —
        tehmm_tpu.utils.profiling.marginal_time)."""
        dt = marginal_time(fn, fetch, iters)
        pos = N * L / dt
        extra = ""
        if cells_per_iter:
            extra = f"  {cells_per_iter / dt / 1e9:8.1f} Gcell/s"
        if mxu_flops_per_iter:
            pct = 100 * mxu_flops_per_iter / dt / MXU_6PASS_PEAK
            extra += (f"  {mxu_flops_per_iter / dt / 1e12:5.2f} TFLOP/s"
                      f" = {pct:5.1f}% of 6-pass MXU roofline")
        if vpu_ops_per_iter:
            pct = 100 * vpu_ops_per_iter / dt / VPU_ADDMAX_CEILING
            extra += (f"  {vpu_ops_per_iter / dt / 1e12:5.2f} Top/s"
                      f" = {pct:5.1f}% of VPU add+max ceiling")
        print(f"{tag:28s} {dt * 1e3:9.2f} ms  {pos / 1e6:8.2f} Mpos/s"
              f"{extra}", flush=True)
        return dt

    # cells: inside chart cell-updates O(L^2/2 * S^2) per window for the
    # two rules; outside pass doubles it
    em_cells = N * (L * L // 2) * S * S * 2 * 2
    # ISSUED matmul FLOPs (the scans run fixed-shape [2L, S] matmuls on
    # every diagonal, padded rows included): inside 4L²S², outside
    # 4L²S², xi contraction 4L²S², r1_in 2L²S² per window
    em_mxu = N * 14 * L * L * S * S
    inside_mxu = N * 4 * L * L * S * S
    # CYK max-plus: 2 rules x (add + max) per [cell, S] pair per diagonal
    decode_vpu = N * 4 * L * L * S * S
    timed(
        "cfg_em_stats (batched)",
        lambda: _cfg_em_stats_batched(params, obs, sym),
        lambda o: float(o[0].loglik.sum()),
        cells_per_iter=em_cells,
        mxu_flops_per_iter=em_mxu,
    )
    v_in = jax.jit(jax.vmap(
        lambda o, sy: cfg_inside_loglik(params, o, sy, L)
    ))
    timed(
        "cfg_inside_loglik (vmapped)",
        lambda: v_in(obs, sym),
        lambda o: float(o.sum()),
        cells_per_iter=em_cells // 2,
        mxu_flops_per_iter=inside_mxu,
    )
    timed(
        "CYK decode (batched)",
        lambda: _cfg_decode_batch(params, obs, sym, L),
        lambda o: float(o[1].sum()),
        cells_per_iter=em_cells // 2,
        vpu_ops_per_iter=decode_vpu,
    )


if __name__ == "__main__":
    main()
