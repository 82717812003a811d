"""Pallas TPU kernels for the HMM DP scans.

The XLA ``lax.scan`` path (ops/dp.py) costs ~10µs per time step at
B=2048, S=20 — per-step while-loop overhead and unfused carry
round-trips dominate, since the actual per-step math (one padded
[B,S]@[S,S] MXU matmul + a few VPU passes over [B,S]) is ~2-3µs.  These
kernels fuse the whole scan into ONE Pallas program: the grid is
(batch_blocks, L) with the time dimension as a sequential ("arbitrary")
grid axis, the running alpha in a VMEM scratch that persists across
time steps, and obs blocks streamed HBM→VMEM via BlockSpecs (Pallas
double-buffers the sequential axis automatically).

Layout: arrays are time-major ``[L, B, S]`` inside the kernels so every
block is ``(1, B, S)`` — the TPU lowering requires the last two block
dims to be sublane/lane aligned (÷8, ÷128) or equal to the array dims.
The grid is just ``(L,)``: the whole batch is ONE block (v5e has a
single TensorCore, so batch-blocking would only multiply the number of
sequential grid steps — measured 2x slower), with the batch on sublanes
and S ≤ 128 riding the lane dimension unpadded in VMEM.  The public
wrappers accept/return the batch-major ``[B, L, S]`` convention of
ops/dp.py.

Masking matches ops/dp.py exactly: positions t >= length carry the
state through unchanged and emit a zero normalizer increment, so padded
chunk batches produce identical results to solo runs.

Viterbi computes the forward max-plus values and argmax pointer tables
in the kernel; the O(L) backtrace stays in XLA — it is trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tehmm_tpu.utils.common import LOG_ZERO

def _interpret() -> bool:
    """Pallas only compiles on TPU; CPU (tests) runs the interpreter."""
    return jax.default_backend() != "tpu"


def _prep(obs: jax.Array, lengths: jax.Array | None):
    """[B,L,S] -> time-major padded ([L,Bp,S], [1,Bp] lengths, B, Bp).
    Bp pads the batch to a sublane multiple (8)."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bp = -(-B // 8) * 8
    if Bp != B:
        obs = jnp.pad(obs, ((0, Bp - B), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B))
    obs_t = jnp.moveaxis(obs, 1, 0)                        # [L, Bp, S]
    return obs_t, lengths.astype(jnp.int32)[None, :], B, Bp


# ---------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------

def _forward_kernel(
    obs_ref,        # [1, Bb, S] observations at step t
    len_ref,        # [1, Bb] int32 valid lengths
    start_ref,      # [1, S] log_start
    trans_ref,      # [S, S] exp(log_trans)
    alpha_out,      # [1, Bb, S]
    dm_out,         # [1, Bb, 1]
    alpha_scr,      # [Bb, S] VMEM carry
):
    t = pl.program_id(0)
    obs_row = obs_ref[0, :, :]
    # Mosaic cannot insert a minor dim on 1-bit vectors: reshape the i32
    # lengths FIRST, compare after, and keep every mask 2-D [Bb, 1].
    lv = len_ref[0, :][:, None]                         # i32 [Bb, 1]

    @pl.when(t == 0)
    def _init():
        a0 = start_ref[0, :][None, :] + obs_row
        a0 = jnp.where(lv > 0, a0, LOG_ZERO)
        m = jnp.maximum(
            jnp.max(a0, axis=-1, keepdims=True), LOG_ZERO
        )
        alpha_scr[:, :] = a0 - m
        alpha_out[0, :, :] = alpha_scr[:, :]
        dm_out[0, :, :] = m

    @pl.when(t != 0)
    def _step():
        a_hat = alpha_scr[:, :]
        p = jnp.exp(a_hat)
        s = jnp.dot(p, trans_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        new = jnp.where(s > 0, jnp.log(s), LOG_ZERO) + obs_row
        m = jnp.maximum(
            jnp.max(new, axis=-1, keepdims=True), LOG_ZERO
        )
        valid = t < lv                                  # [Bb, 1] bool
        new_hat = jnp.where(valid, new - m, a_hat)
        alpha_scr[:, :] = new_hat
        alpha_out[0, :, :] = new_hat
        dm_out[0, :, :] = jnp.where(valid, m, 0.0)


@jax.jit
def forward_scaled_pallas(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in for ops.dp.forward_scaled (matmul path) as one fused
    Pallas program.  Returns (alpha_hat[B,L,S], log_c[B,L], loglik[B])."""
    B, L, S = obs.shape
    obs_t, len2, b_orig, Bp = _prep(obs, lengths)
    trans_exp = jnp.exp(log_trans)

    grid = (L,)
    alpha_hat, dms = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bp, S), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, Bp), lambda t: (0, 0)),
            pl.BlockSpec((1, S), lambda t: (0, 0)),
            pl.BlockSpec((S, S), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, S), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, Bp, 1), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(obs_t, len2, log_start[None, :], trans_exp)

    alpha_hat = jnp.moveaxis(alpha_hat, 0, 1)[:b_orig]     # [B, L, S]
    dms = jnp.moveaxis(dms[:, :, 0], 0, 1)[:b_orig]        # [B, L]
    log_c = jnp.cumsum(dms, axis=1)
    final = alpha_hat[:, -1, :]
    loglik = (
        jnp.log(jnp.sum(jnp.exp(final), axis=-1)) + jnp.sum(dms, axis=1)
    )
    return alpha_hat, log_c, loglik


# ---------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------

def _backward_kernel(
    obs_ref,        # [1, Bb, S] obs at position t_next = L-1-k
    len_ref,
    trans_t_ref,    # [S, S] exp(log_trans.T)
    beta_out,       # [1, Bb, S] beta_hat at position t_next - 1
    dm_out,         # [1, Bb, 1]
    beta_scr,
):
    k = pl.program_id(0)           # k = 0 .. L-2 ; t_next = L-1-k
    n_l = pl.num_programs(0) + 1   # = L
    t_next = n_l - 1 - k
    obs_next = obs_ref[0, :, :]
    lv = len_ref[0, :][:, None]                         # i32 [Bb, 1]

    @pl.when(k == 0)
    def _init():
        beta_scr[:, :] = jnp.zeros_like(beta_scr)

    b_hat = beta_scr[:, :]
    x = obs_next + b_hat
    xm = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), LOG_ZERO)
    p = jnp.exp(x - xm)
    s = jnp.dot(p, trans_t_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    new = jnp.where(s > 0, jnp.log(s), LOG_ZERO)
    nm = jnp.maximum(jnp.max(new, axis=-1, keepdims=True), LOG_ZERO)
    valid = t_next < lv                                 # [Bb, 1] bool
    new_hat = jnp.where(valid, new - nm, b_hat)
    beta_scr[:, :] = new_hat
    beta_out[0, :, :] = new_hat
    dm_out[0, :, :] = jnp.where(valid, xm + nm, 0.0)


@jax.jit
def backward_scaled_pallas(
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.dp.backward_scaled (matmul path)."""
    B, L, S = obs.shape
    obs_t, len2, b_orig, Bp = _prep(obs, lengths)
    trans_exp_t = jnp.exp(log_trans.T)
    # k-th sequential step consumes obs at t_next = L-1-k
    obs_rev = obs_t[1:][::-1]                               # [L-1, Bp, S]

    grid = (L - 1,)
    beta_body, dms = pl.pallas_call(
        _backward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bp, S), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, Bp), lambda k: (0, 0)),
            pl.BlockSpec((S, S), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, S), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, Bp, 1), lambda k: (k, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L - 1, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((L - 1, Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(obs_rev, len2, trans_exp_t)

    # body index k wrote beta_hat at position L-2-k -> reverse to time order
    beta_hat = jnp.concatenate(
        [jnp.moveaxis(beta_body[::-1], 0, 1)[:b_orig],
         jnp.zeros((b_orig, 1, S), jnp.float32)],
        axis=1,
    )
    dms_t = jnp.concatenate(
        [jnp.moveaxis(dms[::-1, :, 0], 0, 1)[:b_orig],
         jnp.zeros((b_orig, 1), jnp.float32)],
        axis=1,
    )
    log_d = jnp.cumsum(dms_t[:, ::-1], axis=1)[:, ::-1]
    return beta_hat, log_d


# ---------------------------------------------------------------------
# viterbi forward values + pointers
# ---------------------------------------------------------------------

def _viterbi_kernel(
    obs_ref,
    len_ref,
    start_ref,
    trans_ref,       # [S, S] log_trans
    ptr_out,         # [1, Bb, S] int32 argmax predecessor
    v_out,           # [1, Bb, S] max-normalized running values
    dm_out,          # [1, Bb, 1]
    v_scr,
):
    t = pl.program_id(0)
    obs_row = obs_ref[0, :, :]
    lv = len_ref[0, :][:, None]                         # i32 [Bb, 1]

    @pl.when(t == 0)
    def _init():
        v0 = start_ref[0, :][None, :] + obs_row
        m = jnp.maximum(jnp.max(v0, axis=-1, keepdims=True), LOG_ZERO)
        v_scr[:, :] = v0 - m
        ptr_out[0, :, :] = jax.lax.broadcasted_iota(
            jnp.int32, v0.shape, 1
        )
        v_out[0, :, :] = v_scr[:, :]
        dm_out[0, :, :] = m

    @pl.when(t != 0)
    def _step():
        v_hat = v_scr[:, :]
        S = v_hat.shape[-1]
        # accumulating max-plus over source states: the [Bp, S, S]
        # broadcast (and an unrolled per-column concat) overflow VMEM at
        # production batch sizes; the running (best, ptr) pair keeps the
        # live set at three [Bp, S] tiles.  Strict > preserves the
        # lowest-source-index tie-breaking of jnp.argmax.
        best = v_hat[:, 0][:, None] + trans_ref[0, :][None, :]
        ptr = jnp.zeros_like(best, dtype=jnp.int32)
        for i in range(1, S):  # static unroll: Mosaic has no dynamic_slice
            cand = v_hat[:, i][:, None] + trans_ref[i, :][None, :]
            take = cand > best
            best = jnp.where(take, cand, best)
            ptr = jnp.where(take, i, ptr)
        new_v = best + obs_row
        m = jnp.maximum(
            jnp.max(new_v, axis=-1, keepdims=True), LOG_ZERO
        )
        valid = t < lv                                  # [Bb, 1] bool
        new_hat = jnp.where(valid, new_v - m, v_hat)
        ident = jax.lax.broadcasted_iota(jnp.int32, ptr.shape, 1)
        ptr = jnp.where(valid, ptr, ident)
        v_scr[:, :] = new_hat
        ptr_out[0, :, :] = ptr
        v_out[0, :, :] = new_hat
        dm_out[0, :, :] = jnp.where(valid, m, 0.0)


@jax.jit
def viterbi_pallas(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.dp.viterbi: fused max-plus scan kernel + the same
    XLA backtrace.  Tie-breaking identical (lowest state index)."""
    B, L, S = obs.shape
    obs_t, len2, b_orig, Bp = _prep(obs, lengths)

    grid = (L,)
    ptrs, v_hats, dms = pl.pallas_call(
        _viterbi_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bp, S), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, Bp), lambda t: (0, 0)),
            pl.BlockSpec((1, S), lambda t: (0, 0)),
            pl.BlockSpec((S, S), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, S), lambda t: (t, 0, 0)),
            # running values: every step overwrites block 0, so only the
            # final v survives — saves an [L,Bp,S] HBM stream
            pl.BlockSpec((1, Bp, S), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, Bp, 1), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, S), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(obs_t, len2, log_start[None, :], log_trans)

    v_final = v_hats[0, :b_orig, :]
    score = (
        jnp.max(v_final, axis=-1)
        + jnp.sum(dms[:, :b_orig, 0], axis=0)
    )
    last_state = jnp.argmax(v_final, axis=-1).astype(jnp.int32)

    def back(state, ptr_row):                               # [Bp, S]
        prev = jnp.take_along_axis(ptr_row, state[:, None], axis=1)[:, 0]
        return prev, state

    first_state, states = jax.lax.scan(
        back, jnp.pad(last_state, (0, Bp - b_orig)), ptrs[1:],
        reverse=True,
    )
    path = jnp.concatenate([first_state[None], states], axis=0)
    return jnp.moveaxis(path, 0, 1)[:b_orig], score
