"""Pallas TPU kernels for the HMM DP scans.

Fused-scan alternates to the XLA ``lax.scan`` path (ops/dp.py): the grid
runs the time dimension as a sequential ("arbitrary") axis, the running
alpha lives in a VMEM scratch that persists across grid steps, and obs
blocks stream HBM→VMEM via BlockSpecs (auto double-buffered).

STATUS (v5e, 2026-08): bit-exact against ops/dp.py on TPU, but SLOWER —
see the note at ``_KT`` for the measured numbers and the Mosaic
allocation behavior that currently caps this design.  XLA's scan is the
production default; keep these as the starting point for future kernel
work (multi-step blocks, [S, B-lane] layouts, checkpointed Viterbi
without pointer materialization).

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

# Time steps per grid step.  >1 would amortize the ~10µs Mosaic
# grid-step overhead, but the current Mosaic lowering stack-allocates
# every unrolled step's intermediates instead of reusing registers, so
# KT=8 overflows the 16MB VMEM at production batch sizes.  Measured on
# v5e at B=2048/L=1024/S=20 with KT=1: PAL fwd 13.0ms / bwd 23.1ms /
# vit 48.9ms vs XLA scan 8.0 / 10.5 / 30.5ms — the XLA `lax.scan` path
# (ops/dp.py) remains the production default; these kernels are the
# validated (bit-exact) base for future Mosaic revisions.
_KT = 1


def _forward_kernel(
    obs_ref,        # [KT, Bb, S] observations for this time-block
    len_ref,        # [1, Bb] int32 valid lengths
    start_ref,      # [1, S] log_start
    trans_ref,      # [S, S] exp(log_trans)
    alpha_out,      # [KT, Bb, S]
    dm_out,         # [KT, Bb, 1]
    alpha_scr,      # [Bb, S] VMEM carry
):
    g = pl.program_id(0)
    # Mosaic cannot insert a minor dim on 1-bit vectors: reshape the i32
    # lengths FIRST, compare after, and keep every mask 2-D [Bb, 1].
    lv = len_ref[0, :][:, None]                         # i32 [Bb, 1]

    @pl.when(g == 0)
    def _init():
        obs_row = obs_ref[0, :, :]
        a0 = start_ref[0, :][None, :] + obs_row
        a0 = jnp.where(lv > 0, a0, LOG_ZERO)
        m = jnp.maximum(
            jnp.max(a0, axis=-1, keepdims=True), LOG_ZERO
        )
        alpha_scr[:, :] = a0 - m
        alpha_out[0, :, :] = alpha_scr[:, :]
        dm_out[0, :, :] = m

    def _step(k):
        t = g * _KT + k
        obs_row = obs_ref[k, :, :]
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
        alpha_out[k, :, :] = new_hat
        dm_out[k, :, :] = jnp.where(valid, m, 0.0)

    @pl.when(g == 0)
    def _rest_of_first_block():
        for k in range(1, _KT):
            _step(k)

    @pl.when(g != 0)
    def _full_block():
        for k in range(_KT):
            _step(k)


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
    # pad L up to a _KT multiple (padding is masked: t >= length)
    Lp = -(-L // _KT) * _KT
    if Lp != L:
        obs_t = jnp.pad(obs_t, ((0, Lp - L), (0, 0), (0, 0)))

    grid = (Lp // _KT,)
    alpha_hat, dms = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_KT, Bp, S), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Bp), lambda g: (0, 0)),
            pl.BlockSpec((1, S), lambda g: (0, 0)),
            pl.BlockSpec((S, S), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_KT, Bp, S), lambda g: (g, 0, 0)),
            pl.BlockSpec((_KT, Bp, 1), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(obs_t, len2, log_start[None, :], trans_exp)

    alpha_hat = jnp.moveaxis(alpha_hat[:L], 0, 1)[:b_orig]  # [B, L, S]
    dms = jnp.moveaxis(dms[:L, :, 0], 0, 1)[:b_orig]        # [B, L]
    log_c = jnp.cumsum(dms, axis=1)
    final = alpha_hat[:, -1, :]
    loglik = (
        jnp.log(jnp.sum(jnp.exp(final), axis=-1)) + jnp.sum(dms, axis=1)
    )
    loglik = jnp.where(len2[0, :b_orig] > 0, loglik, 0.0)
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


# ---------------------------------------------------------------------
# v2 forward: grid-free fori_loop with manual double-buffered DMA.
# Layout [L, S_pad, Bp]: batch rides the 128-lane dim (aligned for DMA
# slicing), states ride sublanes padded to a multiple of 8.
# ---------------------------------------------------------------------

_KV2 = 4  # time steps per fori iteration (per-block DMA + K-unrolled math)


def _forward_kernel_v2(
    len_ref,        # [1, Bp] int32 (VMEM)
    start_ref,      # [S_pad, Bp] log_start broadcast (VMEM)
    trans_t_ref,    # [S_pad, S_pad] exp(log_trans).T zero-padded (VMEM)
    obs_hbm,        # [NB, K, S_pad, Bp] (ANY/HBM), pad rows = LOG_ZERO
    alpha_hbm,      # [NB, K, S_pad, Bp] out
    dm_hbm,         # [NB, K, 8, Bp] out (normalizer row replicated 8x)
    obs_buf,        # VMEM [2, K, S_pad, Bp]
    out_buf,        # VMEM [2, K, S_pad, Bp]
    dm_buf,         # VMEM [2, K, 8, Bp]
    alpha_scr,      # VMEM [S_pad, Bp]
    in_sem, out_sem, dm_sem,
):
    NB = obs_hbm.shape[0]
    K = obs_hbm.shape[1]
    lens = len_ref[0, :][None, :]                       # [1, Bp] i32

    def in_dma(slot, blk):
        return pltpu.make_async_copy(
            obs_hbm.at[blk], obs_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot], alpha_hbm.at[blk], out_sem.at[slot]
        )

    def dm_dma(slot, blk):
        return pltpu.make_async_copy(
            dm_buf.at[slot], dm_hbm.at[blk], dm_sem.at[slot]
        )

    in_dma(0, 0).start()
    # rows with length 0 never take the valid branch: the carry they
    # propagate to every output row must be defined (zero, matching the
    # XLA path's masked init), not uninitialized VMEM garbage
    alpha_scr[:, :] = jnp.zeros_like(alpha_scr)

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < NB)
        def _prefetch():
            in_dma(nxt, blk + 1).start()

        in_dma(slot, blk).wait()

        @pl.when(blk >= 2)
        def _drain():
            out_dma(slot, blk - 2).wait()
            dm_dma(slot, blk - 2).wait()

        for k in range(K):                     # static unroll
            t = blk * K + k
            obs_row = obs_buf[slot, k]
            a_hat = alpha_scr[:, :]
            p = jnp.exp(a_hat)
            # new[j, b] = sum_i T[i, j] p[i, b]  ==  T^T @ p
            s = jnp.dot(trans_t_ref[:, :], p,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            trans_term = jnp.where(s > 0, jnp.log(s), LOG_ZERO)
            base = jnp.where(t == 0, start_ref[:, :], trans_term)
            new = base + obs_row               # pad rows stay low
            m = jnp.maximum(
                jnp.max(new, axis=0, keepdims=True), LOG_ZERO
            )                                  # [1, Bp]
            valid = t < lens                   # [1, Bp] bool
            new_hat = jnp.where(valid, new - m, a_hat)
            dm = jnp.where(valid, m, 0.0)
            alpha_scr[:, :] = new_hat
            out_buf[slot, k] = new_hat
            dm_buf[slot, k] = jnp.broadcast_to(
                dm, dm_buf[slot, k].shape
            )
        out_dma(slot, blk).start()
        dm_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
    out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
    dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


@jax.jit
def forward_scaled_pallas_v2(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Grid-free fused forward: ONE Pallas program whose fori_loop walks
    the whole time axis with double-buffered HBM<->VMEM DMA (the guide's
    streaming pattern) — no per-step Mosaic grid overhead.

    STATUS (v5e, 2026-08): 5.5ms vs 7.1ms for the XLA scan at
    B=2048/L=1024/S=20 (23% faster, 380M pos/s).  alpha_hat matches the
    XLA path to ~2e-6 (so posteriors/decodes are unaffected), but the
    per-step normalizer stream is quantized at ~2^-10 by the Mosaic
    matmul in this [S,S]@[S,B] orientation REGARDLESS of the requested
    precision (an explicit VPU accumulation compiles to the same result),
    giving ~3e-4 relative error on accumulated log-likelihoods.  Until
    that Mosaic behavior changes, ops/dp.forward_scaled stays the default
    and this kernel is for throughput-critical training where 3e-4 on
    the convergence metric is immaterial."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bp = -(-B // 128) * 128
    Sp = -(-S // 8) * 8
    K = _KV2
    Lp = -(-L // K) * K
    NB = Lp // K
    obs_t = jnp.moveaxis(obs, 1, 0)                      # [L, B, S]
    obs_t = jnp.swapaxes(obs_t, 1, 2)                    # [L, S, B]
    obs_t = jnp.pad(
        obs_t, ((0, Lp - L), (0, Sp - S), (0, Bp - B)),
        constant_values=LOG_ZERO,
    ).reshape(NB, K, Sp, Bp)
    len2 = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B))[None, :]
    trans_t = jnp.pad(
        jnp.exp(log_trans).T, ((0, Sp - S), (0, Sp - S))
    )
    start2 = jnp.broadcast_to(
        jnp.pad(log_start, (0, Sp - S),
                constant_values=LOG_ZERO)[:, None],
        (Sp, Bp),
    )

    alpha_pad, dm_pad = pl.pallas_call(
        _forward_kernel_v2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Bp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Bp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, K, Sp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((NB, K, 8, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((2, K, 8, Bp), jnp.float32),
            pltpu.VMEM((Sp, Bp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len2, start2, trans_t, obs_t)

    alpha_flat = alpha_pad.reshape(Lp, Sp, Bp)[:L]
    dm_flat = dm_pad.reshape(Lp, 8, Bp)[:L]
    alpha_hat = jnp.transpose(
        alpha_flat[:, :S, :B], (2, 0, 1)
    )                                                    # [B, L, S]
    dms = jnp.transpose(dm_flat[:, 0, :B], (1, 0))       # [B, L]
    log_c = jnp.cumsum(dms, axis=1)
    final = alpha_hat[:, -1, :]
    loglik = (
        jnp.log(jnp.sum(jnp.exp(final), axis=-1)) + jnp.sum(dms, axis=1)
    )
    loglik = jnp.where(lengths > 0, loglik, 0.0)
    return alpha_hat, log_c, loglik


# ---------------------------------------------------------------------
# v3 probability-space streaming forward/backward: the large-S MXU
# engine.
#
# The v2 kernels carry log-space state and pay exp() + log() + max-
# renormalize per cell per step — at S >= 64 those VPU transcendentals,
# not the [S,S] matmul, dominate the step.  The v3 kernels carry the
# SCALED PROBABILITY vector p = exp(alpha_hat) directly (per-column max
# 1), so one step is
#
#     u = (T^T @ p) * obs_p[t]          (MXU matmul + one VPU multiply)
#     m = max_s u ;  p' = u * (1/m)     (one reduce + one broadcast mult)
#     dm = log(m)                       ([1, B] only — not per cell)
#
# with obs_p[t] = exp(obs[t] - max_s obs[t]) precomputed in XLA (fused
# into the emission one-hot matmul's epilogue) and the per-position
# max_s obs[t] added back to the normalizer stream outside the kernel.
# ZERO per-cell transcendentals remain, and the downstream E-step wants
# exactly these probability-space quantities (a_fac = exp(alpha_hat),
# b_fac), so the consumer's exp() disappears too.
#
# Grid: (G,) batch groups of Bg columns each, sized so the double-
# buffered [K, Sp, Bg] VMEM tiles fit at any S (S=256 runs at Bg=256);
# within a group the fori_loop streams the time axis with the same
# double-buffered DMA pattern as v2.  Numerics: states whose scaled
# probability underflows f32 (~1e-38, i.e. e^-87 below the per-column
# max) flush to zero — the identical underflow the XLA path takes when
# the E-step computes exp(alpha_hat) (reference: basehmm.py forward in
# float64 avoids this only by paying 2x memory; SURVEY.md §2a).
# ---------------------------------------------------------------------


def _pick_batch_group(S: int, B: int, K: int = _KV2) -> int:
    """Largest lane-multiple batch group whose v3 VMEM working set
    (2x obs + 2x out double buffers of [K, Sp, Bg] f32 + carries + the
    [Sp, Sp] transition tile) stays comfortably inside the 16MB VMEM."""
    Sp = max(-(-S // 8) * 8, 8)
    budget = (10 << 20) - Sp * Sp * 4            # minus resident trans
    per_col = 4 * K * Sp * 4 + 2 * Sp * 4 + 2 * K * 8 * 4  # bufs+carry+dm
    bg = max(128, (budget // per_col) // 128 * 128)
    Bp = -(-B // 128) * 128
    return min(bg, Bp)


def _forward_kernel_v3(
    len_ref,        # [1, Bg] int32 for THIS batch group (VMEM)
    start_ref,      # [S_pad, Bg] exp(log_start) broadcast, pad rows 0
    trans_t_ref,    # [S_pad, S_pad] exp(log_trans).T zero-padded (VMEM)
    obs_hbm,        # [G, NB, K, S_pad, Bg] obs_p (ANY/HBM), pad rows 0
    alpha_hbm,      # [G, NB, K, S_pad, Bg] out: scaled prob alpha
    dm_hbm,         # [G, NB, K, 8, Bg] out: log(m) increments
    obs_buf,        # VMEM [2, K, S_pad, Bg]
    out_buf,        # VMEM [2, K, S_pad, Bg]
    dm_buf,         # VMEM [2, K, 8, Bg]
    p_scr,          # VMEM [S_pad, Bg] probability carry
    in_sem, out_sem, dm_sem,
):
    g = pl.program_id(0)
    NB = obs_hbm.shape[1]
    K = obs_hbm.shape[2]
    lens = len_ref[0, 0, :][None, :]                    # [1, Bg] i32
    start_p = start_ref[0]                              # [Sp, Bg]

    def in_dma(slot, blk):
        return pltpu.make_async_copy(
            obs_hbm.at[g, blk], obs_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot], alpha_hbm.at[g, blk], out_sem.at[slot]
        )

    def dm_dma(slot, blk):
        return pltpu.make_async_copy(
            dm_buf.at[slot], dm_hbm.at[g, blk], dm_sem.at[slot]
        )

    in_dma(0, 0).start()
    # zero-length rows propagate the initial carry to every output row:
    # ones == exp(alpha_hat = 0), matching the XLA path's masked init
    p_scr[:, :] = jnp.ones_like(p_scr)

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < NB)
        def _prefetch():
            in_dma(nxt, blk + 1).start()

        in_dma(slot, blk).wait()

        @pl.when(blk >= 2)
        def _drain():
            out_dma(slot, blk - 2).wait()
            dm_dma(slot, blk - 2).wait()

        for k in range(K):                     # static unroll
            t = blk * K + k
            obs_row = obs_buf[slot, k]
            p = p_scr[:, :]
            s = jnp.dot(trans_t_ref[:, :], p,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            base = jnp.where(t == 0, start_p, s)
            u = base * obs_row                 # pad rows stay 0
            m = jnp.max(u, axis=0, keepdims=True)       # [1, Bg]
            m_safe = jnp.maximum(m, 1e-37)
            valid = t < lens                   # [1, Bg] bool
            new_p = jnp.where(valid, u * (1.0 / m_safe), p)
            dm = jnp.where(valid, jnp.log(m_safe), 0.0)
            p_scr[:, :] = new_p
            out_buf[slot, k] = new_p
            dm_buf[slot, k] = jnp.broadcast_to(dm, dm_buf[slot, k].shape)
        out_dma(slot, blk).start()
        dm_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
    out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
    dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


def _backward_kernel_v3(
    len_ref,        # [1, Bg] int32
    trans_ref,      # [S_pad, S_pad] exp(log_trans) zero-padded (VMEM)
    obs_hbm,        # [G, NB, K, S_pad, Bg] obs_p REVERSED time order
    beta_hbm,       # [G, NB, K, S_pad, Bg] out: scaled prob beta
    obs_buf, out_buf, b_scr,
    in_sem, out_sem,
):
    g = pl.program_id(0)
    NB = obs_hbm.shape[1]
    K = obs_hbm.shape[2]
    L = NB * K
    lens = len_ref[0, 0, :][None, :]

    def in_dma(slot, blk):
        return pltpu.make_async_copy(
            obs_hbm.at[g, blk], obs_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot], beta_hbm.at[g, blk], out_sem.at[slot]
        )

    in_dma(0, 0).start()
    b_scr[:, :] = jnp.ones_like(b_scr)

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < NB)
        def _prefetch():
            in_dma(nxt, blk + 1).start()

        in_dma(slot, blk).wait()

        @pl.when(blk >= 2)
        def _drain():
            out_dma(slot, blk - 2).wait()

        for k in range(K):             # static unroll
            # reversed stream index r -> t_next = L - r
            r = blk * K + k
            t_next = L - r
            obs_next = obs_buf[slot, k]           # obs_p at t_next
            b = b_scr[:, :]
            x = obs_next * b
            xm = jnp.maximum(
                jnp.max(x, axis=0, keepdims=True), 1e-37
            )
            xn = x * (1.0 / xm)
            s = jnp.dot(trans_ref[:, :], xn,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            nm = jnp.maximum(
                jnp.max(s, axis=0, keepdims=True), 1e-37
            )
            valid = t_next < lens
            new_b = jnp.where(valid, s * (1.0 / nm), b)
            b_scr[:, :] = new_b
            out_buf[slot, k] = new_b
        out_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
    out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


def _v3_layout(obs_p: jax.Array, B: int, L: int, S: int, Bg: int,
               reverse: bool = False):
    """[B, L, S] -> ([G, NB, K, Sp, Bg], dims) kernel layout with zero
    padding (pad state rows AND pad batch columns are 0; pad time rows
    are masked by lengths in-kernel)."""
    K = _KV2
    Sp = max(-(-S // 8) * 8, 8)
    Bp = -(-B // Bg) * Bg
    G = Bp // Bg
    Lp = -(-L // K) * K
    NB = Lp // K
    obs_t = jnp.swapaxes(jnp.moveaxis(obs_p, 1, 0), 1, 2)   # [L, S, B]
    if reverse:
        # reversed stream: index r consumes position t_next = Lp - r;
        # pad at the HEAD as dummies with t_next >= L (invalid everywhere)
        idx = jnp.clip(Lp - jnp.arange(Lp), 0, L - 1)
        obs_t = jnp.pad(
            obs_t, ((0, 0), (0, Sp - S), (0, Bp - B))
        )[idx]
    else:
        obs_t = jnp.pad(
            obs_t, ((0, Lp - L), (0, Sp - S), (0, Bp - B))
        )
    # [Lp, Sp, Bp] -> [G, NB, K, Sp, Bg]
    arr = obs_t.reshape(NB, K, Sp, G, Bg)
    arr = jnp.moveaxis(arr, 3, 0)
    return arr, (K, Sp, Bp, G, Lp, NB)


@jax.jit
def forward_prob_pallas_v3(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs_p: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Probability-space streaming forward (the large-S MXU engine).

    Args:
      obs_p: f32[B, L, S] = exp(obs_ll - max_s obs_ll) scaled
        probability-space observations (compute via ``scaled_obs_prob``).

    Returns:
      (alpha_p[B, L, S], dm[B, L]) where alpha_p = exp(alpha_hat) (per-
      position max 1) and dm are the per-step log-normalizer increments
      EXCLUDING the obs max (add the caller's o_m stream for totals).
    """
    B, L, S = obs_p.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bg = _pick_batch_group(S, B)
    obs_arr, (K, Sp, Bp, G, Lp, NB) = _v3_layout(obs_p, B, L, S, Bg)
    len_g = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B)) \
        .reshape(G, 1, Bg)
    trans_t = jnp.pad(jnp.exp(log_trans).T, ((0, Sp - S), (0, Sp - S)))
    start_g = jnp.broadcast_to(
        jnp.pad(jnp.exp(log_start), (0, Sp - S))[None, :, None],
        (G, Sp, Bg),
    )

    alpha_pad, dm_pad = pl.pallas_call(
        _forward_kernel_v3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Sp, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, NB, K, Sp, Bg), jnp.float32),
            jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, start_g, trans_t, obs_arr)

    # [G, NB, K, Sp, Bg] -> [B, L, S]
    alpha_p = jnp.moveaxis(alpha_pad, 0, 3).reshape(Lp, Sp, Bp)
    alpha_p = jnp.transpose(alpha_p[:L, :S, :B], (2, 0, 1))
    dms = jnp.moveaxis(dm_pad[:, :, :, 0, :], 0, 2).reshape(Lp, Bp)
    dms = jnp.transpose(dms[:L, :B], (1, 0))             # [B, L]
    return alpha_p, dms


@jax.jit
def backward_prob_pallas_v3(
    log_trans: jax.Array,
    obs_p: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Probability-space streaming backward.  Returns beta_p[B, L, S] =
    exp(beta_hat) (per-position max 1; positions >= length carry 1s)."""
    B, L, S = obs_p.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bg = _pick_batch_group(S, B)
    obs_arr, (K, Sp, Bp, G, Lp, NB) = _v3_layout(
        obs_p, B, L, S, Bg, reverse=True
    )
    len_g = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B)) \
        .reshape(G, 1, Bg)
    trans_p = jnp.pad(jnp.exp(log_trans), ((0, Sp - S), (0, Sp - S)))

    beta_pad = pl.pallas_call(
        _backward_kernel_v3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, NB, K, Sp, Bg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, trans_p, obs_arr)

    # stream index r wrote beta at position Lp - 1 - r
    beta = jnp.moveaxis(beta_pad, 0, 3).reshape(Lp, Sp, Bp)[::-1][:L]
    return jnp.transpose(beta[:, :S, :B], (2, 0, 1))


# ---------------------------------------------------------------------
# v2 backward (same streaming design, time reversed)
# ---------------------------------------------------------------------

def _backward_kernel_v2(
    len_ref,        # [1, Bp] int32
    trans_ref,      # [S_pad, S_pad] exp(log_trans) zero-padded (VMEM)
    obs_hbm,        # [NB, K, S_pad, Bp] REVERSED time order
    beta_hbm,       # [NB, K, S_pad, Bp] out (reversed order)
    obs_buf, out_buf, beta_scr,
    in_sem, out_sem,
):
    NB = obs_hbm.shape[0]
    K = obs_hbm.shape[1]
    L = NB * K
    lens = len_ref[0, :][None, :]

    def in_dma(slot, blk):
        return pltpu.make_async_copy(
            obs_hbm.at[blk], obs_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot], beta_hbm.at[blk], out_sem.at[slot]
        )

    in_dma(0, 0).start()

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < NB)
        def _prefetch():
            in_dma(nxt, blk + 1).start()

        in_dma(slot, blk).wait()

        @pl.when(blk >= 2)
        def _drain():
            out_dma(slot, blk - 2).wait()

        for k in range(K):             # static unroll
            # reversed stream index r -> t_next = L - r
            r = blk * K + k
            t_next = L - r
            obs_next = obs_buf[slot, k]           # obs at t_next
            b_hat = beta_scr[:, :]
            @pl.when(r == 0)
            def _init():
                beta_scr[:, :] = jnp.zeros_like(beta_scr)
            b_hat = beta_scr[:, :]
            x = obs_next + b_hat
            xm = jnp.maximum(
                jnp.max(x, axis=0, keepdims=True), LOG_ZERO
            )
            p = jnp.exp(x - xm)
            # new[i, b] = sum_j T[i, j] p[j, b]  ==  T @ p
            s = jnp.dot(trans_ref[:, :], p,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            new = jnp.where(s > 0, jnp.log(s), LOG_ZERO)
            nm = jnp.maximum(
                jnp.max(new, axis=0, keepdims=True), LOG_ZERO
            )
            valid = t_next < lens
            new_hat = jnp.where(valid, new - nm, b_hat)
            beta_scr[:, :] = new_hat
            out_buf[slot, k] = new_hat
        out_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
    out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


@jax.jit
def backward_hat_pallas_v2(
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Streaming v2 backward returning beta_hat only (the quantity EM
    consumes; cumulative normalizers are not produced — see the v2
    forward STATUS note).  Returns beta_hat[B, L, S]."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bp = -(-B // 128) * 128
    Sp = -(-S // 8) * 8
    K = _KV2
    # Reversed body stream: index r consumes obs at t_next = Lp - r and
    # emits beta_hat for position t_next - 1 = Lp - 1 - r.  The kernel
    # derives t_next from its own padded length (NB*K), so padding must
    # sit at the stream HEAD as dummies with t_next >= L (invalid for
    # every row) — tail padding would alias t_next <= 0 as valid steps.
    Lp = -(-L // K) * K
    NB = Lp // K
    obs_t = jnp.moveaxis(obs, 1, 0)
    obs_t = jnp.swapaxes(obs_t, 1, 2)                    # [L, S, B]
    obs_t = jnp.pad(
        obs_t, ((0, 0), (0, Sp - S), (0, Bp - B)),
        constant_values=LOG_ZERO,
    )
    idx = jnp.clip(Lp - jnp.arange(Lp), 0, L - 1)
    obs_rev = obs_t[idx].reshape(NB, K, Sp, Bp)
    len2 = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B))[None, :]
    trans_p = jnp.pad(jnp.exp(log_trans), ((0, Sp - S), (0, Sp - S)))

    beta_pad = pl.pallas_call(
        _backward_kernel_v2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Bp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, K, Sp, Bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((Sp, Bp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len2, trans_p, obs_rev)

    # stream index r wrote beta_hat at position Lp - 1 - r
    beta_flat = beta_pad.reshape(Lp, Sp, Bp)[::-1][:L]   # -> position order
    return jnp.transpose(beta_flat[:, :S, :B], (2, 0, 1))


# ---------------------------------------------------------------------
# v2 Viterbi values (max-plus streaming; backtrace stays in XLA)
# ---------------------------------------------------------------------

def _viterbi_kernel_v2(
    len_ref,        # [1, Bp] int32
    start_ref,      # [S_pad, Bp] log_start broadcast (pad rows LOG_ZERO)
    trans_ref,      # [S_pad, S_pad] log_trans (pad entries LOG_ZERO)
    obs_hbm,        # [NB, K, S_pad, Bp]
    v_hbm,          # [NB, K, S_pad, Bp] out: max-normalized values
    dm_hbm,         # [NB, K, 8, Bp] out: normalizer increments
    obs_buf, out_buf, dm_buf, v_scr,
    in_sem, out_sem, dm_sem,
):
    NB = obs_hbm.shape[0]
    K = obs_hbm.shape[1]
    Sp = obs_hbm.shape[2]
    lens = len_ref[0, :][None, :]

    def in_dma(slot, blk):
        return pltpu.make_async_copy(
            obs_hbm.at[blk], obs_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot], v_hbm.at[blk], out_sem.at[slot]
        )

    def dm_dma(slot, blk):
        return pltpu.make_async_copy(
            dm_buf.at[slot], dm_hbm.at[blk], dm_sem.at[slot]
        )

    in_dma(0, 0).start()
    # zero-length rows carry the initial scratch through to every output
    # row — it must be defined (see _forward_kernel_v2)
    v_scr[:, :] = jnp.zeros_like(v_scr)

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < NB)
        def _prefetch():
            in_dma(nxt, blk + 1).start()

        in_dma(slot, blk).wait()

        @pl.when(blk >= 2)
        def _drain():
            out_dma(slot, blk - 2).wait()
            dm_dma(slot, blk - 2).wait()

        for k in range(K):                 # static unroll
            t = blk * K + k
            obs_row = obs_buf[slot, k]
            v_hat = v_scr[:, :]
            # best[j, b] = max_i (v[i, b] + T[i, j]) — accumulated on the
            # VPU (no MXU analogue for max-plus)
            best = v_hat[0:1, :] + trans_ref[0, :][:, None]
            for i in range(1, Sp):
                best = jnp.maximum(
                    best, v_hat[i:i + 1, :] + trans_ref[i, :][:, None]
                )
            base = jnp.where(t == 0, start_ref[:, :], best)
            new = base + obs_row
            m = jnp.maximum(
                jnp.max(new, axis=0, keepdims=True), LOG_ZERO
            )
            valid = t < lens
            new_hat = jnp.where(valid, new - m, v_hat)
            v_scr[:, :] = new_hat
            out_buf[slot, k] = new_hat
            dm_buf[slot, k] = jnp.broadcast_to(
                jnp.where(valid, m, 0.0), dm_buf[slot, k].shape
            )
        out_dma(slot, blk).start()
        dm_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
    out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
    dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


@jax.jit
def viterbi_pallas_v2(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Streaming-v2 Viterbi: max-plus values from the fused kernel (pure
    VPU — immune to the v2 matmul quantization note), then the same
    pointer-free XLA backtrace as ops.dp.viterbi.  Bit-identical
    tie-breaking (lowest predecessor index via first-hit maximum).

    Validated on device up to S = 64 (zero path mismatches vs the XLA
    scan; 1.4x faster).  At S = 128 the unrolled in-kernel max-plus loop
    exceeds VMEM — the stitcher's engine selector falls back to
    ops.dp.viterbi beyond 64 states."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    Bp = -(-B // 128) * 128
    Sp = -(-S // 8) * 8
    K = _KV2
    Lp = -(-L // K) * K
    NB = Lp // K
    obs_t = jnp.moveaxis(obs, 1, 0)
    obs_t = jnp.swapaxes(obs_t, 1, 2)
    obs_t = jnp.pad(
        obs_t, ((0, Lp - L), (0, Sp - S), (0, Bp - B)),
        constant_values=LOG_ZERO,
    ).reshape(NB, K, Sp, Bp)
    len2 = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B))[None, :]
    trans_p = jnp.pad(
        log_trans, ((0, Sp - S), (0, Sp - S)),
        constant_values=LOG_ZERO,
    )
    start2 = jnp.broadcast_to(
        jnp.pad(log_start, (0, Sp - S),
                constant_values=LOG_ZERO)[:, None],
        (Sp, Bp),
    )

    v_pad, dm_pad = pl.pallas_call(
        _viterbi_kernel_v2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Bp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Bp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, K, Sp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((NB, K, 8, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bp), jnp.float32),
            pltpu.VMEM((2, K, 8, Bp), jnp.float32),
            pltpu.VMEM((Sp, Bp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len2, start2, trans_p, obs_t)

    v_flat = v_pad.reshape(Lp, Sp, Bp)[:L, :S, :B]      # [L, S, B]
    v_hats = jnp.transpose(v_flat, (0, 2, 1))           # [L, B, S]
    dms = dm_pad.reshape(Lp, 8, Bp)[:L, 0, :B]          # [L, B]

    v_final = v_hats[-1]
    score = jnp.max(v_final, axis=-1) + jnp.sum(dms, axis=0)
    last_state = jnp.argmax(v_final, axis=-1).astype(jnp.int32)
    trans_T = log_trans.T

    def back(state, xs):
        v_prev, t = xs
        col = trans_T[state]
        prev = jnp.argmax(v_prev + col, axis=-1).astype(jnp.int32)
        valid_t = t < lengths
        prev = jnp.where(valid_t, prev, state)
        return prev, state

    ts = jnp.arange(1, L)
    first_state, states = jax.lax.scan(
        back, last_state, (v_hats[:-1], ts), reverse=True, unroll=8
    )
    path = jnp.concatenate([first_state[None], states], axis=0)
    return jnp.moveaxis(path, 0, 1), score


# ---------------------------------------------------------------------
# v3 Viterbi: batch-grouped max-plus streaming values.
#
# Same double-buffered DMA skeleton as the v3 forward, but in LOG space
# (max-plus has no MXU analogue; the Sp-unrolled VPU loop is the whole
# step) with the batch sliced into groups so the VMEM working set fits
# at ANY state count — this removes the v2 kernel's S <= 64 gate
# (round-1 review: "lift the streaming Viterbi past its S=64 VMEM
# gate").  ``carry_mode`` turns the kernel into the forward half of the
# EXACT checkpointed decoder (parallel/stitch.viterbi_exact): the
# per-column init comes from the previous chunk's carry and EVERY
# position applies a transition (no t==0 start special case).
# ---------------------------------------------------------------------


def _pick_batch_group_vit(S: int, B: int, K: int = _KV2) -> int:
    Sp = max(-(-S // 8) * 8, 8)
    budget = (10 << 20) - Sp * Sp * 4
    per_col = (4 * K * Sp * 4 + 3 * Sp * 4 + 2 * K * 8 * 4
               + K * Sp * Sp * 4 // 8)  # max-plus stack (_maxplus_rows)
    bg = max(128, (budget // per_col) // 128 * 128)
    Bp = -(-B // 128) * 128
    return min(bg, Bp)


def _make_viterbi_kernel_v3(carry_mode: bool):
    def kernel(
        len_ref,        # [1, 1, Bg] int32 for THIS group
        init_ref,       # [S_pad, Bg]: log_start bcast, or chunk carry
        trans_ref,      # [S_pad, S_pad] log_trans (pad LOG_ZERO)
        obs_hbm,        # [G, NB, K, S_pad, Bg]
        v_hbm,          # [G, NB, K, S_pad, Bg] out values
        dm_hbm,         # [G, NB, K, 8, Bg] out normalizer increments
        obs_buf, out_buf, dm_buf, v_scr,
        in_sem, out_sem, dm_sem,
    ):
        g = pl.program_id(0)
        NB = obs_hbm.shape[1]
        K = obs_hbm.shape[2]
        Sp = obs_hbm.shape[3]
        lens = len_ref[0, 0, :][None, :]

        def in_dma(slot, blk):
            return pltpu.make_async_copy(
                obs_hbm.at[g, blk], obs_buf.at[slot], in_sem.at[slot]
            )

        def out_dma(slot, blk):
            return pltpu.make_async_copy(
                out_buf.at[slot], v_hbm.at[g, blk], out_sem.at[slot]
            )

        def dm_dma(slot, blk):
            return pltpu.make_async_copy(
                dm_buf.at[slot], dm_hbm.at[g, blk], dm_sem.at[slot]
            )

        in_dma(0, 0).start()
        init_row = init_ref[0]                      # [Sp, Bg]
        if carry_mode:
            v_scr[:, :] = init_row
        else:
            v_scr[:, :] = jnp.zeros_like(v_scr)

        def body(blk, _):
            slot = jax.lax.rem(blk, 2)
            nxt = jax.lax.rem(blk + 1, 2)

            @pl.when(blk + 1 < NB)
            def _prefetch():
                in_dma(nxt, blk + 1).start()

            in_dma(slot, blk).wait()

            @pl.when(blk >= 2)
            def _drain():
                out_dma(slot, blk - 2).wait()
                dm_dma(slot, blk - 2).wait()

            for k in range(K):             # static unroll
                t = blk * K + k
                obs_row = obs_buf[slot, k]
                v_hat = v_scr[:, :]
                best = _maxplus_rows(v_hat, trans_ref, Sp)
                if carry_mode:
                    base = best
                else:
                    base = jnp.where(t == 0, init_row, best)
                new = base + obs_row
                m = jnp.maximum(
                    jnp.max(new, axis=0, keepdims=True), LOG_ZERO
                )
                valid = t < lens
                new_hat = jnp.where(valid, new - m, v_hat)
                v_scr[:, :] = new_hat
                out_buf[slot, k] = new_hat
                dm_buf[slot, k] = jnp.broadcast_to(
                    jnp.where(valid, m, 0.0), dm_buf[slot, k].shape
                )
            out_dma(slot, blk).start()
            dm_dma(slot, blk).start()
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        @pl.when(NB >= 2)
        def _():
            out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
            dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
        dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()

    return kernel


def _viterbi_values_v3(
    init_cols: jax.Array,   # [B, S] log_start bcast or per-row carry
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array,
    carry_mode: bool,
) -> tuple[jax.Array, jax.Array]:
    """Shared wrapper: max-normalized value rows + dm increments."""
    B, L, S = obs.shape
    Sp = max(-(-S // 8) * 8, 8)
    # K=1 past Sp=64 bounds the max-plus stack (see _maxplus_rows)
    K = _KV2 if Sp <= 64 else 1
    Bg = _pick_batch_group_vit(S, B, K=K)
    Bp = -(-B // Bg) * Bg
    G = Bp // Bg
    Lp = -(-L // K) * K
    NB = Lp // K
    obs_t = jnp.swapaxes(jnp.moveaxis(obs, 1, 0), 1, 2)   # [L, S, B]
    obs_t = jnp.pad(
        obs_t, ((0, Lp - L), (0, Sp - S), (0, Bp - B)),
        constant_values=LOG_ZERO,
    )
    obs_arr = jnp.moveaxis(
        obs_t.reshape(NB, K, Sp, G, Bg), 3, 0
    )
    len_g = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B)) \
        .reshape(G, 1, Bg)
    trans_p = jnp.pad(
        log_trans, ((0, Sp - S), (0, Sp - S)),
        constant_values=LOG_ZERO,
    )
    init_g = jnp.moveaxis(
        jnp.pad(
            init_cols.T, ((0, Sp - S), (0, Bp - B)),
            constant_values=LOG_ZERO,
        ).reshape(Sp, G, Bg),
        1, 0,
    )

    v_pad, dm_pad = pl.pallas_call(
        _make_viterbi_kernel_v3(carry_mode),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Sp, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, NB, K, Sp, Bg), jnp.float32),
            jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, init_g, trans_p, obs_arr)

    v = jnp.moveaxis(v_pad, 0, 3).reshape(Lp, Sp, Bp)
    v_hats = jnp.transpose(v[:L, :S, :B], (0, 2, 1))      # [L, B, S]
    dms = jnp.moveaxis(dm_pad[:, :, :, 0, :], 0, 2).reshape(Lp, Bp)
    dms = dms[:L, :B]                                      # [L, B]
    return v_hats, dms


@jax.jit
def viterbi_pallas_v3(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Batch-grouped streaming Viterbi: any state count (VMEM-sized
    groups), bit-identical paths to ops.dp.viterbi (same max-plus op
    order, same first-hit argmax tie-breaking in the shared XLA
    backtrace)."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    init = jnp.broadcast_to(log_start[None, :], (B, S))
    v_hats, dms = _viterbi_values_v3(
        init, log_trans, obs, lengths, carry_mode=False
    )
    v_final = v_hats[-1]
    score = jnp.max(v_final, axis=-1) + jnp.sum(dms, axis=0)
    score = jnp.where(lengths > 0, score, 0.0)
    last_state = jnp.argmax(v_final, axis=-1).astype(jnp.int32)
    trans_T = log_trans.T

    def back(state, xs):
        v_prev, t = xs
        col = trans_T[state]
        prev = jnp.argmax(v_prev + col, axis=-1).astype(jnp.int32)
        valid_t = t < lengths
        prev = jnp.where(valid_t, prev, state)
        return prev, state

    ts = jnp.arange(1, L)
    first_state, states = jax.lax.scan(
        back, last_state, (v_hats[:-1], ts), reverse=True, unroll=8
    )
    path = jnp.concatenate([first_state[None], states], axis=0)
    return jnp.moveaxis(path, 0, 1), score


@jax.jit
def viterbi_chunk_values_pallas(
    log_trans: jax.Array,
    obs: jax.Array,
    v_hat_init: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Streaming counterpart of dp.viterbi_chunk_values (the recompute
    sweep of the EXACT checkpointed decoder): value rows of one chunk
    from its incoming carry, every position applying a transition."""
    B, L, S = obs.shape
    lengths = jnp.full((B,), L, jnp.int32) if lengths is None else lengths
    v_hats, _ = _viterbi_values_v3(
        v_hat_init, log_trans, obs, lengths, carry_mode=True
    )
    return jnp.moveaxis(v_hats, 0, 1)                     # [B, L, S]


# ---------------------------------------------------------------------
# v4 FUSED E-step engine: symbols in, sufficient statistics out.
#
# The round-2 profile (tools/profile_estep.py on v5e, S=64/B=1024/
# L=1024) showed the v3 E-step is HBM-bound, not compute-bound: obs_p
# materialization 4.4ms + forward 5.6 + backward 6.8 + XLA epilogue
# 10.4ms — most of it [B,L,S]-sized tensors round-tripping HBM and
# their layout transposes.  The v4 design eliminates every per-position
# f32 tensor except alpha:
#
# * the FORWARD kernel streams int32 SYMBOLS (tiny), builds the one-hot
#   in VMEM, computes obs_p = exp(em@oh - max) in-kernel (MXU matmul +
#   bulk exp on full tiles), and writes only alpha_p + the normalizer
#   stream (the per-position obs max is folded into dm);
# * the BACKWARD+STATS kernel walks the blocks in reverse, recomputes
#   obs_p from the same symbols, streams alpha_p back in, carries beta
#   in VMEM, and accumulates the THREE EM contractions on the fly:
#     pair[i,j]  += (alpha[p-1] * w) outer b_fac[p]      (MXU)
#     em[s, tv]  += gamma[p] @ onehot[p]                 (MXU)
#     start[s]    = sum_b gamma[0]
#   so beta, gamma, b_fac, obs_p and the one-hot NEVER touch HBM.
#
# Total E-step HBM traffic: symbols read twice + alpha written once and
# read once — ~0.6GB at B*L=1M, S=64 vs ~8GB for v3+epilogue.
# The per-step math matches ops/em.em_sufficient_stats' factored,
# per-step-normalized xi formulation exactly (z = (T^T a_prev)·b_fac
# per column, all factors in [0,1]).
# ---------------------------------------------------------------------


# Matmul precision inside the v4 kernels.  "high" (3 MXU passes,
# DEFAULT) — Mosaic does not lower Precision.HIGH, so it is emulated
# with manual bf16 splits:
#   * generic f32xf32 dots use the classic 3-term scheme
#     ah·bh + ah·bl + al·bh (2-way splits; ~2^-21 relative for these
#     operands, which are probabilities in [0, 1]);
#   * dots where one factor is EXACT in bf16 (the one-hot) 3-way-split
#     the other factor instead — full f32 accuracy in 3 passes.
# Measured on v5e (tools/bench_engines.py, 2026-08): 1.73-1.82x faster
# than HIGHEST at every config with total-loglik rel-delta <= 1e-7 vs
# the XLA HIGHEST engine (f32 representation noise at these magnitudes).
# HIGHEST = true-f32 (6 bf16 passes) for bit-parity experiments.
# Overridable: TEHMM_V4_PRECISION=highest|high|default.
import os as _os

_V4_MODE = _os.environ.get("TEHMM_V4_PRECISION", "high").lower()
_V4_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGHEST,   # emulated below, not used
    "default": jax.lax.Precision.DEFAULT,
}[_V4_MODE]


def _bf16_split2(x):
    """x ~= hi + lo with both parts bf16-representable (8+8 mantissa
    bits); returned IN f32 so Mosaic dots take uniform operand types."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (x - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


def _bf16_split3(x):
    """x ~= hi + mid + lo (8+8+8 mantissa bits ~= full f32)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, lo


def _v4_dot(a, b, dn=None):
    """f32 x f32 dot at the configured v4 precision.

    dn: dot_general dimension_numbers; None = plain 2D matmul."""
    if dn is None:
        dn = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32)
    if _V4_MODE != "high":
        return jax.lax.dot_general(
            a, b, dn, precision=_V4_PRECISION, **kw
        )
    d = lambda x, y: jax.lax.dot_general(
        x, y, dn, precision=jax.lax.Precision.DEFAULT, **kw
    )
    ah, al = _bf16_split2(a)
    bh, bl = _bf16_split2(b)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _v4_dot_full(a, b, dn=None):
    """f32 x f32 dot with a 3x2 bf16 split (6 MXU passes): ``a`` is
    split 3-way (f32-exact), ``b`` 2-way.  Used for the gaussian
    quadratic form, where ``a`` is the FIXED coefficient matrix — a
    2-way split of a fixed factor leaves the same ~2^-16 rounding
    residual at every position, which accumulates as a systematic
    log-likelihood bias (measured 0.18 abs on |ll|=1e4 at L=256);
    with ``a`` exact, only the per-position feature residuals remain
    and those cancel as a random walk (~1e-7 relative total)."""
    if dn is None:
        dn = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32)
    if _V4_MODE != "high":
        return jax.lax.dot_general(
            a, b, dn, precision=_V4_PRECISION, **kw
        )
    d = lambda x, y: jax.lax.dot_general(
        x, y, dn, precision=jax.lax.Precision.DEFAULT, **kw
    )
    ah, am, al = _bf16_split3(a)
    bh, bl = _bf16_split2(b)
    return (
        d(ah, bh) + (d(ah, bl) + d(am, bh))
        + (d(am, bl) + d(al, bh) + d(al, bl))
    )


def _v4_dot_oh(a, oh, dn=None):
    """Dot where ``oh`` is a one-hot factor (EXACT in bf16): 3-way
    split of ``a`` gives full f32 accuracy in 3 MXU passes."""
    if dn is None:
        dn = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32)
    if _V4_MODE != "high":
        return jax.lax.dot_general(
            a, oh, dn, precision=_V4_PRECISION, **kw
        )
    d = lambda x, y: jax.lax.dot_general(
        x, y, dn, precision=jax.lax.Precision.DEFAULT, **kw
    )
    ah, am, al = _bf16_split3(a)
    return d(ah, oh) + (d(am, oh) + d(al, oh))


def _pick_batch_group_v4(S: int, T: int, V: int, B: int,
                         K: int = _KV2, GF: int = 0) -> int:
    """``GF``: padded gaussian feature rows (3·G tracks -> multiple
    of 8) when the gaussian streams ride along, else 0."""
    Sp = max(-(-S // 8) * 8, 8)
    TVp = -(-(T * V) // 128) * 128
    Tp = max(-(-T // 8) * 8, 8)
    resident = (
        3 * Sp * Sp * 4          # trans, trans_T, pair acc
        + 2 * Sp * TVp * 4       # em table + em acc
        + 2 * Sp * GF * 4        # gauss coeffs + moment acc
    )
    budget = (9 << 20) - resident
    per_col = (
        2 * K * Sp * 4           # alpha double buffer
        + 2 * K * Tp * 4         # symbol double buffer
        + 2 * K * GF * 4         # gauss feature double buffer
        + TVp * 4                # one-hot scratch
        + 6 * Sp * 4             # carries / deferred / temporaries
    )
    bg = max(128, (budget // per_col) // 128 * 128)
    Bp = -(-B // 128) * 128
    return min(bg, Bp)


def _gauss_feat_stream(gauss_values, L, Lp, B, Bp, NB, K, G_grid, Bg):
    """values f32[B, L, G] (NaN missing) -> feature stream
    [G_grid, NB, K, GFp, Bg] with rows [mask·1 | mask·x | mask·x²]
    (each block G rows wide), zero-padded to GFp = ceil(3G/8)·8 (sublane-aligned — the
    contraction dim needs no 128 padding, and 8 f32 rows per position
    keeps the stream's HBM traffic at symbol-stream scale).
    Zero rows contribute nothing to the coeff dot, so missing values
    and padding are inert exactly like gauss_log_likelihoods."""
    Gn = gauss_values.shape[-1]
    GFp = max(-(-(3 * Gn) // 8) * 8, 8)
    mask = jnp.isfinite(gauss_values).astype(jnp.float32)
    x = jnp.where(mask > 0, gauss_values.astype(jnp.float32), 0.0)
    feats = jnp.concatenate(
        [mask, x * mask, x * x * mask], axis=-1
    )                                                    # [B, L, 3G]
    f_t = jnp.swapaxes(jnp.moveaxis(feats, 1, 0), 1, 2)  # [L, 3G, B]
    f_t = jnp.pad(
        f_t, ((0, Lp - L), (0, GFp - 3 * Gn), (0, Bp - B))
    )
    return jnp.moveaxis(
        f_t.reshape(NB, K, GFp, G_grid, Bg), 3, 0
    ), GFp


def _gauss_coeff_matrix(gauss_params, Sp, GFp):
    """GaussParams -> [Sp, GFp] quadratic-form coefficients in the
    _gauss_feat_stream row order [c0-block | c1-block | c2-block]."""
    from tehmm_tpu.models.gauss import _coeffs

    c0, c1, c2 = _coeffs(gauss_params)                   # each [S, G]
    S, Gn = c0.shape
    W = jnp.concatenate([c0, c1, c2], axis=1)            # [S, 3G]
    return jnp.pad(W, ((0, Sp - S), (0, GFp - 3 * Gn)))


def _v4_opt_streams(obs_weights, gauss_params, gauss_values,
                    L, Lp, B, Bp, NB, K, G, Bg, Sp, GFp):
    """Build the optional weight-row and gaussian-feature streams
    shared by the three fused-v4 wrappers (E-step / Viterbi / maxPost).

    Returns (call_args, in_specs, scratch_bufs, sems) — the caller
    splices scratch_bufs right after the symbol buffer and sems right
    after the symbol semaphore, matching the kernels' unpack order."""
    args, in_specs, scratch, sems = [], [], [], []
    if obs_weights is not None:
        # weights -> [G, NB, K, 8, Bg] f32, row 0 = weight (pad rows 0)
        w_t = jnp.pad(
            jnp.moveaxis(obs_weights.astype(jnp.float32), 1, 0),
            ((0, Lp - L), (0, Bp - B)),
        )                                                # [Lp, Bp]
        w_arr = jnp.moveaxis(w_t.reshape(NB, K, 1, G, Bg), 3, 0)
        w_arr = jnp.concatenate(
            [w_arr, jnp.zeros((G, NB, K, 7, Bg), jnp.float32)], axis=3
        )
        args.append(w_arr)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, K, 8, Bg), jnp.float32))
        sems.append(pltpu.SemaphoreType.DMA((2,)))
    if gauss_params is not None and gauss_values is not None:
        gf_arr, _ = _gauss_feat_stream(
            gauss_values, L, Lp, B, Bp, NB, K, G, Bg
        )
        gw = _gauss_coeff_matrix(gauss_params, Sp, GFp)
        args += [gf_arr, gw]
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Sp, GFp), lambda g: (0, 0)),
        ]
        scratch.append(pltpu.VMEM((2, K, GFp, Bg), jnp.float32))
        sems.append(pltpu.SemaphoreType.DMA((2,)))
    return args, in_specs, scratch, sems


def _oh_build(sym_k, T: int, V: int, TVp: int, Bg: int):
    """[Tp, Bg] int32 -> one-hot f32[TVp, Bg] (cols beyond T*V zero)."""
    rows = []
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, Bg), 0)
    for tr in range(T):
        row = sym_k[tr, :][None, :]                     # [1, Bg]
        rows.append((iota_v == row).astype(jnp.float32))
    oh = jnp.concatenate(rows, axis=0)                  # [T*V, Bg]
    if TVp > T * V:
        oh = jnp.concatenate(
            [oh, jnp.zeros((TVp - T * V, Bg), jnp.float32)], axis=0
        )
    return oh


def _obs_p_from_sym(em_ref, oh, w=None, gauss=None):
    """log_em-flat [Sp, TVp] x one-hot [TVp, Bg] -> (obs_p, o_m).

    ``w`` [1, Bg]: optional per-position emission-weight row (segment
    mode, reference emission.py effectiveSegmentLength [R?]) — scales
    the log obs, i.e. P(obs|state)^w.

    ``gauss``: optional (gw_ref [Sp, GFp], gf [GFp, Bg]) — gaussian-
    track normal log-densities as a quadratic form (models/gauss.py
    _coeffs): gw holds [c0, c1, c2] per track, gf holds
    [mask, x·mask, x²·mask] per position, so the dot adds
    sum_g logN(x | mu, var) to every state row on the MXU."""
    obs_log = _v4_dot_oh(em_ref[:, :], oh)              # [Sp, Bg]
    if gauss is not None:
        gw_ref, gf = gauss
        obs_log = obs_log + _v4_dot_full(gw_ref[:, :], gf)
    if w is not None:
        obs_log = obs_log * w
    o_m = jnp.max(obs_log, axis=0, keepdims=True)       # [1, Bg]
    return jnp.exp(obs_log - o_m), o_m


def _make_forward_kernel_v4(
    T: int, V: int, weighted: bool = False, gauss: bool = False,
    emit_dm: bool = True,
):
    def kernel(
        len_ref,        # [1, 1, Bg] int32
        start_ref,      # [1, Sp, Bg] exp(log_start) bcast (pad rows 0)
        trans_t_ref,    # [Sp, Sp] exp(log_trans).T zero-padded
        em_ref,         # [Sp, TVp] log_em flat (pad rows ~-1e9, cols 0)
        *rest,
    ):
        rest = list(rest)
        # optional streams slot in after their mandatory neighbor:
        # inputs [sym, w?, gf?, gw?], outputs [alpha, dm?],
        # scratch [sym_buf, w_buf?, gf_buf?, out, dm?, p,
        #          in_sem, w_sem?, gf_sem?, out_sem, dm_sem?]
        # emit_dm=False (the maxPost caller) drops the dm stream: the
        # per-position argmax needs no normalizers, so the 8-row f32
        # write per position is pure waste there
        sym_hbm = rest.pop(0)
        w_hbm = rest.pop(0) if weighted else None
        gf_hbm = rest.pop(0) if gauss else None
        gw_ref = rest.pop(0) if gauss else None
        alpha_hbm = rest.pop(0)
        dm_hbm = rest.pop(0) if emit_dm else None
        sym_buf = rest.pop(0)
        w_buf = rest.pop(0) if weighted else None
        gf_buf = rest.pop(0) if gauss else None
        out_buf = rest.pop(0)
        dm_buf = rest.pop(0) if emit_dm else None
        p_scr = rest.pop(0)
        in_sem = rest.pop(0)
        w_sem = rest.pop(0) if weighted else None
        gf_sem = rest.pop(0) if gauss else None
        out_sem = rest.pop(0)
        dm_sem = rest.pop(0) if emit_dm else None
        g = pl.program_id(0)
        NB = sym_hbm.shape[1]
        K = sym_hbm.shape[2]
        Bg = sym_hbm.shape[4]
        TVp = em_ref.shape[1]
        lens = len_ref[0, 0, :][None, :]
        start_p = start_ref[0]

        def in_dma(slot, blk):
            return pltpu.make_async_copy(
                sym_hbm.at[g, blk], sym_buf.at[slot], in_sem.at[slot]
            )

        def w_dma(slot, blk):
            return pltpu.make_async_copy(
                w_hbm.at[g, blk], w_buf.at[slot], w_sem.at[slot]
            )

        def gf_dma(slot, blk):
            return pltpu.make_async_copy(
                gf_hbm.at[g, blk], gf_buf.at[slot], gf_sem.at[slot]
            )

        def out_dma(slot, blk):
            return pltpu.make_async_copy(
                out_buf.at[slot], alpha_hbm.at[g, blk], out_sem.at[slot]
            )

        def dm_dma(slot, blk):
            return pltpu.make_async_copy(
                dm_buf.at[slot], dm_hbm.at[g, blk], dm_sem.at[slot]
            )

        in_dma(0, 0).start()
        if weighted:
            w_dma(0, 0).start()
        if gauss:
            gf_dma(0, 0).start()
        p_scr[:, :] = jnp.ones_like(p_scr)

        def body(blk, _):
            slot = jax.lax.rem(blk, 2)
            nxt = jax.lax.rem(blk + 1, 2)

            @pl.when(blk + 1 < NB)
            def _prefetch():
                in_dma(nxt, blk + 1).start()
                if weighted:
                    w_dma(nxt, blk + 1).start()
                if gauss:
                    gf_dma(nxt, blk + 1).start()

            in_dma(slot, blk).wait()
            if weighted:
                w_dma(slot, blk).wait()
            if gauss:
                gf_dma(slot, blk).wait()

            @pl.when(blk >= 2)
            def _drain():
                out_dma(slot, blk - 2).wait()
                if emit_dm:
                    dm_dma(slot, blk - 2).wait()

            for k in range(K):
                t = blk * K + k
                oh = _oh_build(sym_buf[slot, k], T, V, TVp, Bg)
                wk = w_buf[slot, k, 0:1, :] if weighted else None
                gk = (gw_ref, gf_buf[slot, k]) if gauss else None
                obs_p, o_m = _obs_p_from_sym(em_ref, oh, wk, gk)
                p = p_scr[:, :]
                s = _v4_dot(trans_t_ref[:, :], p)
                base = jnp.where(t == 0, start_p, s)
                u = base * obs_p
                m = jnp.max(u, axis=0, keepdims=True)
                m_safe = jnp.maximum(m, 1e-37)
                valid = t < lens
                new_p = jnp.where(valid, u * (1.0 / m_safe), p)
                p_scr[:, :] = new_p
                out_buf[slot, k] = new_p
                if emit_dm:
                    # row 0: loglik increment log(m) + o_m; row 1: raw
                    # m (consumed by the stats kernel's z identity)
                    dm = jnp.where(valid, jnp.log(m_safe) + o_m, 0.0)
                    m_raw = jnp.where(valid, m_safe, 1.0)
                    ridx = jax.lax.broadcasted_iota(
                        jnp.int32, dm_buf[slot, k].shape, 0
                    )
                    dm_buf[slot, k] = jnp.where(
                        ridx == 0,
                        jnp.broadcast_to(dm, dm_buf[slot, k].shape),
                        jnp.where(
                            ridx == 1,
                            jnp.broadcast_to(
                                m_raw, dm_buf[slot, k].shape
                            ),
                            0.0,
                        ),
                    )
            out_dma(slot, blk).start()
            if emit_dm:
                dm_dma(slot, blk).start()
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        @pl.when(NB >= 2)
        def _():
            out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
            if emit_dm:
                dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
        if emit_dm:
            dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()

    return kernel


def _make_bwd_stats_kernel_v4(
    T: int, V: int, weighted: bool = False, gauss: bool = False
):
    def kernel(
        len_ref,        # [1, 1, Bg] int32
        trans_ref,      # [Sp, Sp] exp(log_trans) zero-padded
        trans_t_ref,    # [Sp, Sp] unused (kept for spec symmetry)
        em_ref,         # [Sp, TVp] log_em flat
        *rest,
        # weighted adds w_hbm [G,NB,K,8,Bg] (row 0 = weight) after
        # sym_hbm, plus its w_buf/w_sem scratch pair; gauss adds the
        # gf_hbm feature stream + gw_ref coeff matrix, a gsc_ref
        # [1, Sp, GFp] moment-sum output, and gf_buf/gf_sem scratch
    ):
        rest = list(rest)
        sym_hbm = rest.pop(0)
        w_hbm = rest.pop(0) if weighted else None
        gf_hbm = rest.pop(0) if gauss else None
        gw_ref = rest.pop(0) if gauss else None
        alpha_hbm, dm_hbm = rest.pop(0), rest.pop(0)
        pair_ref, emc_ref, start_ref = (
            rest.pop(0), rest.pop(0), rest.pop(0)
        )
        gsc_ref = rest.pop(0) if gauss else None
        sym_buf = rest.pop(0)
        w_buf = rest.pop(0) if weighted else None
        gf_buf = rest.pop(0) if gauss else None
        alpha_buf, dm_buf = rest.pop(0), rest.pop(0)
        b_scr, defer_scr, defer_z_scr = (
            rest.pop(0), rest.pop(0), rest.pop(0)
        )
        sym_sem = rest.pop(0)
        w_sem = rest.pop(0) if weighted else None
        gf_sem = rest.pop(0) if gauss else None
        alpha_sem, dm_sem = rest.pop(0), rest.pop(0)
        g = pl.program_id(0)
        NB = sym_hbm.shape[1]
        K = sym_hbm.shape[2]
        Bg = sym_hbm.shape[4]
        TVp = em_ref.shape[1]
        lens = len_ref[0, 0, :][None, :]

        def sym_dma(slot, blk):
            return pltpu.make_async_copy(
                sym_hbm.at[g, blk], sym_buf.at[slot], sym_sem.at[slot]
            )

        def w_dma(slot, blk):
            return pltpu.make_async_copy(
                w_hbm.at[g, blk], w_buf.at[slot], w_sem.at[slot]
            )

        def gf_dma(slot, blk):
            return pltpu.make_async_copy(
                gf_hbm.at[g, blk], gf_buf.at[slot], gf_sem.at[slot]
            )

        def alpha_dma(slot, blk):
            return pltpu.make_async_copy(
                alpha_hbm.at[g, blk], alpha_buf.at[slot],
                alpha_sem.at[slot]
            )

        def dm_dma(slot, blk):
            return pltpu.make_async_copy(
                dm_hbm.at[g, blk], dm_buf.at[slot], dm_sem.at[slot]
            )

        # reverse walk: iteration r processes natural block NB-1-r
        sym_dma(0, NB - 1).start()
        if weighted:
            w_dma(0, NB - 1).start()
        if gauss:
            gf_dma(0, NB - 1).start()
        alpha_dma(0, NB - 1).start()
        dm_dma(0, NB - 1).start()
        b_scr[:, :] = jnp.ones_like(b_scr)
        pair_ref[0] = jnp.zeros_like(pair_ref[0])
        emc_ref[0] = jnp.zeros_like(emc_ref[0])
        start_ref[0] = jnp.zeros_like(start_ref[0])
        if gauss:
            gsc_ref[0] = jnp.zeros_like(gsc_ref[0])

        def apply_pair(a_prev, xn, z, valid_p):
            # z = sum_ij a_i T_ij b_fac_j, computed WITHOUT a matmul via
            # the forward-normalizer identity: s_pre * obs_p = alpha * m
            # (exact per-step algebra; see caller)
            w = jnp.where(valid_p, 1.0 / jnp.maximum(z, 1e-30), 0.0)
            pair_ref[0] += _v4_dot(
                a_prev * w, xn, (((1,), (1,)), ((), ()))
            )

        def body(r, _):
            blk = NB - 1 - r
            slot = jax.lax.rem(r, 2)
            nxt = jax.lax.rem(r + 1, 2)

            @pl.when(r + 1 < NB)
            def _prefetch():
                sym_dma(nxt, blk - 1).start()
                if weighted:
                    w_dma(nxt, blk - 1).start()
                if gauss:
                    gf_dma(nxt, blk - 1).start()
                alpha_dma(nxt, blk - 1).start()
                dm_dma(nxt, blk - 1).start()

            sym_dma(slot, blk).wait()
            if weighted:
                w_dma(slot, blk).wait()
            if gauss:
                gf_dma(slot, blk).wait()
            alpha_dma(slot, blk).wait()
            dm_dma(slot, blk).wait()

            # deferred pair from the later block's k==0 step: its
            # alpha[p0-1] is THIS block's last row (xn and z were saved
            # in the defer scratches)
            @pl.when(r > 0)
            def _deferred():
                p0 = (blk + 1) * K
                apply_pair(
                    alpha_buf[slot, K - 1], defer_scr[:, :],
                    defer_z_scr[0:1, :], p0 < lens,
                )

            for k in range(K - 1, -1, -1):      # static reverse unroll
                p = blk * K + k
                oh = _oh_build(sym_buf[slot, k], T, V, TVp, Bg)
                wk = w_buf[slot, k, 0:1, :] if weighted else None
                gk = (gw_ref, gf_buf[slot, k]) if gauss else None
                obs_p, _o_m = _obs_p_from_sym(em_ref, oh, wk, gk)
                b = b_scr[:, :]
                valid_p = p < lens                          # [1, Bg]
                # ---- b_fac ----
                x = obs_p * b
                xm = jnp.maximum(
                    jnp.max(x, axis=0, keepdims=True), 1e-37
                )
                xn = x * (1.0 / xm)
                # ---- gamma + emission counts (+ start at p==0) ----
                a_p = alpha_buf[slot, k]
                ab = a_p * b
                gden = jnp.maximum(
                    jnp.sum(ab, axis=0, keepdims=True), 1e-30
                )
                gamma = jnp.where(valid_p, ab * (1.0 / gden), 0.0)
                m_p = dm_buf[slot, k, 1:2, :]               # [1, Bg]
                z_p = m_p * gden * (1.0 / xm)
                # segment mode: a segment standing for w positions
                # contributes w expected emission counts
                emc_ref[0] += _v4_dot_oh(
                    gamma * wk if weighted else gamma,
                    oh, (((1,), (1,)), ((), ())),
                )
                if gauss:
                    # posterior moment sums gamma @ [mask, x, x2].T;
                    # segment weights scale the moments like the
                    # emission counts (the likelihood raises the
                    # density to the power w — see ops/em.py)
                    gsc_ref[0] += _v4_dot(
                        gamma * wk if weighted else gamma,
                        gf_buf[slot, k],
                        (((1,), (1,)), ((), ())),
                    )
                @pl.when(p == 0)
                def _start():
                    col0 = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, start_ref[0].shape, 1
                        ) == 0
                    ).astype(jnp.float32)
                    start_ref[0] += jnp.broadcast_to(
                        jnp.sum(gamma, axis=1, keepdims=True),
                        start_ref[0].shape,
                    ) * col0
                # ---- pair (transition INTO p; defer at block edge) ----
                if k > 0:
                    apply_pair(alpha_buf[slot, k - 1], xn, z_p, valid_p)
                else:
                    defer_scr[:, :] = xn
                    defer_z_scr[0:1, :] = z_p
                # ---- beta update ----
                s_b = _v4_dot(trans_ref[:, :], xn)
                nm = jnp.maximum(
                    jnp.max(s_b, axis=0, keepdims=True), 1e-37
                )
                b_scr[:, :] = jnp.where(valid_p, s_b * (1.0 / nm), b)
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

    return kernel


@jax.jit
def em_counts_fused_pallas_v4(
    log_start: jax.Array,
    log_trans: jax.Array,
    log_em: jax.Array,
    symbols: jax.Array,     # int32[B, L, T]
    lengths: jax.Array,
    obs_weights: jax.Array | None = None,   # f32[B, L] segment weights
    gauss_params=None,                      # models/gauss.GaussParams
    gauss_values: jax.Array | None = None,  # f32[B, L, Gn] NaN missing
):
    """Fused E-step: (start, pair, em, loglik[, gauss moments]) from
    raw symbols.

    ``pair`` excludes the transition-probability factor (multiply by
    exp(log_trans) for expected transition counts, exactly like the
    factored epilogue in ops/em.em_sufficient_stats).

    ``obs_weights`` (segment mode, reference emission.py
    effectiveSegmentLength [R?]): per-position emission-weight stream —
    obs log-probs scale by w inside both kernels and expected emission
    counts scale by w, matching the XLA path's ``obs * w`` semantics.

    ``gauss_params``/``gauss_values`` (gaussian track distributions,
    reference track.py distribution="gaussian" [R?]): the normal
    log-densities enter as a quadratic-form MXU dot against a streamed
    [mask | x | x²] feature block, and the backward kernel accumulates
    the posterior moment sums (gn, gx, gx2) in VMEM — returned as a
    5th element, matching models/gauss.gauss_stats."""
    B, L, T = symbols.shape
    S, _T2, V = log_em.shape
    K = _KV2
    Sp = max(-(-S // 8) * 8, 8)
    Tp = max(-(-T // 8) * 8, 8)
    TVp = -(-(T * V) // 128) * 128
    has_gauss = gauss_params is not None and gauss_values is not None
    Gn = gauss_values.shape[-1] if has_gauss else 0
    GFp = max(-(-(3 * Gn) // 8) * 8, 8) if has_gauss else 0
    Bg = _pick_batch_group_v4(S, T, V, B, GF=GFp)
    Bp = -(-B // Bg) * Bg
    G = Bp // Bg
    Lp = -(-L // K) * K
    NB = Lp // K

    # symbols -> [G, NB, K, Tp, Bg] (int32; pad positions/tracks = 0)
    sym_t = jnp.swapaxes(
        jnp.moveaxis(symbols.astype(jnp.int32), 1, 0), 1, 2
    )                                                    # [L, T, B]
    sym_t = jnp.pad(
        sym_t, ((0, Lp - L), (0, Tp - T), (0, Bp - B))
    )
    sym_arr = jnp.moveaxis(
        sym_t.reshape(NB, K, Tp, G, Bg), 3, 0
    )
    len_g = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B)) \
        .reshape(G, 1, Bg)
    trans_exp = jnp.exp(log_trans)
    trans_p = jnp.pad(trans_exp, ((0, Sp - S), (0, Sp - S)))
    trans_t = jnp.pad(trans_exp.T, ((0, Sp - S), (0, Sp - S)))
    em_flat = jnp.pad(
        log_em.reshape(S, T * V),
        ((0, Sp - S), (0, TVp - T * V)),
    )
    if Sp > S:
        # pad state rows must yield obs_p == 0 (mirror v3's zero pads)
        em_flat = em_flat.at[S:, :].set(-1e9)
    start_g = jnp.broadcast_to(
        jnp.pad(jnp.exp(log_start), (0, Sp - S))[None, :, None],
        (G, Sp, Bg),
    )

    weighted = obs_weights is not None
    opt_args, opt_in_spec, opt_scratch, opt_sems = _v4_opt_streams(
        obs_weights, gauss_params if has_gauss else None,
        gauss_values if has_gauss else None,
        L, Lp, B, Bp, NB, K, G, Bg, Sp, GFp,
    )

    alpha_pad, dm_pad = pl.pallas_call(
        _make_forward_kernel_v4(T, V, weighted, has_gauss),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Sp, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, TVp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + opt_in_spec,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, NB, K, Sp, Bg), jnp.float32),
            jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Tp, Bg), jnp.int32),
        ] + opt_scratch + [
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + opt_sems + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, start_g, trans_t, em_flat, sym_arr, *opt_args)

    stats_out_specs = [
        pl.BlockSpec((1, Sp, Sp), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, Sp, TVp), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, Sp, 128), lambda g: (g, 0, 0)),
    ]
    stats_out_shape = [
        jax.ShapeDtypeStruct((G, Sp, Sp), jnp.float32),
        jax.ShapeDtypeStruct((G, Sp, TVp), jnp.float32),
        jax.ShapeDtypeStruct((G, Sp, 128), jnp.float32),
    ]
    if has_gauss:
        stats_out_specs.append(
            pl.BlockSpec((1, Sp, GFp), lambda g: (g, 0, 0))
        )
        stats_out_shape.append(
            jax.ShapeDtypeStruct((G, Sp, GFp), jnp.float32)
        )

    stats = pl.pallas_call(
        _make_bwd_stats_kernel_v4(T, V, weighted, has_gauss),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, TVp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + opt_in_spec + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=stats_out_specs,
        out_shape=stats_out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, K, Tp, Bg), jnp.int32),
        ] + opt_scratch + [
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.VMEM((8, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + opt_sems + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, trans_p, trans_t, em_flat, sym_arr, *opt_args,
      alpha_pad, dm_pad)
    pair_g, emc_g, start_cnt_g = stats[0], stats[1], stats[2]

    # ---- host-side (XLA) finish: tiny reductions only ----
    start = jnp.sum(start_cnt_g[:, :S, 0], axis=0)          # [S]
    pair = jnp.sum(pair_g[:, :S, :S], axis=0)
    em = jnp.sum(emc_g[:, :S, : T * V], axis=0).reshape(S, T, V)
    # loglik from the final alpha row + the folded normalizer stream
    alpha_last = alpha_pad[:, NB - 1, K - 1]                # [G, Sp, Bg]
    # [G, Sp, Bg] -> [Sp, G, Bg] -> [Sp, Bp] keeps b = g*Bg + bg (the
    # column order dms/lengths use); moveaxis(.., 0, 2) would interleave
    alpha_last = jnp.moveaxis(alpha_last, 0, 1).reshape(Sp, Bp)
    dms = jnp.moveaxis(dm_pad[:, :, :, 0, :], 0, 2).reshape(Lp, Bp)
    loglik_b = (
        jnp.log(jnp.sum(alpha_last[:S, :B], axis=0))
        + jnp.sum(dms[:L, :B], axis=0)
    )
    loglik_b = jnp.where(lengths > 0, loglik_b, 0.0)
    if has_gauss:
        gsc = jnp.sum(stats[3][:, :S, : 3 * Gn], axis=0)  # [S, 3Gn]
        gn = gsc[:, :Gn]
        gx = gsc[:, Gn : 2 * Gn]
        gx2 = gsc[:, 2 * Gn :]
        return start, pair, em, loglik_b, (gn, gx, gx2)
    return start, pair, em, loglik_b


# ---------------------------------------------------------------------
# v4 FUSED Viterbi: symbols in, state path out.
#
# Decode previously paid the full v3 pipeline: an XLA one-hot obs
# matmul writing [B,L,S] to HBM, layout transposes into and out of the
# kernel, and an L-step XLA backtrace scan.  The fused design mirrors
# the v4 E-step: the FORWARD kernel streams int32 symbols, recomputes
# obs_log in VMEM (exact 3-pass one-hot dot) and runs the max-plus
# recurrence, writing only the max-normalized value rows (in KERNEL
# layout — no transposes); the BACKTRACE kernel walks the value blocks
# in reverse carrying the current state as a one-hot column, gathers
# trans[:, state] with an exact one-hot dot on the MXU, and emits the
# int32 path directly.  Tie-breaking is first-hit lowest index in both
# kernels — bit-identical paths to ops.dp.viterbi (tested).
# Reference semantics: basehmm.py `_do_viterbi_pass` [R].
# ---------------------------------------------------------------------


def _maxplus_rows(v_hat, trans_ref, Sp: int):
    """best[j, b] = max_i (v_hat[i, b] + trans[i, j]) — the max-plus
    Viterbi step as Sp unrolled rank-1 broadcast-maxes.

    VMEM-stack note (measured on v5e): Mosaic schedules the Sp
    independent adds ahead of the max chain and stack-allocates up to
    ALL Sp [Sp, Bg] temporaries per unrolled TIME step (S=256 OOMs at
    every batch-group size; S=128 fits only with K=1) —
    scratch-accumulator barriers do NOT stop the hoisting (reads have
    no ordering), and dynamic-slice row loops don't lower (no value
    dynamic_slice; lane-dim ref slices must be 128-aligned).  The
    wrappers drop the time unroll K to 1 past Sp=64, and the decode
    engine gates route S > 128 to the XLA decoder
    (parallel/stitch._use_fused_viterbi).

    Round-2 follow-up (tools/exp_maxplus_s256.py, BASELINE.md "S=256
    Viterbi serialization experiment"): at Sp=256 the compile crash is
    triggered by the 256 per-row trans[i, :][:, None] lane→sublane
    relayouts, not only the value stack; a relayout-free transposed
    [Bg, Sp] step with scratch-serialized maxes compiles and is exact
    but runs ~70x off the VPU roofline (1.15-1.33 ms/step) — measured
    dead end, so the S > 128 XLA fallback stands by design."""
    best = v_hat[0:1, :] + trans_ref[0, :][:, None]
    for i in range(1, Sp):
        best = jnp.maximum(
            best, v_hat[i:i + 1, :] + trans_ref[i, :][:, None]
        )
    return best


def _pick_batch_group_vit4(S: int, T: int, V: int, B: int,
                           K: int = _KV2, GF: int = 0) -> int:
    Sp = max(-(-S // 8) * 8, 8)
    TVp = -(-(T * V) // 128) * 128
    Tp = max(-(-T // 8) * 8, 8)
    resident = Sp * Sp * 4 + Sp * TVp * 4 + Sp * GF * 4
    budget = (9 << 20) - resident
    per_col = (
        2 * K * Sp * 4 * 2       # value rows: out buffer (fwd) / in (bwd)
        + 2 * K * Tp * 4         # symbol double buffer
        + 2 * K * GF * 4         # gauss feature double buffer
        + 2 * K * 8 * 4 * 2      # dm out (fwd) / path out (bwd)
        + TVp * 4                # one-hot scratch
        + 8 * Sp * 4             # carries / temporaries
        + K * Sp * Sp * 4 // 8   # max-plus stack temps (_maxplus_rows)
    )
    bg = max(128, (budget // per_col) // 128 * 128)
    Bp = -(-B // 128) * 128
    return min(bg, Bp)


def _make_viterbi_fwd_kernel_v4(
    T: int, V: int, weighted: bool = False, gauss: bool = False
):
    def kernel(
        len_ref,        # [1, 1, Bg] int32
        start_ref,      # [1, Sp, Bg] log_start bcast (pad rows LOG_ZERO)
        trans_ref,      # [Sp, Sp] log_trans (pads LOG_ZERO)
        em_ref,         # [Sp, TVp] log_em flat (pad rows ~-1e9, cols 0)
        *rest,
    ):
        rest = list(rest)
        sym_hbm = rest.pop(0)
        w_hbm = rest.pop(0) if weighted else None
        gf_hbm = rest.pop(0) if gauss else None
        gw_ref = rest.pop(0) if gauss else None
        v_hbm, dm_hbm = rest.pop(0), rest.pop(0)
        sym_buf = rest.pop(0)
        w_buf = rest.pop(0) if weighted else None
        gf_buf = rest.pop(0) if gauss else None
        out_buf, dm_buf, v_scr = (
            rest.pop(0), rest.pop(0), rest.pop(0)
        )
        in_sem = rest.pop(0)
        w_sem = rest.pop(0) if weighted else None
        gf_sem = rest.pop(0) if gauss else None
        out_sem, dm_sem = rest.pop(0), rest.pop(0)
        g = pl.program_id(0)
        NB = sym_hbm.shape[1]
        K = sym_hbm.shape[2]
        Bg = sym_hbm.shape[4]
        Sp = trans_ref.shape[0]
        TVp = em_ref.shape[1]
        lens = len_ref[0, 0, :][None, :]
        start_row = start_ref[0]

        def in_dma(slot, blk):
            return pltpu.make_async_copy(
                sym_hbm.at[g, blk], sym_buf.at[slot], in_sem.at[slot]
            )

        def w_dma(slot, blk):
            return pltpu.make_async_copy(
                w_hbm.at[g, blk], w_buf.at[slot], w_sem.at[slot]
            )

        def gf_dma(slot, blk):
            return pltpu.make_async_copy(
                gf_hbm.at[g, blk], gf_buf.at[slot], gf_sem.at[slot]
            )

        def out_dma(slot, blk):
            return pltpu.make_async_copy(
                out_buf.at[slot], v_hbm.at[g, blk], out_sem.at[slot]
            )

        def dm_dma(slot, blk):
            return pltpu.make_async_copy(
                dm_buf.at[slot], dm_hbm.at[g, blk], dm_sem.at[slot]
            )

        in_dma(0, 0).start()
        if weighted:
            w_dma(0, 0).start()
        if gauss:
            gf_dma(0, 0).start()
        # zero-length rows carry the initial scratch to every output row
        v_scr[:, :] = jnp.zeros_like(v_scr)

        def body(blk, _):
            slot = jax.lax.rem(blk, 2)
            nxt = jax.lax.rem(blk + 1, 2)

            @pl.when(blk + 1 < NB)
            def _prefetch():
                in_dma(nxt, blk + 1).start()
                if weighted:
                    w_dma(nxt, blk + 1).start()
                if gauss:
                    gf_dma(nxt, blk + 1).start()

            in_dma(slot, blk).wait()
            if weighted:
                w_dma(slot, blk).wait()
            if gauss:
                gf_dma(slot, blk).wait()

            @pl.when(blk >= 2)
            def _drain():
                out_dma(slot, blk - 2).wait()
                dm_dma(slot, blk - 2).wait()

            for k in range(K):             # static unroll
                t = blk * K + k
                oh = _oh_build(sym_buf[slot, k], T, V, TVp, Bg)
                obs_log = _v4_dot_oh(em_ref[:, :], oh)      # [Sp, Bg]
                if gauss:
                    obs_log = obs_log + _v4_dot_full(
                        gw_ref[:, :], gf_buf[slot, k]
                    )
                if weighted:
                    obs_log = obs_log * w_buf[slot, k, 0:1, :]
                v_hat = v_scr[:, :]
                best = _maxplus_rows(v_hat, trans_ref, Sp)
                base = jnp.where(t == 0, start_row, best)
                new = base + obs_log
                m = jnp.maximum(
                    jnp.max(new, axis=0, keepdims=True), LOG_ZERO
                )
                valid = t < lens
                new_hat = jnp.where(valid, new - m, v_hat)
                v_scr[:, :] = new_hat
                out_buf[slot, k] = new_hat
                dm_buf[slot, k] = jnp.broadcast_to(
                    jnp.where(valid, m, 0.0), dm_buf[slot, k].shape
                )
            out_dma(slot, blk).start()
            dm_dma(slot, blk).start()
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        @pl.when(NB >= 2)
        def _():
            out_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
            dm_dma(jax.lax.rem(NB - 2, 2), NB - 2).wait()
        out_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()
        dm_dma(jax.lax.rem(NB - 1, 2), NB - 1).wait()

    return kernel


def _viterbi_backtrace_kernel_v4(
    len_ref,        # [1, 1, Bg] int32
    trans_ref,      # [Sp, Sp] log_trans (pads LOG_ZERO)
    v_hbm,          # [G, NB, K, Sp, Bg] max-normalized values (ANY)
    path_hbm,       # [G, NB, K, 8, Bg] out int32 (row 0 = state)
    v_buf, path_buf, soh_scr, state_scr,
    v_sem, path_sem,
):
    g = pl.program_id(0)
    NB = v_hbm.shape[1]
    K = v_hbm.shape[2]
    Sp = v_hbm.shape[3]
    Bg = v_hbm.shape[4]
    Lp = NB * K
    lens = len_ref[0, 0, :][None, :]

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[g, blk], v_buf.at[slot], v_sem.at[slot]
        )

    def path_dma(slot, blk):
        return pltpu.make_async_copy(
            path_buf.at[slot], path_hbm.at[g, blk], path_sem.at[slot]
        )

    # reverse walk: iteration r processes natural block NB-1-r
    v_dma(0, NB - 1).start()
    soh_scr[:, :] = jnp.zeros_like(soh_scr)
    state_scr[:, :] = jnp.zeros_like(state_scr)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (Sp, Bg), 0)

    def body(r, _):
        blk = NB - 1 - r
        slot = jax.lax.rem(r, 2)
        nxt = jax.lax.rem(r + 1, 2)

        @pl.when(r + 1 < NB)
        def _prefetch():
            v_dma(nxt, blk - 1).start()

        v_dma(slot, blk).wait()

        @pl.when(r >= 2)
        def _drain():
            path_dma(slot, blk + 2).wait()

        for k in range(K - 1, -1, -1):      # static reverse unroll
            t = blk * K + k
            v_row = v_buf[slot, k]                          # [Sp, Bg]
            # trans[:, state] via exact one-hot gather on the MXU
            col = _v4_dot_oh(trans_ref[:, :], soh_scr[:, :])
            is_last = t == Lp - 1                           # scalar
            scores = v_row + jnp.where(is_last, 0.0, col)
            m = jnp.max(scores, axis=0, keepdims=True)
            cand = jnp.min(
                jnp.where(scores == m, iota_s, Sp),
                axis=0, keepdims=True,
            )                                               # [1, Bg]
            take = jnp.logical_or(is_last, (t + 1) < lens)
            state = jnp.where(take, cand, state_scr[0:1, :])
            state_scr[0:1, :] = state
            soh_scr[:, :] = (iota_s == state).astype(jnp.float32)
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, path_buf[slot, k].shape, 0
            )
            path_buf[slot, k] = jnp.where(
                ridx == 0,
                jnp.broadcast_to(state, path_buf[slot, k].shape),
                0,
            )
        path_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, NB, body, 0)

    @pl.when(NB >= 2)
    def _():
        path_dma(jax.lax.rem(NB - 2, 2), 1).wait()
    path_dma(jax.lax.rem(NB - 1, 2), 0).wait()


@jax.jit
def viterbi_fused_pallas_v4(
    log_start: jax.Array,
    log_trans: jax.Array,
    log_em: jax.Array,
    symbols: jax.Array,     # int32[B, L, T]
    lengths: jax.Array | None = None,
    obs_weights: jax.Array | None = None,   # f32[B, L] segment weights
    gauss_params=None,                      # models/gauss.GaussParams
    gauss_values: jax.Array | None = None,  # f32[B, L, Gn] NaN missing
) -> tuple[jax.Array, jax.Array]:
    """Fused Viterbi decode: (path int32[B, L], score f32[B]) straight
    from raw symbols.  Same max-plus op order and first-hit argmax
    tie-breaking as ops.dp.viterbi — measured zero path mismatches on
    device at S=20/64 (score rel-delta ~4e-7 from the 3-pass in-kernel
    obs; TEHMM_V4_PRECISION=highest makes the obs bit-equal too).
    Zero-length rows get path 0 / score 0 like the masked XLA
    decoder.  ``obs_weights`` (segment mode) scales the per-position
    obs log-probs exactly like the XLA path's ``obs * w``;
    ``gauss_params``/``gauss_values`` add the gaussian-track normal
    log-densities via the streamed quadratic-form dot."""
    B, L, T = symbols.shape
    S, _T2, V = log_em.shape
    lengths = (
        jnp.full((B,), L, jnp.int32) if lengths is None
        else lengths.astype(jnp.int32)
    )
    Sp = max(-(-S // 8) * 8, 8)
    # K=1 past Sp=64 bounds the max-plus row loop's stack temporaries
    # (see _maxplus_rows); K=4 at S=128 measured 17.6M scoped VMEM
    K = _KV2 if Sp <= 64 else 1
    Tp = max(-(-T // 8) * 8, 8)
    TVp = -(-(T * V) // 128) * 128
    has_gauss = gauss_params is not None and gauss_values is not None
    Gn = gauss_values.shape[-1] if has_gauss else 0
    GFp = max(-(-(3 * Gn) // 8) * 8, 8) if has_gauss else 0
    Bg = _pick_batch_group_vit4(S, T, V, B, K=K, GF=GFp)
    Bp = -(-B // Bg) * Bg
    G = Bp // Bg
    Lp = -(-L // K) * K
    NB = Lp // K

    sym_t = jnp.swapaxes(
        jnp.moveaxis(symbols.astype(jnp.int32), 1, 0), 1, 2
    )                                                    # [L, T, B]
    sym_t = jnp.pad(
        sym_t, ((0, Lp - L), (0, Tp - T), (0, Bp - B))
    )
    sym_arr = jnp.moveaxis(
        sym_t.reshape(NB, K, Tp, G, Bg), 3, 0
    )
    len_g = jnp.pad(lengths, (0, Bp - B)).reshape(G, 1, Bg)
    trans_p = jnp.pad(
        log_trans, ((0, Sp - S), (0, Sp - S)),
        constant_values=LOG_ZERO,
    )
    em_flat = jnp.pad(
        log_em.reshape(S, T * V),
        ((0, Sp - S), (0, TVp - T * V)),
    )
    if Sp > S:
        em_flat = em_flat.at[S:, :].set(-1e9)
    start_g = jnp.broadcast_to(
        jnp.pad(log_start, (0, Sp - S),
                constant_values=LOG_ZERO)[None, :, None],
        (G, Sp, Bg),
    )

    weighted = obs_weights is not None
    opt_args, opt_in_spec, opt_scratch, opt_sems = _v4_opt_streams(
        obs_weights, gauss_params if has_gauss else None,
        gauss_values if has_gauss else None,
        L, Lp, B, Bp, NB, K, G, Bg, Sp, GFp,
    )

    v_pad, dm_pad = pl.pallas_call(
        _make_viterbi_fwd_kernel_v4(T, V, weighted, has_gauss),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Sp, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, TVp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + opt_in_spec,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, NB, K, Sp, Bg), jnp.float32),
            jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, Tp, Bg), jnp.int32),
        ] + opt_scratch + [
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + opt_sems + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, start_g, trans_p, em_flat, sym_arr, *opt_args)

    path_pad = pl.pallas_call(
        _viterbi_backtrace_kernel_v4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.int32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.VMEM((8, Bg), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, trans_p, v_pad)

    # kernel layout -> [B, L] (tiny int32 tensor; the only transpose)
    path = jnp.moveaxis(
        path_pad[:, :, :, 0, :], 0, 2
    ).reshape(Lp, Bp)[:L, :B]
    path = jnp.moveaxis(path, 0, 1)                      # [B, L]
    v_last = jnp.moveaxis(v_pad[:, NB - 1, K - 1], 0, 1) \
        .reshape(Sp, Bp)[:S, :B]
    dms = jnp.moveaxis(dm_pad[:, :, :, 0, :], 0, 2).reshape(Lp, Bp)
    score = jnp.max(v_last, axis=0) + jnp.sum(dms[:L, :B], axis=0)
    score = jnp.where(lengths > 0, score, 0.0)
    path = jnp.where((lengths > 0)[:, None], path, 0)
    return path, score

# ---------------------------------------------------------------------
# v4 FUSED max-posterior decode: symbols in, argmax-gamma path out.
#
# --maxPost decoding previously paid the full XLA pipeline per chunk
# batch: a one-hot obs matmul writing [B,L,S] to HBM, forward AND
# backward scans each materializing their [B,L,S] table, then a
# posterior+argmax pass over all three.  The fused design reuses the
# v4 E-step's probability-space forward kernel (symbols stream in,
# max-normalized alpha comes out in kernel layout) and replaces the
# stats kernel with a DECODE kernel: the backward recurrence runs in
# VMEM recomputing obs from symbols, and each position emits only
# argmax_s alpha*beta as an int32 — gamma itself never exists.
# Normalizers cancel inside the per-position argmax, so the decode
# needs no dm stream at all.  Tie-breaking is first-hit lowest state
# index, matching jnp.argmax in ops/dp.posterior_scaled.
# Reference semantics: teHmmEval.py --maxPost [R].
# ---------------------------------------------------------------------


def _make_post_decode_kernel_v4(
    T: int, V: int, weighted: bool = False, gauss: bool = False
):
    def kernel(
        len_ref,        # [1, 1, Bg] int32
        trans_ref,      # [Sp, Sp] exp(log_trans) zero-padded
        em_ref,         # [Sp, TVp] log_em flat (pad rows ~-1e9)
        *rest,
    ):
        rest = list(rest)
        sym_hbm = rest.pop(0)
        w_hbm = rest.pop(0) if weighted else None
        gf_hbm = rest.pop(0) if gauss else None
        gw_ref = rest.pop(0) if gauss else None
        alpha_hbm, path_hbm = rest.pop(0), rest.pop(0)
        sym_buf = rest.pop(0)
        w_buf = rest.pop(0) if weighted else None
        gf_buf = rest.pop(0) if gauss else None
        alpha_buf, path_buf, b_scr = (
            rest.pop(0), rest.pop(0), rest.pop(0)
        )
        sym_sem = rest.pop(0)
        w_sem = rest.pop(0) if weighted else None
        gf_sem = rest.pop(0) if gauss else None
        alpha_sem, path_sem = rest.pop(0), rest.pop(0)
        g = pl.program_id(0)
        NB = sym_hbm.shape[1]
        K = sym_hbm.shape[2]
        Sp = alpha_hbm.shape[3]
        Bg = sym_hbm.shape[4]
        TVp = em_ref.shape[1]
        lens = len_ref[0, 0, :][None, :]
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (Sp, Bg), 0)

        def sym_dma(slot, blk):
            return pltpu.make_async_copy(
                sym_hbm.at[g, blk], sym_buf.at[slot], sym_sem.at[slot]
            )

        def w_dma(slot, blk):
            return pltpu.make_async_copy(
                w_hbm.at[g, blk], w_buf.at[slot], w_sem.at[slot]
            )

        def gf_dma(slot, blk):
            return pltpu.make_async_copy(
                gf_hbm.at[g, blk], gf_buf.at[slot], gf_sem.at[slot]
            )

        def alpha_dma(slot, blk):
            return pltpu.make_async_copy(
                alpha_hbm.at[g, blk], alpha_buf.at[slot],
                alpha_sem.at[slot]
            )

        def path_dma(slot, blk):
            return pltpu.make_async_copy(
                path_buf.at[slot], path_hbm.at[g, blk], path_sem.at[slot]
            )

        # reverse walk: iteration r processes natural block NB-1-r
        sym_dma(0, NB - 1).start()
        if weighted:
            w_dma(0, NB - 1).start()
        if gauss:
            gf_dma(0, NB - 1).start()
        alpha_dma(0, NB - 1).start()
        b_scr[:, :] = jnp.ones_like(b_scr)

        def body(r, _):
            blk = NB - 1 - r
            slot = jax.lax.rem(r, 2)
            nxt = jax.lax.rem(r + 1, 2)

            @pl.when(r + 1 < NB)
            def _prefetch():
                sym_dma(nxt, blk - 1).start()
                if weighted:
                    w_dma(nxt, blk - 1).start()
                if gauss:
                    gf_dma(nxt, blk - 1).start()
                alpha_dma(nxt, blk - 1).start()

            sym_dma(slot, blk).wait()
            if weighted:
                w_dma(slot, blk).wait()
            if gauss:
                gf_dma(slot, blk).wait()
            alpha_dma(slot, blk).wait()

            @pl.when(r >= 2)
            def _drain():
                path_dma(slot, blk + 2).wait()

            for k in range(K - 1, -1, -1):      # static reverse unroll
                p = blk * K + k
                oh = _oh_build(sym_buf[slot, k], T, V, TVp, Bg)
                wk = w_buf[slot, k, 0:1, :] if weighted else None
                gk = (gw_ref, gf_buf[slot, k]) if gauss else None
                obs_p, _o_m = _obs_p_from_sym(em_ref, oh, wk, gk)
                b = b_scr[:, :]
                valid_p = p < lens                          # [1, Bg]
                # ---- argmax gamma (normalizers cancel in the argmax;
                # alpha pad rows are exactly 0, so Sp > S never wins
                # unless everything is 0 — then first-hit returns 0,
                # matching the masked XLA path's padded output) ----
                ab = alpha_buf[slot, k] * b
                m = jnp.max(ab, axis=0, keepdims=True)
                cand = jnp.min(
                    jnp.where(ab == m, iota_s, Sp),
                    axis=0, keepdims=True,
                )                                           # [1, Bg]
                state = jnp.where(valid_p, cand, 0)
                ridx = jax.lax.broadcasted_iota(
                    jnp.int32, path_buf[slot, k].shape, 0
                )
                path_buf[slot, k] = jnp.where(
                    ridx == 0,
                    jnp.broadcast_to(state, path_buf[slot, k].shape),
                    0,
                )
                # ---- beta update (same recurrence as the stats
                # kernel: b_{p-1} = trans @ (obs_p * b_p), rescaled) ----
                x = obs_p * b
                xm = jnp.maximum(
                    jnp.max(x, axis=0, keepdims=True), 1e-37
                )
                s_b = _v4_dot(trans_ref[:, :], x * (1.0 / xm))
                nm = jnp.maximum(
                    jnp.max(s_b, axis=0, keepdims=True), 1e-37
                )
                b_scr[:, :] = jnp.where(valid_p, s_b * (1.0 / nm), b)
            path_dma(slot, blk).start()
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        @pl.when(NB >= 2)
        def _():
            path_dma(jax.lax.rem(NB - 2, 2), 1).wait()
        path_dma(jax.lax.rem(NB - 1, 2), 0).wait()

    return kernel


@jax.jit
def posterior_decode_fused_pallas_v4(
    log_start: jax.Array,
    log_trans: jax.Array,
    log_em: jax.Array,
    symbols: jax.Array,     # int32[B, L, T]
    lengths: jax.Array | None = None,
    obs_weights: jax.Array | None = None,   # f32[B, L] segment weights
    gauss_params=None,                      # models/gauss.GaussParams
    gauss_values: jax.Array | None = None,  # f32[B, L, Gn] NaN missing
) -> jax.Array:
    """Fused max-posterior decode: int32[B, L] argmax-gamma path
    straight from raw symbols (reference: teHmmEval.py --maxPost).

    Same per-position argmax and first-hit tie-breaking as
    argmax(dp.posterior_scaled(forward, backward)); alpha/beta come
    from the 3-pass bf16-split dots (TEHMM_V4_PRECISION=highest for
    true-f32), so only exact gamma near-ties can differ — and the
    chunked caller's boundary agreement check still guards those.
    Zero-length rows decode to path 0 like the masked XLA pipeline.
    ``obs_weights`` (segment mode) scales the per-position obs
    log-probs exactly like the XLA path's ``obs * w``;
    ``gauss_params``/``gauss_values`` add the gaussian-track normal
    log-densities via the streamed quadratic-form dot."""
    B, L, T = symbols.shape
    S, _T2, V = log_em.shape
    lengths = (
        jnp.full((B,), L, jnp.int32) if lengths is None
        else lengths.astype(jnp.int32)
    )
    K = _KV2
    Sp = max(-(-S // 8) * 8, 8)
    Tp = max(-(-T // 8) * 8, 8)
    TVp = -(-(T * V) // 128) * 128
    has_gauss = gauss_params is not None and gauss_values is not None
    Gn = gauss_values.shape[-1] if has_gauss else 0
    GFp = max(-(-(3 * Gn) // 8) * 8, 8) if has_gauss else 0
    Bg = _pick_batch_group_v4(S, T, V, B, GF=GFp)
    Bp = -(-B // Bg) * Bg
    G = Bp // Bg
    Lp = -(-L // K) * K
    NB = Lp // K

    sym_t = jnp.swapaxes(
        jnp.moveaxis(symbols.astype(jnp.int32), 1, 0), 1, 2
    )                                                    # [L, T, B]
    sym_t = jnp.pad(
        sym_t, ((0, Lp - L), (0, Tp - T), (0, Bp - B))
    )
    sym_arr = jnp.moveaxis(
        sym_t.reshape(NB, K, Tp, G, Bg), 3, 0
    )
    len_g = jnp.pad(lengths, (0, Bp - B)).reshape(G, 1, Bg)
    trans_exp = jnp.exp(log_trans)
    trans_p = jnp.pad(trans_exp, ((0, Sp - S), (0, Sp - S)))
    trans_t = jnp.pad(trans_exp.T, ((0, Sp - S), (0, Sp - S)))
    em_flat = jnp.pad(
        log_em.reshape(S, T * V),
        ((0, Sp - S), (0, TVp - T * V)),
    )
    if Sp > S:
        em_flat = em_flat.at[S:, :].set(-1e9)
    start_g = jnp.broadcast_to(
        jnp.pad(jnp.exp(log_start), (0, Sp - S))[None, :, None],
        (G, Sp, Bg),
    )

    weighted = obs_weights is not None
    opt_args, opt_in_spec, opt_scratch, opt_sems = _v4_opt_streams(
        obs_weights, gauss_params if has_gauss else None,
        gauss_values if has_gauss else None,
        L, Lp, B, Bp, NB, K, G, Bg, Sp, GFp,
    )

    alpha_pad = pl.pallas_call(
        _make_forward_kernel_v4(
            T, V, weighted, has_gauss, emit_dm=False
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, Sp, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, TVp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + opt_in_spec,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (G, NB, K, Sp, Bg), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K, Tp, Bg), jnp.int32),
        ] + opt_scratch + [
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + opt_sems + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, start_g, trans_t, em_flat, sym_arr, *opt_args)

    path_pad = pl.pallas_call(
        _make_post_decode_kernel_v4(T, V, weighted, has_gauss),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, Bg), lambda g: (g, 0, 0)),
            pl.BlockSpec((Sp, Sp), lambda g: (0, 0)),
            pl.BlockSpec((Sp, TVp), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + opt_in_spec + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, NB, K, 8, Bg), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, K, Tp, Bg), jnp.int32),
        ] + opt_scratch + [
            pltpu.VMEM((2, K, Sp, Bg), jnp.float32),
            pltpu.VMEM((2, K, 8, Bg), jnp.int32),
            pltpu.VMEM((Sp, Bg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + opt_sems + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(len_g, trans_p, em_flat, sym_arr, *opt_args, alpha_pad)

    path = jnp.moveaxis(
        path_pad[:, :, :, 0, :], 0, 2
    ).reshape(Lp, Bp)[:L, :B]
    path = jnp.moveaxis(path, 0, 1)                      # [B, L]
    return jnp.where((lengths > 0)[:, None], path, 0)
