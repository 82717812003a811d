"""Boundary-exact chunked Viterbi decoding with halo stitching.

SURVEY.md §5 "Long-context" and §7 layer 5 / hard part #2: a chromosome is
decoded as parallel fixed-size chunks, each extended by a halo on both
sides.  Each chunk's Viterbi path is computed independently (massively
parallel on the device); only the core span of each chunk is kept.  Two
neighboring chunks overlap by 2·halo around every boundary, and their
independent decodes are compared on a window centered on the boundary: if
they agree, the local path has "forgotten" the boundary conditions and
the stitched output equals the monolithic decode (tests assert equality
against monolithic Viterbi on every fixture); if any boundary disagrees,
the halo is doubled and the affected decode is retried, up to
``max_halo`` (adaptive widening).

The reference has no stitching — its chunk boundaries are hard interval
boundaries with fresh start probabilities (SURVEY.md §5), which is also
available here by decoding tables separately with halo=0.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from tehmm_tpu.models.emission import track_log_likelihoods
from tehmm_tpu.models.params import HmmParams
from tehmm_tpu.ops import dp
from tehmm_tpu.parallel.chunking import plan_chunks, batch_chunks
from tehmm_tpu.utils.common import logger


@dataclasses.dataclass
class StitchReport:
    """Diagnostics from a chunked decode."""

    n_chunks: int
    final_halo: int
    retries: int
    boundaries_checked: int
    boundaries_ok: bool



def _weight_batch(weight_arrays, chunks):
    """Per-table f32[L] weights -> the chunk batch's [n, Lc] rows
    (same planning as the symbols, via a single-column round-trip)."""
    wb = batch_chunks(
        [np.asarray(w, np.float32)[:, None] for w in weight_arrays],
        chunks,
    )
    return wb.symbols[..., 0]


def _weight_block(wmats, lo, Lc, B):
    """Ones-padded [B, Lc] weight slice starting at position ``lo``
    (padding value is inert: padded positions are length-masked)."""
    wb = np.ones((B, Lc), np.float32)
    for b, wv in enumerate(wmats):
        piece = wv[lo : lo + Lc]
        wb[b, : len(piece)] = piece
    return wb


def _decode_batch(
    params: HmmParams,
    symbols: np.ndarray,
    lengths: np.ndarray,
    rows_per_pass: int,
    weights: np.ndarray | None = None,
    gauss_params=None,
    values: np.ndarray | None = None,
) -> np.ndarray:
    """Viterbi over a chunk batch, in row groups of fixed compiled shape."""
    n, L, _T = symbols.shape
    out = np.zeros((n, L), dtype=np.int32)
    padded_rows = -(-n // rows_per_pass) * rows_per_pass
    for lo in range(0, padded_rows, rows_per_pass):
        hi = min(lo + rows_per_pass, n)
        sym = symbols[lo:hi]
        lens = lengths[lo:hi]
        w = None if weights is None else weights[lo:hi]
        v = None if values is None else values[lo:hi]
        if hi - lo < rows_per_pass:  # pad last group to the compiled shape
            pad = rows_per_pass - (hi - lo)
            sym = np.concatenate(
                [sym, np.zeros((pad,) + sym.shape[1:], sym.dtype)]
            )
            lens = np.concatenate([lens, np.zeros((pad,), lens.dtype)])
            if w is not None:
                w = np.concatenate(
                    [w, np.zeros((pad, w.shape[1]), w.dtype)]
                )
            if v is not None:
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                )
        if _use_fused_viterbi(params.log_em.shape[0]):
            # fused v4 decode: symbols in, path out — obs never
            # materializes in HBM and the backtrace runs in-kernel;
            # segment weights and gaussian-track values stream
            # alongside the symbols
            from tehmm_tpu.ops import pallas_kernels as pk

            paths, _ = pk.viterbi_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                jnp.asarray(sym), jnp.asarray(lens),
                None if w is None else jnp.asarray(w),
                gauss_params if v is not None else None,
                None if v is None else jnp.asarray(v),
            )
            out[lo:hi] = np.asarray(paths)[: hi - lo]
            continue
        obs = track_log_likelihoods(params.log_em, jnp.asarray(sym))
        if v is not None:
            from tehmm_tpu.models.gauss import gauss_log_likelihoods

            obs = obs + gauss_log_likelihoods(
                gauss_params, jnp.asarray(v)
            )
        if w is not None:
            obs = obs * jnp.asarray(w)[:, :, None]
        paths, _ = _viterbi_engine(obs.shape[-1])(
            params.log_start, params.log_trans, obs, jnp.asarray(lens)
        )
        out[lo:hi] = np.asarray(paths)[: hi - lo]
    return out


def _use_fused_viterbi(num_states: int) -> bool:
    """Gate for the symbols-in/path-out fused decode kernel
    (ops/pallas_kernels.viterbi_fused_pallas_v4).  S <= 128: past
    that the max-plus row loop's Mosaic stack temporaries exceed
    scoped VMEM at any batch-group size
    (ops/pallas_kernels._maxplus_rows note); the XLA decoder takes
    over there."""
    import jax

    return jax.default_backend() == "tpu" and num_states <= 128


def _use_fused_maxpost(num_states: int) -> bool:
    """Gate for the fused max-posterior decoder.  Unlike the Viterbi
    kernels it is matmul-based (no max-plus row loop), so it shares
    the E-step's S <= 1024 envelope."""
    import jax

    return jax.default_backend() == "tpu" and num_states <= 1024


def _viterbi_engine(num_states: int):
    """Streaming Pallas Viterbi on TPU (bit-identical paths — measured
    zero mismatches on device), XLA scan elsewhere.  Gated at S <= 128
    like the fused decoder (max-plus stack temporaries, see
    ops/pallas_kernels._maxplus_rows)."""
    import jax

    if jax.default_backend() == "tpu" and num_states <= 128:
        from tehmm_tpu.ops import pallas_kernels as pk

        return pk.viterbi_pallas_v3
    return dp.viterbi


def viterbi_chunked(
    params: HmmParams,
    tables: Sequence,
    chunk_len: int = 4096,
    halo: int = 256,
    max_halo: int = 1 << 14,
    agree_frac: float = 0.5,
    rows_per_pass: int = 512,
    strict: bool = False,
    weight_arrays: Sequence[np.ndarray] | None = None,
    gauss_params=None,
) -> tuple[list[np.ndarray], StitchReport]:
    """Decode each table's full span boundary-exactly via halo chunks.

    Args:
      tables: TrackTables (or raw [L, T] symbol arrays).
      chunk_len: core window size per chunk.
      halo: initial halo width; doubled on disagreement up to max_halo.
      agree_frac: fraction of the halo used as the agreement window.
      rows_per_pass: chunks decoded per device dispatch (fixed shape).
      strict: accepted for API compatibility; since the exact
        checkpointed fallback now covers every input (including
        segment weights), persistent disagreement can no longer
        produce inexact output, so there is nothing to raise on.
      weight_arrays: optional per-table f32[L] emission weights
        (segment mode --segLen).
      gauss_params: gaussian-track emissions (models/gauss.py); values
        come from each table's ``.values`` matrix and chunk with the
        symbols.

    Returns:
      (paths, report): one int32[L] state path per input table.
    """
    mats = [getattr(t, "symbols", t) for t in tables]
    value_arrays = None
    if gauss_params is not None:
        value_arrays = [
            np.asarray(t.values, np.float32) for t in tables
        ]
    lengths = [len(m) for m in mats]
    retries = 0

    cur_halo = min(halo, max_halo)
    while True:
        chunks = plan_chunks(lengths, chunk_len, cur_halo)
        batch = batch_chunks(mats, chunks)
        wbatch = None
        if weight_arrays is not None:
            wbatch = _weight_batch(weight_arrays, chunks)
        vbatch = None
        if value_arrays is not None:
            vbatch = batch_chunks(value_arrays, chunks).symbols
        decoded = _decode_batch(
            params, batch.symbols, batch.lengths, rows_per_pass, wbatch,
            gauss_params, vbatch,
        )

        # assemble core paths
        paths = [np.zeros(L, dtype=np.int32) for L in lengths]
        for row, c in enumerate(chunks):
            core = decoded[row, c.core_offset : c.core_offset + c.core_len]
            paths[c.table_idx][c.core_start : c.core_end] = core

        # agreement check at every internal boundary
        w = max(1, int(cur_halo * agree_frac))
        n_checked = 0
        ok = True
        for (ra, a), (rb, b) in zip(
            enumerate(chunks[:-1]), list(enumerate(chunks))[1:]
        ):
            if a.table_idx != b.table_idx:
                continue
            x = a.core_end  # == b.core_start
            lo = max(x - w, a.load_start, b.load_start)
            hi = min(x + w, a.load_end, b.load_end)
            if lo >= hi:
                continue
            seg_a = decoded[ra, lo - a.load_start : hi - a.load_start]
            seg_b = decoded[rb, lo - b.load_start : hi - b.load_start]
            n_checked += 1
            if not np.array_equal(seg_a, seg_b):
                ok = False
                break

        if ok or cur_halo >= max_halo:
            if not ok:
                # halo forgetting never kicked in (adversarial/near-tie
                # model): fall back to the EXACT checkpointed decoder —
                # sequential over chunks but guaranteed == monolithic
                logger.warning(
                    "viterbi_chunked: boundary disagreement persists at "
                    "max_halo=%d; falling back to the exact checkpointed "
                    "decoder", max_halo,
                )
                paths = viterbi_exact(
                    params, tables, chunk_len,
                    gauss_params=gauss_params,
                    weight_arrays=weight_arrays,
                )
                ok = True
            report = StitchReport(
                n_chunks=len(chunks),
                final_halo=cur_halo,
                retries=retries,
                boundaries_checked=n_checked,
                boundaries_ok=ok,
            )
            return paths, report

        retries += 1
        cur_halo = min(cur_halo * 2, max_halo)
        logger.info(
            "viterbi_chunked: widening halo to %d (retry %d)",
            cur_halo, retries,
        )


def posterior_chunked(
    params: HmmParams,
    tables: Sequence,
    chunk_len: int = 1 << 14,
    halo: int = 256,
    max_halo: int = 1 << 14,
    agree_frac: float = 0.5,
    rows_per_pass: int = 64,
    strict: bool = False,
    gauss_params=None,
    weight_arrays: Sequence[np.ndarray] | None = None,
) -> tuple[list[np.ndarray], StitchReport]:
    """Max-posterior decoding with the same boundary guarantees as
    viterbi_chunked: halo chunks, per-boundary agreement check, adaptive
    halo widening, and an EXACT carried-alpha/beta fallback when
    agreement cannot be reached (reference: teHmmEval.py --maxPost;
    SURVEY.md §2b).  Returns one int32[L] argmax-gamma path per table."""
    mats = [getattr(t, "symbols", t) for t in tables]
    value_arrays = None
    if gauss_params is not None:
        value_arrays = [
            np.asarray(t.values, np.float32) for t in tables
        ]
    lengths = [len(m) for m in mats]
    retries = 0

    cur_halo = min(halo, max_halo)
    while True:
        chunks = plan_chunks(lengths, chunk_len, cur_halo)
        batch = batch_chunks(mats, chunks)
        vbatch = None
        if value_arrays is not None:
            vbatch = batch_chunks(value_arrays, chunks).symbols
        wbatch = None
        if weight_arrays is not None:
            wbatch = _weight_batch(weight_arrays, chunks)
        decoded = _posterior_batch(
            params, batch.symbols, batch.lengths, rows_per_pass,
            gauss_params, vbatch, wbatch,
        )

        paths = [np.zeros(L, dtype=np.int32) for L in lengths]
        for row, c in enumerate(chunks):
            core = decoded[row, c.core_offset : c.core_offset + c.core_len]
            paths[c.table_idx][c.core_start : c.core_end] = core

        w = max(1, int(cur_halo * agree_frac))
        n_checked = 0
        ok = True
        for (ra, a), (rb, b) in zip(
            enumerate(chunks[:-1]), list(enumerate(chunks))[1:]
        ):
            if a.table_idx != b.table_idx:
                continue
            x = a.core_end
            lo = max(x - w, a.load_start, b.load_start)
            hi = min(x + w, a.load_end, b.load_end)
            if lo >= hi:
                continue
            seg_a = decoded[ra, lo - a.load_start : hi - a.load_start]
            seg_b = decoded[rb, lo - b.load_start : hi - b.load_start]
            n_checked += 1
            if not np.array_equal(seg_a, seg_b):
                ok = False
                break

        if ok or cur_halo >= max_halo:
            if not ok:
                logger.warning(
                    "posterior_chunked: boundary disagreement persists "
                    "at max_halo=%d; falling back to the exact carried-"
                    "alpha/beta decoder", max_halo,
                )
                paths = posterior_exact(
                    params, tables, chunk_len,
                    gauss_params=gauss_params,
                    weight_arrays=weight_arrays,
                )
                ok = True
            report = StitchReport(
                n_chunks=len(chunks),
                final_halo=cur_halo,
                retries=retries,
                boundaries_checked=n_checked,
                boundaries_ok=ok,
            )
            return paths, report

        retries += 1
        cur_halo = min(cur_halo * 2, max_halo)
        logger.info(
            "posterior_chunked: widening halo to %d (retry %d)",
            cur_halo, retries,
        )


def _posterior_batch(
    params: HmmParams,
    symbols: np.ndarray,
    lengths: np.ndarray,
    rows_per_pass: int,
    gauss_params=None,
    values: np.ndarray | None = None,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """argmax-gamma over a chunk batch in fixed-shape row groups."""
    n, L, _T = symbols.shape
    out = np.zeros((n, L), dtype=np.int32)
    padded_rows = -(-n // rows_per_pass) * rows_per_pass
    for lo in range(0, padded_rows, rows_per_pass):
        hi = min(lo + rows_per_pass, n)
        sym = symbols[lo:hi]
        lens = lengths[lo:hi]
        v = None if values is None else values[lo:hi]
        w = None if weights is None else weights[lo:hi]
        if hi - lo < rows_per_pass:
            pad = rows_per_pass - (hi - lo)
            sym = np.concatenate(
                [sym, np.zeros((pad,) + sym.shape[1:], sym.dtype)]
            )
            lens = np.concatenate([lens, np.zeros((pad,), lens.dtype)])
            if v is not None:
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                )
            if w is not None:
                w = np.concatenate(
                    [w, np.zeros((pad, w.shape[1]), w.dtype)]
                )
        if _use_fused_maxpost(params.log_em.shape[0]):
            # fused v4 maxPost: symbols in, argmax-gamma path out —
            # obs/alpha/beta tables never materialize as [B,L,S] in HBM;
            # segment weights and gaussian values stream alongside
            from tehmm_tpu.ops import pallas_kernels as pk

            states = pk.posterior_decode_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                jnp.asarray(sym), jnp.asarray(lens),
                None if w is None else jnp.asarray(w),
                gauss_params if v is not None else None,
                None if v is None else jnp.asarray(v),
            )
            out[lo:hi] = np.asarray(states)[: hi - lo]
            continue
        obs = track_log_likelihoods(params.log_em, jnp.asarray(sym))
        if v is not None:
            from tehmm_tpu.models.gauss import gauss_log_likelihoods

            obs = obs + gauss_log_likelihoods(
                gauss_params, jnp.asarray(v)
            )
        if w is not None:
            obs = obs * jnp.asarray(w)[:, :, None]
        jl = jnp.asarray(lens)
        ah, _, _ = dp.forward_scaled(
            params.log_start, params.log_trans, obs, jl
        )
        bh, _ = dp.backward_scaled(params.log_trans, obs, jl)
        states = jnp.argmax(dp.posterior_scaled(ah, bh), axis=-1)
        out[lo:hi] = np.asarray(states)[: hi - lo]
    return out


def posterior_sweep(
    params: HmmParams,
    tables: Sequence,
    chunk_len: int = 1 << 14,
    consume=None,
    gauss_params=None,
    weight_arrays: Sequence[np.ndarray] | None = None,
) -> list[np.ndarray]:
    """EXACT chunked posterior machinery (carried alpha forward sweep +
    carried beta backward sweep, per-chunk recompute; SURVEY.md §7 hard
    part #3).  Device memory is bounded by one chunk; the op sequence
    matches the monolithic scans so gamma — and its argmax — is
    bit-identical to a whole-table pass.

    ``consume(table_idx, start, gamma_chunk)`` is called for every chunk
    in REVERSE time order with gamma f32[valid, S]; the default consumer
    collects argmax paths.  Returns the argmax paths list."""
    mats = [np.ascontiguousarray(getattr(t, "symbols", t)) for t in tables]
    vmats = None
    if gauss_params is not None:
        vmats = [np.asarray(t.values, np.float32) for t in tables]
    wmats = None
    if weight_arrays is not None:
        wmats = [np.asarray(w, np.float32) for w in weight_arrays]
    B = len(mats)
    true_lens = np.asarray([len(m) for m in mats], np.int64)
    T = mats[0].shape[1]
    Lb = int(true_lens.max()) - 1          # body = positions 1..L-1
    Lc = min(chunk_len, max(Lb, 1))
    n_chunks = max(0, -(-Lb // Lc))

    def _gauss_block(lo):
        if vmats is None:
            return None
        G = vmats[0].shape[1]
        vb = np.zeros((B, Lc, G), np.float32)
        for b, v in enumerate(vmats):
            piece = v[lo : lo + Lc]
            vb[b, : len(piece)] = piece
        return vb

    def obs_chunk(c):
        lo = 1 + c * Lc
        block = np.zeros((B, Lc, T), dtype=mats[0].dtype)
        for b, m in enumerate(mats):
            piece = m[lo : lo + Lc]
            block[b, : len(piece)] = piece
        obs = track_log_likelihoods(params.log_em, jnp.asarray(block))
        vb = _gauss_block(lo)
        if vb is not None:
            from tehmm_tpu.models.gauss import gauss_log_likelihoods

            obs = obs + gauss_log_likelihoods(
                gauss_params, jnp.asarray(vb)
            )
        if wmats is not None:
            obs = obs * jnp.asarray(
                _weight_block(wmats, lo, Lc, B)
            )[:, :, None]
        lens = jnp.asarray(np.clip(true_lens - lo, 0, Lc))
        return obs, lens

    # position 0 values
    block0 = np.stack([m[0] for m in mats])
    obs0 = track_log_likelihoods(
        params.log_em, jnp.asarray(block0[:, None, :])
    )[:, 0, :]
    if vmats is not None:
        from tehmm_tpu.models.gauss import gauss_log_likelihoods

        v0 = np.stack([v[0] for v in vmats])
        obs0 = obs0 + gauss_log_likelihoods(
            gauss_params, jnp.asarray(v0[:, None, :])
        )[:, 0, :]
    if wmats is not None:
        w0 = np.stack([wv[0] for wv in wmats])
        obs0 = obs0 * jnp.asarray(w0)[:, None]
    a0 = params.log_start[None, :] + obs0
    m0 = jnp.maximum(jnp.max(a0, axis=-1, keepdims=True), -1e30)
    carry = a0 - m0

    # ---- forward sweep: store the carry entering each chunk ----
    entry_carries = []
    for c in range(n_chunks):
        entry_carries.append(carry)
        obs, lens = obs_chunk(c)
        _, carry = dp.forward_chunk_values(
            params.log_trans, obs, carry, lens
        )

    paths = [np.zeros(L, np.int32) for L in map(int, true_lens)]

    def default_consume(b, start, gamma):
        paths[b][start : start + len(gamma)] = np.argmax(gamma, axis=-1)

    consume = consume or default_consume

    # ---- backward sweep with per-chunk gamma ----
    S = params.num_states
    x_carry = jnp.zeros((B, S), jnp.float32)
    for c in reversed(range(n_chunks)):
        obs, lens = obs_chunk(c)
        lo = 1 + c * Lc
        continuing = jnp.asarray(true_lens > lo + Lc)
        a_hats, _ = dp.forward_chunk_values(
            params.log_trans, obs, entry_carries[c], lens
        )
        b_hats, x_carry = dp.backward_chunk_values(
            params.log_trans, obs, x_carry, continuing, lens
        )
        gamma = np.asarray(dp.posterior_scaled(a_hats, b_hats))
        lens_np = np.asarray(lens)
        for b in range(B):
            n_valid = int(lens_np[b])
            if n_valid > 0:
                consume(b, lo, gamma[b, :n_valid])

    # ---- position 0: gamma from a0 and the final x_carry ----
    # beta at position 0 = logdot(x_carry, T^T) for rows longer than 1
    beta0 = dp.backward_chunk_values(
        params.log_trans,
        jnp.asarray(obs0[:, None, :]) * 0.0,  # obs row unused at Lc=1
        x_carry,
        jnp.asarray(true_lens > 1),
        jnp.asarray(np.ones(B, np.int64)),
    )[0][:, 0, :]
    gamma0 = np.asarray(dp.posterior_scaled(a0 - m0, beta0))
    for b in range(B):
        if true_lens[b] > 0:
            consume(b, 0, gamma0[b : b + 1])
    return paths


def posterior_exact(
    params: HmmParams,
    tables: Sequence,
    chunk_len: int = 1 << 14,
    gauss_params=None,
    weight_arrays: Sequence[np.ndarray] | None = None,
) -> list[np.ndarray]:
    """Exact max-posterior paths (argmax of the bit-exact chunked gamma)."""
    return posterior_sweep(
        params, tables, chunk_len, gauss_params=gauss_params,
        weight_arrays=weight_arrays,
    )


def viterbi_exact(
    params: HmmParams,
    tables: Sequence,
    chunk_len: int = 1 << 14,
    gauss_params=None,
    weight_arrays: Sequence[np.ndarray] | None = None,
) -> list[np.ndarray]:
    """EXACT chunked Viterbi via checkpointed carries (SURVEY.md §7 hard
    part #3): a cheap forward sweep stores only the O(S) carry at every
    chunk boundary; the backtrace sweep recomputes each chunk's value
    rows from its stored carry and walks the optimal path backwards
    through it.  Bit-identical to the monolithic decode for ANY model
    (no halo/forgetting assumption), with device memory bounded by one
    chunk.  Sequential over chunks within a sequence, batched across
    sequences; used as the fallback when halo stitching cannot reach
    agreement, and directly for adversarial models.
    """
    mats = [np.ascontiguousarray(getattr(t, "symbols", t)) for t in tables]
    vmats = None
    if gauss_params is not None:
        vmats = [np.asarray(t.values, np.float32) for t in tables]
    wmats = None
    if weight_arrays is not None:
        wmats = [np.asarray(w, np.float32) for w in weight_arrays]
    B = len(mats)
    true_lens = np.asarray([len(m) for m in mats], np.int64)
    T = mats[0].shape[1]
    Lb = int(true_lens.max()) - 1          # body = positions 1..L-1
    Lc = min(chunk_len, max(Lb, 1))
    n_chunks = max(0, -(-Lb // Lc))

    def obs_chunk(c):
        """obs for body positions [1 + c*Lc, 1 + (c+1)*Lc) padded."""
        lo = 1 + c * Lc
        block = np.zeros((B, Lc, T), dtype=mats[0].dtype)
        for b, m in enumerate(mats):
            piece = m[lo : lo + Lc]
            block[b, : len(piece)] = piece
        obs = track_log_likelihoods(
            params.log_em, jnp.asarray(block)
        )
        if vmats is not None:
            from tehmm_tpu.models.gauss import gauss_log_likelihoods

            G = vmats[0].shape[1]
            vb = np.zeros((B, Lc, G), np.float32)
            for b, v in enumerate(vmats):
                piece = v[lo : lo + Lc]
                vb[b, : len(piece)] = piece
            obs = obs + gauss_log_likelihoods(
                gauss_params, jnp.asarray(vb)
            )
        if wmats is not None:
            obs = obs * jnp.asarray(
                _weight_block(wmats, lo, Lc, B)
            )[:, :, None]
        lens = jnp.asarray(np.clip(true_lens - lo, 0, Lc))
        return obs, lens

    # position 0 values
    block0 = np.stack([m[0] for m in mats])
    obs0 = track_log_likelihoods(
        params.log_em, jnp.asarray(block0[:, None, :])
    )[:, 0, :]
    if vmats is not None:
        from tehmm_tpu.models.gauss import gauss_log_likelihoods

        v0 = np.stack([v[0] for v in vmats])
        obs0 = obs0 + gauss_log_likelihoods(
            gauss_params, jnp.asarray(v0[:, None, :])
        )[:, 0, :]
    if wmats is not None:
        w0 = np.stack([wv[0] for wv in wmats])
        obs0 = obs0 * jnp.asarray(w0)[:, None]
    v0 = params.log_start[None, :] + obs0
    m0 = jnp.maximum(jnp.max(v0, axis=-1, keepdims=True), -1e30)
    carry = v0 - m0

    # ---- forward sweep: store the carry entering each chunk ----
    entry_carries = []
    for c in range(n_chunks):
        entry_carries.append(carry)
        obs, lens = obs_chunk(c)
        carry = dp.viterbi_carry(params.log_trans, obs, carry, lens)

    # ---- backtrace sweep (streaming kernel on TPU, XLA elsewhere) ----
    import jax as _jax

    if _jax.default_backend() == "tpu" and params.num_states <= 128:
        from tehmm_tpu.ops.pallas_kernels import (
            viterbi_chunk_values_pallas as _chunk_values,
        )
    else:
        _chunk_values = dp.viterbi_chunk_values
    end_state = jnp.argmax(carry, axis=-1).astype(jnp.int32)
    paths = np.zeros((B, int(true_lens.max())), np.int32)
    for c in reversed(range(n_chunks)):
        obs, lens = obs_chunk(c)
        v_hats = _chunk_values(
            params.log_trans, obs, entry_carries[c], lens
        )
        chunk_path, end_state = dp.viterbi_backtrace_chunk(
            params.log_trans, v_hats, entry_carries[c], end_state, lens
        )
        lo = 1 + c * Lc
        cp = np.asarray(chunk_path)
        for b in range(B):
            hi = min(lo + Lc, int(true_lens[b]))
            if hi > lo:
                paths[b, lo:hi] = cp[b, : hi - lo]
    paths[:, 0] = np.asarray(end_state)
    return [paths[b, : int(true_lens[b])].copy() for b in range(B)]
