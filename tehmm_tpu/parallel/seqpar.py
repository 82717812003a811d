"""Exact cross-device sequence-parallel forward (round-5).

SURVEY.md §2c SP/CP row names the associative operator composition "the
basis for multi-chip sequence parallelism"; this module delivers that
promise as a production path: ONE long sequence is split into D
contiguous chunks sharded over the data mesh axis, each device reduces
its chunk to a single S×S forward operator

    A_d = a_{t0} ⊗ a_{t0+1} ⊗ ... ⊗ a_{t1}     (log-matmul-exp)

by a LOCAL sequential scan (L/D steps instead of L), the D small
operators are all_gather'ed (S² floats per device — one tiny
collective), and every device composes them in order.  The result is
the EXACT forward log-likelihood — no halo, no agreement heuristic —
with wall-clock ≈ (L/D) × step-latency: a D× latency win for the
few-long-chromosomes regime where the batch dimension cannot hide the
sequential scan (ops/assoc.py module docstring; Särkkä &
García-Fernández 2021, PAPERS.md).

Cost trade-off: each operator-composition step is an S×S ⊗ S×S product
(S× the FLOPs of the vector step), so per-chip THROUGHPUT is lower
than the sequential vector scan — use this when latency of one long
sequence bounds the run, not for wide chunk batches (bench:
tools/bench_assoc.py; BASELINE.md round-5 table).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tehmm_tpu.ops.assoc import _log_matmul_exp
from tehmm_tpu.parallel.mesh import DATA_AXIS
from tehmm_tpu.utils.common import LOG_ZERO


def _chunk_operator(log_trans, obs_chunk, valid):
    """Compose one chunk's per-step operators a_t = trans + obs_t
    sequentially: f32[Lc, S] (+ bool[Lc] valid mask) -> f32[S, S].
    Invalid (padded) steps compose the identity."""
    S = log_trans.shape[0]
    eye = jnp.where(
        jnp.eye(S, dtype=bool), 0.0, LOG_ZERO
    ).astype(jnp.float32)

    def step(M, xs):
        o, v = xs
        a_t = log_trans + o[None, :]
        a_t = jnp.where(v, a_t, eye)
        return _log_matmul_exp(M, a_t), None

    M0 = eye
    M, _ = jax.lax.scan(
        step, M0, (obs_chunk, valid), unroll=4
    )
    return M


@partial(jax.jit, static_argnames=("mesh",))
def forward_loglik_seqpar(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    length,
    mesh: jax.sharding.Mesh,
) -> jax.Array:
    """Exact forward log-likelihood of ONE sequence, parallel over the
    data mesh axis.

    Args:
      obs: f32[L, S] observation log-likelihoods, L divisible by the
        mesh's data-axis size (pad with anything; masked via length).
      length: true sequence length (int; 0 -> loglik 0).

    Equals ``dp.forward_scaled``'s loglik on the same obs within f32
    tolerance (different but fixed reduction order).
    """
    L, S = obs.shape
    D = int(np.prod(list(mesh.shape.values())))
    Lc = L // D
    length = jnp.asarray(length, jnp.int32)

    obs_sharded = obs.reshape(D, Lc, S)

    def local(obs_loc):
        obs_c = obs_loc[0]                          # [Lc, S]
        d = jax.lax.axis_index(DATA_AXIS)
        pos = d * Lc + jnp.arange(Lc, dtype=jnp.int32)
        # position 0 folds log_start into the first operator: rows of
        # a_0 are identical (start + obs_0), so seed the composition
        # with start on device 0 by treating a_0's "transition" as
        # start broadcast over rows
        valid = pos < length
        first = pos == 0
        o = obs_c
        a_rows = jnp.where(
            first[:, None, None],
            jnp.broadcast_to(
                log_start[None, None, :], (Lc, S, S)
            ),
            log_trans[None, :, :],
        )
        eyeS = jnp.where(
            jnp.eye(S, dtype=bool), 0.0, LOG_ZERO
        ).astype(jnp.float32)

        def step(M, xs):
            a_base, o_t, v = xs
            a_t = jnp.where(v, a_base + o_t[None, :], eyeS)
            return _log_matmul_exp(M, a_t), None

        M, _ = jax.lax.scan(
            step, eyeS, (a_rows, o, valid), unroll=4
        )
        ops = jax.lax.all_gather(M, DATA_AXIS)      # [D, S, S]

        def compose(carry, A):
            return _log_matmul_exp(carry, A), None

        total, _ = jax.lax.scan(compose, eyeS, ops)
        # total[i, :] = start-seeded forward row for any i (a_0's rows
        # are identical); alpha_L = total[0]
        alpha = total[0]
        m = jnp.maximum(jnp.max(alpha), LOG_ZERO)
        ll = jnp.log(jnp.sum(jnp.exp(alpha - m))) + m
        return jnp.where(length > 0, ll, 0.0)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(),
        check_vma=False,
    )
    return fn(obs_sharded)


def score_table_seqpar(params, table, mesh, gauss_params=None) -> float:
    """Exact log-likelihood of one TrackTable (or raw [L, T] symbol
    array) via the sequence-parallel forward.  Host-side convenience:
    builds obs, pads L to the mesh size, dispatches."""
    from tehmm_tpu.models.emission import track_log_likelihoods

    sym = getattr(table, "symbols", table)
    L = len(sym)
    D = int(np.prod(list(mesh.shape.values())))
    if L == 0:
        return 0.0
    Lp = -(-L // D) * D
    block = np.zeros((Lp,) + sym.shape[1:], sym.dtype)
    block[:L] = sym
    obs = track_log_likelihoods(
        params.log_em, jnp.asarray(block[None])
    )[0]
    values = getattr(table, "values", None)
    if gauss_params is not None and values is not None:
        from tehmm_tpu.models.gauss import gauss_log_likelihoods

        vb = np.zeros((Lp, values.shape[1]), np.float32)
        vb[:L] = values
        obs = obs + gauss_log_likelihoods(
            gauss_params, jnp.asarray(vb[None])
        )[0]
    return float(
        forward_loglik_seqpar(
            params.log_start, params.log_trans, obs, L, mesh
        )
    )
