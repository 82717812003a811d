"""State-axis (tensor-parallel) sharding for very large state counts.

SURVEY.md §2c "Tensor/model parallel (TP)": an optional second mesh axis
shards the S dimension of the S×S transition contraction.  For the
reference's model sizes (S ≤ 64) replicated parameters are faster — this
path exists for scaled-up models (S in the hundreds-plus, e.g. one state
per TE family) where the [S,S] matmul and its exp/log neighborhood
dominate and no longer fit comfortably per-chip.

Design: on a ``(data, state)`` mesh each device holds the column block
``log_trans[:, j0:j1]`` and computes its slice of every forward step;
the next step needs the full alpha vector, reassembled with one
``all_gather`` over the state axis per step (rides ICI).  The emission
table shards the same way over V·T columns for the obs matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tehmm_tpu.parallel.mesh import DATA_AXIS, STATE_AXIS
from tehmm_tpu.utils.common import LOG_ZERO


def _fwd_local(log_start, log_trans_cols, obs_cols, lengths):
    """Per-device forward: owns obs/trans column block [.., S_loc].

    alpha is reassembled to full S each step via all_gather over the
    state axis; the per-step normalizer uses the global max (psum-style
    max over the axis).
    """
    B, L, S_loc = obs_cols.shape
    obs_t = jnp.moveaxis(obs_cols, 1, 0)
    trans_exp_cols = jnp.exp(log_trans_cols)        # [S, S_loc]

    # log_start arrives replicated (full [S]); take this shard's block
    idx = jax.lax.axis_index(STATE_AXIS)
    s0 = jax.lax.dynamic_slice_in_dim(
        log_start, idx * S_loc, S_loc, axis=0
    )
    a0 = s0[None, :] + obs_t[0]                     # [B, S_loc]
    m0 = jax.lax.pmax(
        jnp.maximum(jnp.max(a0, axis=-1), LOG_ZERO), STATE_AXIS
    )
    a0_hat = a0 - m0[:, None]

    def step(carry, xs):
        a_hat_loc = carry                           # [B, S_loc]
        obs_row, t = xs
        a_full = jax.lax.all_gather(
            a_hat_loc, STATE_AXIS, axis=1, tiled=True
        )                                           # [B, S]
        p = jnp.exp(a_full)
        s = jnp.dot(p, trans_exp_cols,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        new = jnp.where(s > 0, jnp.log(s), LOG_ZERO) + obs_row
        m = jax.lax.pmax(
            jnp.maximum(jnp.max(new, axis=-1), LOG_ZERO), STATE_AXIS
        )
        new_hat = new - m[:, None]
        valid = t < lengths
        new_hat = jnp.where(valid[:, None], new_hat, a_hat_loc)
        dm = jnp.where(valid, m, 0.0)
        return new_hat, dm

    ts = jnp.arange(1, L)
    final_hat, dms = jax.lax.scan(step, a0_hat, (obs_t[1:], ts))
    # loglik: global LSE over the final alpha
    loc = jnp.sum(jnp.exp(final_hat), axis=-1)
    tot = jax.lax.psum(loc, STATE_AXIS)
    loglik = jnp.log(tot) + m0 + jnp.sum(dms, axis=0)
    # reduce over data axis handled by caller
    return loglik


@partial(jax.jit, static_argnames=("mesh",))
def forward_loglik_state_sharded(
    log_start: jax.Array,
    log_trans: jax.Array,
    obs: jax.Array,
    lengths: jax.Array,
    mesh: jax.sharding.Mesh,
) -> jax.Array:
    """Total log-likelihood with obs/params sharded over (data, state).

    Args:
      obs: f32[B, L, S]; B divides the data-axis size, S the state-axis
        size.

    Returns loglik[B] (replicated).
    """
    def local(log_start, log_trans_cols, obs_cols, lengths):
        return _fwd_local(log_start, log_trans_cols, obs_cols, lengths)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),                          # log_start replicated
            P(None, STATE_AXIS),          # trans column blocks
            P(DATA_AXIS, None, STATE_AXIS),
            P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS),
    )
    return fn(log_start, log_trans, obs, lengths)
