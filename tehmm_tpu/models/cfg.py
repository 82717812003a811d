"""MultitrackCfg: restricted stochastic context-free grammar over tracks.

Rebuild of the reference's CFG layer (reference: cfg.py `MultitrackCfg`
with `pairStates`, emission.py `PairEmissionModel`; SURVEY.md §2a): a
restricted SCFG generalizing the multi-track HMM so *paired elements*
(e.g. the two LTR ends of a retrotransposon, or TSD copies) can be
modeled with matched, nested left/right emissions.  With no pair states
the grammar reduces exactly to the HMM (tested — the reference's own
equivalence test pattern, SURVEY.md §4).

Grammar (this rebuild's documented contract; the reference mount was
empty at survey time so the rule set is reconstructed [R?]):

  every state s:        s(i, j) -> x_i  s'(i+1, j)        left emission +
                                                          transition s->s'
  pair state p:         p(i, j) -> x_i  s'(i+1, j-1) x_j  joint pair
                                                          emission at both
                                                          ends + transition
  every state s:        s(i, i) -> x_i                    terminal

Scores are log-space; the single-position emission table is the HMM's
``log_em``; the pair emission adds the two end emissions plus a per-state
match bonus applied per track when the two ends carry the same symbol
(reference: PairEmissionModel "match/mismatch weighting").

DP: CYK over span diagonals d = j - i, each diagonal a [L-d, S] tensor
updated from the previous one (HMM-shaped max-plus/LSE batched matvec —
the same MXU pattern as ops/dp.py), under ``jax.lax.scan`` with a
fixed-width carry.  Complexity O(L · D · S²) with D = --maxSpan (TE
elements are bounded; full-triangle O(L²) available with D = L).

Viterbi traceback runs host-side over the device-computed argmax tables
(rule choice + next state per cell).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from tehmm_tpu.models.params import HmmParams
from tehmm_tpu.utils.common import LOG_ZERO


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CfgParams:
    """HMM parameters + pair-state extension.

    hmm:        the underlying HmmParams (log_start/log_trans/log_em).
    pair_mask:  bool[S] — True where the state is a pair state.
    log_match:  f32[S] per-track bonus added per track whose symbols at
                the two ends agree (0 for non-pair states).
    """

    hmm: HmmParams
    pair_mask: jax.Array
    log_match: jax.Array


def make_cfg_params(
    hmm: HmmParams,
    pair_states: list[int],
    match_bonus: float = 0.0,
) -> CfgParams:
    S = hmm.num_states
    mask = np.zeros(S, bool)
    for s in pair_states:
        mask[s] = True
    bonus = np.where(mask, np.float32(match_bonus), 0.0).astype(np.float32)
    return CfgParams(
        hmm=hmm,
        pair_mask=jnp.asarray(mask),
        log_match=jnp.asarray(bonus),
    )


def _pair_emission(
    params: CfgParams, obs: jax.Array, symbols: jax.Array,
    i: jax.Array, j: jax.Array,
) -> jax.Array:
    """log P(x_i, x_j | pair state) for all states: emission at both ends
    plus per-track match bonus (broadcast over the diagonal)."""
    em_i = obs[i]                                   # [n, S]
    em_j = obs[j]
    same = (symbols[i] == symbols[j])               # [n, T]
    n_match = jnp.sum(same, axis=-1).astype(jnp.float32)  # [n]
    return em_i + em_j + n_match[:, None] * params.log_match[None, :]


@partial(jax.jit, static_argnames=("max_span",))
def cfg_viterbi_chart(
    params: CfgParams,
    obs: jax.Array,       # [L, S] single-position log-likelihoods
    symbols: jax.Array,   # [L, T]
    max_span: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build the CYK Viterbi chart.

    Returns:
      scores:  f32[D, L, S]  best score of span [i, i+d] rooted at s
      ptr_s:   int32[D, L, S] best next state s'
      ptr_r:   int32[D, L, S] rule: 0 = left-emit, 1 = pair-emit
      (d indexes span length-1; entries beyond the sequence are LOG_ZERO)
    """
    L, S = obs.shape
    D = min(max_span, L)
    log_trans = params.hmm.log_trans
    neg = jnp.full((L, S), LOG_ZERO, obs.dtype)

    # d = 0 diagonal: terminal rule
    diag0 = obs                                            # [L, S]
    idx = jnp.arange(L)

    def step(carry, d):
        prev, prev2 = carry                                # [L,S] each
        # --- rule 0: s -> x_i s'(i+1, i+d) ---
        # child value at start i+1, span d-1: prev[i+1]
        child = jnp.concatenate([prev[1:], neg[:1]], axis=0)   # [L,S]
        cand = child[:, None, :] + log_trans[None, :, :]       # [L,S,S] (i, s, s')
        r0_best = jnp.max(cand, axis=-1) + obs                 # [L,S]
        r0_ptr = jnp.argmax(cand, axis=-1)
        # --- rule 1 (pair states): p -> x_i s'(i+1, i+d-1) x_{i+d} ---
        child2 = jnp.concatenate([prev2[1:], neg[:1]], axis=0) # start i+1, span d-2
        cand2 = child2[:, None, :] + log_trans[None, :, :]
        j_idx = jnp.minimum(idx + d, L - 1)
        pair_em = _pair_emission(params, obs, symbols, idx, j_idx)
        r1_best = jnp.max(cand2, axis=-1) + pair_em            # [L,S]
        r1_ptr = jnp.argmax(cand2, axis=-1)
        r1_best = jnp.where(params.pair_mask[None, :], r1_best, LOG_ZERO)
        # d == 1 pair would need an empty inner span; disallow (pairs
        # must enclose at least one position)
        r1_best = jnp.where(d >= 2, r1_best, LOG_ZERO)

        use_pair = r1_best > r0_best
        best = jnp.where(use_pair, r1_best, r0_best)
        pdt = jnp.uint8 if S <= 255 else jnp.int32  # chart memory: D·L·S
        ptr_s = jnp.where(use_pair, r1_ptr, r0_ptr).astype(pdt)
        ptr_r = use_pair.astype(jnp.uint8)
        # mask spans that run off the end: start i valid iff i + d < L
        valid = (idx + d < L)[:, None]
        best = jnp.where(valid, best, LOG_ZERO)
        return (best, prev), (best, ptr_s, ptr_r)

    ds = jnp.arange(1, D)
    (_, _), (scores, ptr_s, ptr_r) = jax.lax.scan(
        step, (diag0, neg), ds
    )
    scores = jnp.concatenate([diag0[None], scores], axis=0)
    ptr_s = jnp.concatenate(
        [jnp.zeros((1, L, S), ptr_s.dtype), ptr_s], axis=0
    )
    ptr_r = jnp.concatenate(
        [jnp.zeros((1, L, S), ptr_r.dtype), ptr_r], axis=0
    )
    return scores, ptr_s, ptr_r


@partial(jax.jit, static_argnames=("max_span",))
def cfg_inside_loglik(
    params: CfgParams,
    obs: jax.Array,
    symbols: jax.Array,
    max_span: int,
) -> jax.Array:
    """Inside algorithm (LSE instead of max) -> total log-likelihood of
    the whole sequence spanning [0, L-1] from the start distribution.
    Requires max_span >= L to cover the root span."""
    L, S = obs.shape
    D = min(max_span, L)
    log_trans = params.hmm.log_trans
    neg = jnp.full((L, S), LOG_ZERO, obs.dtype)
    idx = jnp.arange(L)

    def lse(x, axis):
        m = jnp.maximum(jnp.max(x, axis=axis, keepdims=True), LOG_ZERO)
        out = jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))
        return out + jnp.squeeze(m, axis)

    def step(carry, d):
        prev, prev2 = carry
        child = jnp.concatenate([prev[1:], neg[:1]], axis=0)
        r0 = lse(child[:, None, :] + log_trans[None, :, :], -1) + obs
        child2 = jnp.concatenate([prev2[1:], neg[:1]], axis=0)
        j_idx = jnp.minimum(idx + d, L - 1)
        pair_em = _pair_emission(params, obs, symbols, idx, j_idx)
        r1 = lse(child2[:, None, :] + log_trans[None, :, :], -1) + pair_em
        r1 = jnp.where(params.pair_mask[None, :], r1, LOG_ZERO)
        r1 = jnp.where(d >= 2, r1, LOG_ZERO)
        both = jnp.stack([r0, r1], axis=0)
        best = lse(both, 0)
        valid = (idx + d < L)[:, None]
        best = jnp.where(valid, best, LOG_ZERO)
        return (best, prev), None

    ds = jnp.arange(1, D)
    (final, _), _ = jax.lax.scan(step, (obs, neg), ds)
    root = final[0] + params.hmm.log_start          # span [0, L-1]
    m = jnp.maximum(jnp.max(root), LOG_ZERO)
    return jnp.log(jnp.sum(jnp.exp(root - m))) + m


def cfg_viterbi_decode(
    params: CfgParams,
    obs: jax.Array,
    symbols: jax.Array,
    max_span: int | None = None,
) -> tuple[np.ndarray, float]:
    """Full-sequence Viterbi parse -> per-position state path.

    The root is the best state over span [0, L-1] weighted by log_start
    (max_span must be >= L; use chunking for long sequences).  Host-side
    traceback assigns each position the state that emitted it.
    """
    L, S = obs.shape
    if max_span is None:
        max_span = L
    if max_span < L:
        raise ValueError(
            "cfg_viterbi_decode needs max_span >= L (chunk the input)"
        )
    scores, ptr_s, ptr_r = map(
        np.asarray, cfg_viterbi_chart(params, obs, symbols, max_span)
    )
    log_start = np.asarray(params.hmm.log_start)
    root_scores = scores[L - 1, 0] + log_start
    state = int(np.argmax(root_scores))
    score = float(root_scores[state])

    path = np.zeros(L, dtype=np.int32)
    stack = [(0, L - 1, state)]
    while stack:
        i, j, s = stack.pop()
        d = j - i
        path[i] = s
        if d == 0:
            continue
        nxt = int(ptr_s[d, i, s])
        if ptr_r[d, i, s] == 1:      # pair rule: emits at i and j
            path[j] = s
            if d >= 2:
                stack.append((i + 1, j - 1, nxt))
        else:                         # left emission
            stack.append((i + 1, j, nxt))
    return path, score
