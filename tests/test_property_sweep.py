"""Randomized property sweep: DP and EM invariants across many random
models/datasets (seeded, deterministic).  A cheap fuzz layer on top of
the targeted oracle tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tehmm_tpu import oracle
from tehmm_tpu.models.params import HmmParams
from tehmm_tpu.ops import dp, em
from tests.conftest import random_hmm


@pytest.mark.parametrize("seed", range(8))
def test_dp_invariants_random_model(seed):
    rng = np.random.RandomState(1000 + seed)
    S = rng.randint(2, 9)
    T = rng.randint(1, 4)
    V = rng.randint(3, 7)
    L = rng.randint(20, 120)
    zero_frac = float(rng.choice([0.0, 0.2, 0.4]))
    log_start, log_trans, log_em = random_hmm(
        rng, S, T, V, zero_trans_frac=zero_frac
    )
    symbols = rng.randint(1, V, size=(L, T))
    # sprinkle missing data
    missing = rng.rand(L, T) < 0.1
    symbols = np.where(missing, 0, symbols)
    obs64 = oracle.obs_log_likelihoods(log_em, symbols)

    ls = jnp.asarray(log_start, jnp.float32)
    lt = jnp.asarray(log_trans, jnp.float32)
    obs = jnp.asarray(obs64, jnp.float32)[None]

    # 1. loglik matches the float64 oracle
    _, ll = dp.forward(ls, lt, obs)
    _, want_ll = oracle.forward(log_start, log_trans, obs64)
    np.testing.assert_allclose(float(ll[0]), want_ll, rtol=1e-4)

    # 2. Viterbi path bit-matches the oracle and respects zero transitions
    path, score = dp.viterbi(ls, lt, obs)
    want_path, want_score = oracle.viterbi(log_start, log_trans, obs64)
    np.testing.assert_array_equal(np.asarray(path[0]), want_path)
    np.testing.assert_allclose(float(score[0]), want_score, rtol=1e-4)
    assert float(score[0]) <= float(ll[0]) + 1e-3

    # 3. posteriors sum to one
    ah, _, llx = dp.forward_scaled(ls, lt, obs)
    bh, _ = dp.backward_scaled(lt, obs)
    gamma = dp.posterior_scaled(ah, bh)
    np.testing.assert_allclose(
        np.asarray(gamma.sum(-1)[0]), np.ones(L), atol=1e-4
    )

    # 4. EM statistics match the oracle
    params = HmmParams(log_start=ls, log_trans=lt,
                       log_em=jnp.asarray(log_em, jnp.float32))
    stats = em.em_sufficient_stats(params, jnp.asarray(symbols)[None])
    w_start, w_trans, w_em, w_ll = oracle.baum_welch_counts(
        log_start, log_trans, obs64, symbols, V
    )
    np.testing.assert_allclose(
        np.asarray(stats.trans), w_trans, rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(stats.em), w_em, rtol=5e-3, atol=1e-3
    )

    # 5. one EM step never decreases the likelihood
    sizes = jnp.asarray([V] * T)
    p2 = em.em_m_step(stats, params, sizes)
    stats2 = em.em_sufficient_stats(p2, jnp.asarray(symbols)[None])
    assert float(stats2.loglik) >= float(stats.loglik) - 1e-3
