"""Parallel-in-time (associative scan) kernels vs sequential DP."""

import numpy as np
import jax.numpy as jnp

from tehmm_tpu import oracle
from tehmm_tpu.ops import dp
from tehmm_tpu.ops.assoc import forward_assoc, viterbi_assoc


def _setup(rng, make_hmm, S, T, V, L, B=2):
    log_start, log_trans, log_em = make_hmm(S, T, V)
    obs = np.stack([
        oracle.obs_log_likelihoods(
            log_em, rng.randint(1, V, size=(L, T))
        )
        for _ in range(B)
    ]).astype(np.float32)
    return (
        jnp.asarray(log_start, jnp.float32),
        jnp.asarray(log_trans, jnp.float32),
        jnp.asarray(obs),
    )


class TestForwardAssoc:
    def test_matches_sequential(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=5, T=2, V=4, L=64)
        alpha_seq, ll_seq = dp.forward(ls, lt, obs)
        alpha_par, ll_par = forward_assoc(ls, lt, obs)
        np.testing.assert_allclose(
            np.asarray(ll_par), np.asarray(ll_seq), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(alpha_par), np.asarray(alpha_seq),
            rtol=1e-4, atol=1e-3,
        )

    def test_non_power_of_two_length(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=4, T=1, V=5, L=37)
        _, ll_seq = dp.forward(ls, lt, obs)
        _, ll_par = forward_assoc(ls, lt, obs)
        np.testing.assert_allclose(
            np.asarray(ll_par), np.asarray(ll_seq), rtol=1e-5
        )

    def test_zero_transitions(self, rng, make_hmm):
        ls, lt, obs = _setup(
            rng, make_hmm, S=5, T=2, V=4, L=48,
        )
        # zero out some transitions through the fixture helper
        log_start, log_trans, log_em = make_hmm(
            5, 2, 4, zero_trans_frac=0.3
        )
        obs = jnp.asarray(
            oracle.obs_log_likelihoods(
                log_em, rng.randint(1, 4, size=(48, 2))
            ), jnp.float32
        )[None]
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        _, ll_seq = dp.forward(ls, lt, obs)
        _, ll_par = forward_assoc(ls, lt, obs)
        np.testing.assert_allclose(
            np.asarray(ll_par), np.asarray(ll_seq), rtol=1e-5
        )


class TestViterbiAssoc:
    def test_matches_sequential_path(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=6, T=3, V=5, L=96, B=3)
        path_seq, score_seq = dp.viterbi(ls, lt, obs)
        path_par, score_par = viterbi_assoc(ls, lt, obs)
        np.testing.assert_allclose(
            np.asarray(score_par), np.asarray(score_seq), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(path_par), np.asarray(path_seq)
        )

    def test_matches_brute_force(self, rng, make_hmm):
        log_start, log_trans, log_em = make_hmm(3, 2, 4)
        sym = rng.randint(1, 4, size=(7, 2))
        obs = oracle.obs_log_likelihoods(log_em, sym)
        want_path, want_score = oracle.brute_force_viterbi(
            log_start, log_trans, obs
        )
        path, score = viterbi_assoc(
            jnp.asarray(log_start, jnp.float32),
            jnp.asarray(log_trans, jnp.float32),
            jnp.asarray(obs, jnp.float32)[None],
        )
        np.testing.assert_array_equal(np.asarray(path[0]), want_path)
        np.testing.assert_allclose(
            float(score[0]), want_score, rtol=1e-5
        )
