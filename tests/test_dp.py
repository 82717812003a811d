"""DP kernel tests: brute-force enumeration, NumPy oracle, padding parity.

Mirrors the reference's test strategy (SURVEY.md §4: hmmTest.py validates
forward/backward/Viterbi against exhaustive enumeration over all state
paths on tiny models).
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from tehmm_tpu import oracle
from tehmm_tpu.ops import dp
from tehmm_tpu.models.emission import track_log_likelihoods


def _np_obs(rng, make_hmm, S, T, V, L):
    log_start, log_trans, log_em = make_hmm(S, T, V)
    symbols = rng.randint(1, V, size=(L, T))
    obs = oracle.obs_log_likelihoods(log_em, symbols)
    return log_start, log_trans, log_em, symbols, obs


class TestAgainstBruteForce:
    def test_forward_loglik_matches_enumeration(self, rng, make_hmm):
        S, T, V, L = 3, 2, 4, 6
        log_start, log_trans, _, _, obs = _np_obs(rng, make_hmm, S, T, V, L)
        want = oracle.brute_force_loglik(log_start, log_trans, obs)
        for matmul in (False, True):
            _, loglik = dp.forward(
                jnp.asarray(log_start, jnp.float32),
                jnp.asarray(log_trans, jnp.float32),
                jnp.asarray(obs, jnp.float32)[None],
                matmul=matmul,
            )
            np.testing.assert_allclose(float(loglik[0]), want, rtol=1e-5)

    def test_viterbi_matches_enumeration(self, rng, make_hmm):
        S, T, V, L = 3, 2, 4, 7
        log_start, log_trans, _, _, obs = _np_obs(rng, make_hmm, S, T, V, L)
        want_path, want_score = oracle.brute_force_viterbi(
            log_start, log_trans, obs
        )
        path, score = dp.viterbi(
            jnp.asarray(log_start, jnp.float32),
            jnp.asarray(log_trans, jnp.float32),
            jnp.asarray(obs, jnp.float32)[None],
        )
        np.testing.assert_array_equal(np.asarray(path[0]), want_path)
        np.testing.assert_allclose(float(score[0]), want_score, rtol=1e-5)


class TestAgainstNumpyOracle:
    def test_forward_backward_long(self, rng, make_hmm):
        S, T, V, L = 8, 3, 5, 200
        log_start, log_trans, _, _, obs = _np_obs(rng, make_hmm, S, T, V, L)
        alpha_np, ll_np = oracle.forward(log_start, log_trans, obs)
        beta_np = oracle.backward(log_trans, obs)
        for matmul in (False, True):
            alpha, ll = dp.forward(
                jnp.asarray(log_start, jnp.float32),
                jnp.asarray(log_trans, jnp.float32),
                jnp.asarray(obs, jnp.float32)[None],
                matmul=matmul,
            )
            beta = dp.backward(
                jnp.asarray(log_trans, jnp.float32),
                jnp.asarray(obs, jnp.float32)[None],
                matmul=matmul,
            )
            np.testing.assert_allclose(float(ll[0]), ll_np, rtol=1e-4)
            np.testing.assert_allclose(
                np.asarray(alpha[0]), alpha_np, rtol=2e-3, atol=1e-2
            )
            np.testing.assert_allclose(
                np.asarray(beta[0]), beta_np, rtol=2e-3, atol=1e-2
            )

    def test_viterbi_long_path_exact(self, rng, make_hmm):
        S, T, V, L = 8, 3, 5, 300
        log_start, log_trans, _, _, obs = _np_obs(rng, make_hmm, S, T, V, L)
        want_path, _ = oracle.viterbi(log_start, log_trans, obs)
        # feed the SAME f32 obs to both so the comparison isolates the DP
        obs32 = obs.astype(np.float32).astype(np.float64)
        want_path32, _ = oracle.viterbi(
            log_start.astype(np.float32).astype(np.float64),
            log_trans.astype(np.float32).astype(np.float64),
            obs32,
        )
        path, _ = dp.viterbi(
            jnp.asarray(log_start, jnp.float32),
            jnp.asarray(log_trans, jnp.float32),
            jnp.asarray(obs, jnp.float32)[None],
        )
        np.testing.assert_array_equal(np.asarray(path[0]), want_path32)
        # and f32 vs f64 path should agree on non-degenerate data anyway
        np.testing.assert_array_equal(want_path32, want_path)

    def test_viterbi_zero_transitions(self, rng, make_hmm):
        """Forbidden (probability-zero) transitions must never be taken."""
        S, T, V, L = 6, 2, 4, 100
        log_start, log_trans, log_em = make_hmm(S, T, V, zero_trans_frac=0.4)
        symbols = rng.randint(1, V, size=(L, T))
        obs = oracle.obs_log_likelihoods(log_em, symbols)
        want_path, _ = oracle.viterbi(log_start, log_trans, obs)
        path, _ = dp.viterbi(
            jnp.asarray(log_start, jnp.float32),
            jnp.asarray(log_trans, jnp.float32),
            jnp.asarray(obs, jnp.float32)[None],
        )
        path = np.asarray(path[0])
        np.testing.assert_array_equal(path, want_path)
        trans = np.exp(np.where(log_trans < -1e29, -np.inf, log_trans))
        for t in range(1, L):
            assert trans[path[t - 1], path[t]] > 0

    def test_posterior_sums_to_one(self, rng, make_hmm):
        S, T, V, L = 5, 2, 4, 50
        log_start, log_trans, _, _, obs = _np_obs(rng, make_hmm, S, T, V, L)
        obs_j = jnp.asarray(obs, jnp.float32)[None]
        alpha, ll = dp.forward(
            jnp.asarray(log_start, jnp.float32),
            jnp.asarray(log_trans, jnp.float32), obs_j)
        beta = dp.backward(jnp.asarray(log_trans, jnp.float32), obs_j)
        gamma = dp.posterior(alpha, beta, ll)
        np.testing.assert_allclose(
            np.asarray(gamma.sum(-1)[0]), np.ones(L), rtol=1e-4
        )


class TestPadding:
    def test_padded_batch_matches_individual(self, rng, make_hmm):
        """Bit-exact: padded rows in a batch == unpadded solo runs."""
        S, T, V = 4, 2, 4
        log_start, log_trans, log_em = make_hmm(S, T, V)
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        lengths = [17, 31, 8]
        L = max(lengths)
        obs_list = []
        for ell in lengths:
            symbols = rng.randint(1, V, size=(ell, T))
            o = oracle.obs_log_likelihoods(log_em, symbols).astype(np.float32)
            obs_list.append(np.pad(o, ((0, L - ell), (0, 0))))
        obs_b = jnp.asarray(np.stack(obs_list))
        len_b = jnp.asarray(lengths)

        alpha_b, ll_b = dp.forward(ls, lt, obs_b, len_b)
        beta_b = dp.backward(lt, obs_b, len_b)
        path_b, score_b = dp.viterbi(ls, lt, obs_b, len_b)

        for i, ell in enumerate(lengths):
            solo = obs_b[i : i + 1, :ell]
            alpha_s, ll_s = dp.forward(ls, lt, solo)
            beta_s = dp.backward(lt, solo)
            path_s, score_s = dp.viterbi(ls, lt, solo)
            # numeric outputs: tolerance-exact (the log-normalizer cumsum
            # tree shape differs with padded length, so the last few bits
            # may differ); discrete outputs: bit-exact.
            np.testing.assert_allclose(
                np.asarray(alpha_b[i, :ell]), np.asarray(alpha_s[0]),
                rtol=1e-6, atol=1e-5,
            )
            np.testing.assert_allclose(
                float(ll_b[i]), float(ll_s[0]), rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(beta_b[i, :ell]), np.asarray(beta_s[0]),
                rtol=1e-6, atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(path_b[i, :ell]), np.asarray(path_s[0])
            )
            np.testing.assert_array_equal(float(score_b[i]), float(score_s[0]))


class TestEmissionOp:
    def test_onehot_matmul_matches_oracle(self, rng, make_hmm):
        S, T, V, L = 7, 4, 6, 64
        _, _, log_em = make_hmm(S, T, V)
        symbols = rng.randint(0, V, size=(L, T))  # include missing symbol 0
        want = oracle.obs_log_likelihoods(log_em, symbols)
        got = track_log_likelihoods(
            jnp.asarray(log_em, jnp.float32), jnp.asarray(symbols)
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_missing_symbol_ignored(self, rng, make_hmm):
        S, T, V, L = 3, 2, 4, 10
        _, _, log_em = make_hmm(S, T, V)
        symbols = rng.randint(1, V, size=(L, T))
        base = track_log_likelihoods(
            jnp.asarray(log_em, jnp.float32), jnp.asarray(symbols)
        )
        sym_missing = symbols.copy()
        sym_missing[:, 1] = 0  # whole track missing
        got = track_log_likelihoods(
            jnp.asarray(log_em, jnp.float32), jnp.asarray(sym_missing)
        )
        only_t0 = track_log_likelihoods(
            jnp.asarray(log_em[:, :1], jnp.float32),
            jnp.asarray(symbols[:, :1]),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(only_t0), rtol=1e-6
        )
        assert not np.allclose(np.asarray(base), np.asarray(got))


class TestLengthIndependence:
    def test_posterior_accuracy_independent_of_length(self, rng, make_hmm):
        """The scaled DP + per-position normalization keeps posterior error
        flat in L (the naive unscaled form loses ~1% by L=2048)."""
        from tehmm_tpu.ops.dp import (
            forward_scaled, backward_scaled, posterior_scaled,
        )
        S, T, V = 4, 2, 4
        log_start, log_trans, log_em = make_hmm(S, T, V)
        for L in (512, 8192):
            symbols = rng.randint(1, V, size=(L, T))
            obs = oracle.obs_log_likelihoods(log_em, symbols)
            obs_j = jnp.asarray(obs, jnp.float32)[None]
            ah, _, ll = forward_scaled(
                jnp.asarray(log_start, jnp.float32),
                jnp.asarray(log_trans, jnp.float32), obs_j)
            bh, _ = backward_scaled(
                jnp.asarray(log_trans, jnp.float32), obs_j)
            gamma = posterior_scaled(ah, bh)
            err = float(jnp.abs(gamma.sum(-1) - 1).max())
            assert err < 1e-5, (L, err)


class TestStreamingForward:
    def test_streaming_loglik_exact(self, rng, make_hmm):
        """Chunk-carried forward == monolithic forward (SURVEY.md §5
        exact cross-boundary alpha carry)."""
        S, T, V, L = 5, 2, 4, 230
        log_start, log_trans, log_em = make_hmm(S, T, V)
        obs = np.stack([
            oracle.obs_log_likelihoods(
                log_em, rng.randint(1, V, (L, T))
            )
            for _ in range(3)
        ]).astype(np.float32)
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        _, want = dp.forward(ls, lt, jnp.asarray(obs))
        for Lc in (32, 50, 128):
            chunks = [
                jnp.asarray(obs[:, i : i + Lc])
                for i in range(0, L, Lc)
            ]
            got = dp.streaming_loglik(ls, lt, chunks)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6
            )

    def test_streaming_ragged_lengths(self, rng, make_hmm):
        S, T, V = 4, 1, 4
        log_start, log_trans, log_em = make_hmm(S, T, V)
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        true_lens = [70, 45]
        L = max(true_lens)
        obs = np.zeros((2, L, S), np.float32)
        for b, ell in enumerate(true_lens):
            obs[b, :ell] = oracle.obs_log_likelihoods(
                log_em, rng.randint(1, V, (ell, T))
            )
        _, want = dp.forward(
            ls, lt, jnp.asarray(obs), jnp.asarray(true_lens)
        )
        Lc = 32
        chunks, lens = [], []
        for i in range(0, L, Lc):
            chunks.append(jnp.asarray(obs[:, i : i + Lc]))
            lens.append(np.clip(np.asarray(true_lens) - i, 0, Lc))
        got = dp.streaming_loglik(ls, lt, chunks, lens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6
        )


def test_viterbi_tie_break_matches_brute_force():
    """On an exactly tied model the DP's backward backtracking picks
    the path that is lexicographically smallest right-to-left; the
    brute-force oracle must implement the SAME rule (round-3 review:
    it kept the forward-lex smallest path, so any tied instance
    produced a spurious golden mismatch blaming the kernel)."""
    import jax.numpy as jnp

    log_start = np.log(np.array([0.5, 0.5]))
    log_trans = np.log(np.array([[0.3, 0.7], [0.7, 0.3]]))
    obs64 = np.zeros((2, 2))
    want_path, want_score = oracle.brute_force_viterbi(
        log_start, log_trans, obs64
    )
    path, score = dp.viterbi(
        jnp.asarray(log_start, jnp.float32),
        jnp.asarray(log_trans, jnp.float32),
        jnp.asarray(obs64, jnp.float32)[None],
    )
    np.testing.assert_array_equal(np.asarray(path[0]), want_path)
    np.testing.assert_allclose(float(score[0]), want_score, rtol=1e-6)
