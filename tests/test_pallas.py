"""Pallas kernel parity tests (interpreter mode on CPU; the same
assertions run compiled on TPU in the perf harness)."""

import numpy as np
import jax.numpy as jnp

from tehmm_tpu import oracle
from tehmm_tpu.ops import dp
from tehmm_tpu.ops import pallas_kernels as pk


def _setup(rng, make_hmm, S=5, T=2, V=4, L=33, B=3):
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


class TestPallasParity:
    def test_forward(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm)
        lens = jnp.asarray([33, 20, 7])
        ah_ref, lc_ref, ll_ref = dp.forward_scaled(ls, lt, obs, lens)
        ah, lc, ll = pk.forward_scaled_pallas(ls, lt, obs, lens)
        np.testing.assert_allclose(
            np.asarray(ah), np.asarray(ah_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(lc_ref), atol=1e-4
        )

    def test_backward(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm)
        lens = jnp.asarray([33, 20, 7])
        bh_ref, ld_ref = dp.backward_scaled(lt, obs, lens)
        bh, ld = pk.backward_scaled_pallas(lt, obs, lens)
        np.testing.assert_allclose(
            np.asarray(bh), np.asarray(bh_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ld), np.asarray(ld_ref), atol=1e-4
        )

    def test_viterbi(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=6, L=48)
        lens = jnp.asarray([48, 31, 9])
        p_ref, s_ref = dp.viterbi(ls, lt, obs, lens)
        p, s = pk.viterbi_pallas(ls, lt, obs, lens)
        np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s_ref), rtol=1e-5
        )

    def test_zero_transitions(self, rng, make_hmm):
        log_start, log_trans, log_em = make_hmm(
            5, 2, 4, zero_trans_frac=0.3
        )
        obs = jnp.asarray(
            oracle.obs_log_likelihoods(
                log_em, rng.randint(1, 4, size=(40, 2))
            ), jnp.float32
        )[None]
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        _, _, ll_ref = dp.forward_scaled(ls, lt, obs)
        _, _, ll = pk.forward_scaled_pallas(ls, lt, obs)
        np.testing.assert_allclose(
            float(ll[0]), float(ll_ref[0]), rtol=1e-6
        )
        p_ref, _ = dp.viterbi(ls, lt, obs)
        p, _ = pk.viterbi_pallas(ls, lt, obs)
        np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))


class TestStreamingV2:
    def test_v2_forward_parity(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=5, T=2, V=4, L=37, B=3)
        lens = jnp.asarray([37, 20, 7])
        ah_ref, lc_ref, ll_ref = dp.forward_scaled(ls, lt, obs, lens)
        ah, lc, ll = pk.forward_scaled_pallas_v2(ls, lt, obs, lens)
        np.testing.assert_allclose(
            np.asarray(ah), np.asarray(ah_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=1e-6
        )

    def test_v2_viterbi_parity(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=6, T=3, V=5, L=52, B=3)
        lens = jnp.asarray([52, 31, 9])
        p_ref, s_ref = dp.viterbi(ls, lt, obs, lens)
        p, s = pk.viterbi_pallas_v2(ls, lt, obs, lens)
        np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s_ref), rtol=1e-5
        )


class TestEngineSelection:
    def test_viterbi_engine_gates_on_states(self):
        from tehmm_tpu.parallel.stitch import _viterbi_engine
        from tehmm_tpu.ops import dp as _dp

        # on CPU both sizes use the XLA scan; on TPU only S <= 64 may
        # return the Pallas kernel — either way S=128 must be XLA
        assert _viterbi_engine(128) is _dp.viterbi
