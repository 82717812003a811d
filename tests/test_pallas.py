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


class TestProbSpaceV3:
    """The large-S MXU engine: probability-space streaming kernels must
    reproduce the XLA scaled scans (alpha_p == exp(alpha_hat) etc.)."""

    def _obs_split(self, obs):
        o_m = jnp.max(obs, axis=-1)
        return jnp.exp(obs - o_m[..., None]), o_m

    def test_v3_forward_parity(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=5, T=2, V=4, L=37, B=3)
        lens = jnp.asarray([37, 20, 7])
        ah_ref, _, ll_ref = dp.forward_scaled(ls, lt, obs, lens)
        obs_p, o_m = self._obs_split(obs)
        alpha_p, dms = pk.forward_prob_pallas_v3(ls, lt, obs_p, lens)
        np.testing.assert_allclose(
            np.asarray(alpha_p), np.exp(np.asarray(ah_ref)), atol=2e-6
        )
        valid = np.arange(37)[None, :] < np.asarray(lens)[:, None]
        ll = (
            np.log(np.asarray(alpha_p)[:, -1, :].sum(-1))
            + np.asarray(dms).sum(1)
            + (np.asarray(o_m) * valid).sum(1)
        )
        np.testing.assert_allclose(ll, np.asarray(ll_ref), rtol=1e-5)

    def test_v3_backward_parity(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=5, T=2, V=4, L=37, B=3)
        lens = jnp.asarray([37, 20, 7])
        bh_ref, _ = dp.backward_scaled(lt, obs, lens)
        obs_p, _ = self._obs_split(obs)
        beta_p = pk.backward_prob_pallas_v3(lt, obs_p, lens)
        np.testing.assert_allclose(
            np.asarray(beta_p), np.exp(np.asarray(bh_ref)), atol=2e-6
        )

    def test_v3_large_s_multigroup(self, rng, make_hmm):
        """Force several batch groups (Bg floor is 128, so fake a tiny
        group via the module knob is not needed — use B > 128 with a
        large S so the picker still returns >= 128; parity is the
        point)."""
        ls, lt, obs = _setup(rng, make_hmm, S=9, T=2, V=4, L=12, B=5)
        lens = jnp.asarray([12, 1, 7, 12, 3])
        ah_ref, _, _ = dp.forward_scaled(ls, lt, obs, lens)
        obs_p, _ = self._obs_split(obs)
        alpha_p, _ = pk.forward_prob_pallas_v3(ls, lt, obs_p, lens)
        np.testing.assert_allclose(
            np.asarray(alpha_p), np.exp(np.asarray(ah_ref)), atol=2e-6
        )

    def test_v3_zero_transitions_and_zero_lengths(self, rng, make_hmm):
        log_start, log_trans, log_em = make_hmm(
            5, 2, 4, zero_trans_frac=0.3
        )
        from tehmm_tpu import oracle as _oracle

        obs1 = _oracle.obs_log_likelihoods(
            log_em, rng.randint(1, 4, size=(40, 2))
        ).astype(np.float32)
        obs = jnp.asarray(np.stack([obs1, np.zeros_like(obs1)]))
        ls = jnp.asarray(log_start, jnp.float32)
        lt = jnp.asarray(log_trans, jnp.float32)
        lens = jnp.asarray([40, 0])
        _, _, ll_ref = dp.forward_scaled(ls, lt, obs, lens)
        o_m = jnp.max(obs, axis=-1)
        obs_p = jnp.exp(obs - o_m[..., None])
        alpha_p, dms = pk.forward_prob_pallas_v3(ls, lt, obs_p, lens)
        ll0 = (
            float(jnp.log(alpha_p[0, -1].sum()))
            + float(dms[0].sum())
            + float(o_m[0].sum())
        )
        np.testing.assert_allclose(ll0, float(ll_ref[0]), rtol=1e-5)
        # zero-length row: alpha_p stays exp(0) = 1, dm contributions 0
        np.testing.assert_array_equal(np.asarray(alpha_p[1]), 1.0)
        np.testing.assert_array_equal(np.asarray(dms[1]), 0.0)


class TestEngineSelection:
    def test_viterbi_engine_gates_on_states(self):
        from tehmm_tpu.parallel.stitch import _viterbi_engine
        from tehmm_tpu.ops import dp as _dp

        # on CPU both sizes use the XLA scan; on TPU only S <= 64 may
        # return the Pallas kernel — either way S=128 must be XLA
        assert _viterbi_engine(128) is _dp.viterbi


class TestViterbiV3:
    """Batch-grouped streaming Viterbi (lifts the v2 S<=64 VMEM gate;
    round-1 review item #2)."""

    def test_v3_paths_bit_identical(self, rng, make_hmm):
        ls, lt, obs = _setup(rng, make_hmm, S=6, T=2, V=5, L=41, B=4)
        lens = jnp.asarray([41, 17, 1, 0])
        p_ref, s_ref = dp.viterbi(ls, lt, obs, lens)
        p_v3, s_v3 = pk.viterbi_pallas_v3(ls, lt, obs, lens)
        for b in range(3):
            n = int(lens[b])
            np.testing.assert_array_equal(
                np.asarray(p_v3)[b, :n], np.asarray(p_ref)[b, :n],
                err_msg=f"row {b}",
            )
        np.testing.assert_allclose(
            np.asarray(s_v3)[:3], np.asarray(s_ref)[:3],
            rtol=1e-5, atol=1e-4,
        )

    def test_v3_past_64_states(self, rng, make_hmm):
        """State counts beyond the old gate run through the grouped
        kernel (interpreted here; real-Mosaic parity in tests_tpu/)."""
        ls, lt, obs = _setup(rng, make_hmm, S=72, T=1, V=4, L=9, B=2)
        p_ref, _ = dp.viterbi(ls, lt, obs)
        p_v3, _ = pk.viterbi_pallas_v3(ls, lt, obs)
        np.testing.assert_array_equal(
            np.asarray(p_v3), np.asarray(p_ref)
        )

    def test_chunk_values_parity(self, rng, make_hmm):
        """Carry-mode kernel == dp.viterbi_chunk_values (the exact
        checkpointed decoder's recompute sweep)."""
        ls, lt, obs = _setup(rng, make_hmm, S=5, T=2, V=4, L=23, B=3)
        lens = jnp.asarray([23, 11, 23])
        rng2 = np.random.RandomState(3)
        v_init = jnp.asarray(
            rng2.randn(3, 5).astype(np.float32)
        )
        want = dp.viterbi_chunk_values(lt, obs, v_init, lens)
        got = pk.viterbi_chunk_values_pallas(lt, obs, v_init, lens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )


class TestFusedV4:
    """Fused E-step engine: symbols -> sufficient statistics with no
    per-position HBM tensors except alpha (round-2 profile-driven
    redesign)."""

    def _params(self, make_hmm, S, T, V):
        import jax.numpy as jnp
        from tehmm_tpu.models.params import HmmParams

        ls, lt, lem = make_hmm(S, T, V)
        return HmmParams(
            log_start=jnp.asarray(ls, jnp.float32),
            log_trans=jnp.asarray(lt, jnp.float32),
            log_em=jnp.asarray(lem, jnp.float32),
        )

    def test_v4_matches_xla_ragged(self, rng, make_hmm):
        from tehmm_tpu.ops import em

        S, T, V, B, L = 5, 3, 6, 4, 37
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lens = jnp.asarray([L, 20, 1, 0])
        ref = em.em_sufficient_stats(params, symbols, lens, engine="xla")
        got = em.em_sufficient_stats(
            params, symbols, lens, engine="pallas"
        )
        np.testing.assert_allclose(
            float(got.loglik), float(ref.loglik), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.start), np.asarray(ref.start),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.trans), np.asarray(ref.trans),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.em), np.asarray(ref.em),
            rtol=1e-4, atol=1e-4,
        )
        assert float(got.n_obs) == float(ref.n_obs)

    def test_v4_missing_symbols_inert(self, rng, make_hmm):
        """Symbol 0 (missing) contributes log-prob 0 and still shows up
        in the raw counts exactly like the XLA engine's one-hot path."""
        from tehmm_tpu.ops import em

        S, T, V, B, L = 3, 2, 5, 2, 16
        params = self._params(make_hmm, S, T, V)
        symbols = np.asarray(rng.randint(0, V, size=(B, L, T)))
        symbols[0, :, 0] = 0                 # whole track missing
        ref = em.em_sufficient_stats(
            params, jnp.asarray(symbols), engine="xla"
        )
        got = em.em_sufficient_stats(
            params, jnp.asarray(symbols), engine="pallas"
        )
        np.testing.assert_allclose(
            float(got.loglik), float(ref.loglik), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.em), np.asarray(ref.em),
            rtol=1e-4, atol=1e-4,
        )

    def test_v4_multigroup_column_order(
        self, rng, make_hmm, monkeypatch
    ):
        """G > 1 batch groups: per-sequence loglik must come back in
        the ORIGINAL batch order (regression: the [G, Sp, Bg] final-
        alpha reshape interleaved groups when G > 1)."""
        import tehmm_tpu.ops.pallas_kernels as pk

        monkeypatch.setattr(
            pk, "_pick_batch_group_v4", lambda *a, **k: 128
        )
        S, T, V, B, L = 3, 2, 5, 257, 9        # B > Bg=128 -> G=3
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(1, V, size=(B, L, T)))
        lengths = jnp.asarray(
            rng.randint(0, L + 1, size=(B,)), jnp.int32
        )
        start, pair, em_c, loglik_b = pk.em_counts_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths,
        )
        from tehmm_tpu.ops import dp
        from tehmm_tpu.models.emission import track_log_likelihoods

        obs = track_log_likelihoods(params.log_em, symbols)
        _, _, want = dp.forward_scaled(
            params.log_start, params.log_trans, obs, lengths
        )
        np.testing.assert_allclose(
            np.asarray(loglik_b), np.asarray(want),
            rtol=1e-4, atol=1e-4,
        )

    def test_v4_m_step_roundtrip(self, rng, make_hmm):
        """Full EM iteration on the fused stats improves loglik."""
        from tehmm_tpu.ops import em

        S, T, V, B, L = 4, 2, 5, 3, 50
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(1, V, size=(B, L, T)))
        sizes = jnp.asarray([V] * T)
        lls = []
        for _ in range(3):
            stats = em.em_sufficient_stats(
                params, symbols, engine="pallas"
            )
            params = em.em_m_step(stats, params, sizes)
            lls.append(float(stats.loglik))
        assert lls[2] >= lls[0] - 1e-3


class TestFusedViterbiV4:
    """Fused decode: symbols -> path, obs recomputed in-kernel both
    directions, in-kernel backtrace (no XLA scan)."""

    def _params(self, make_hmm, S, T, V):
        from tehmm_tpu.models.params import HmmParams

        ls, lt, lem = make_hmm(S, T, V)
        return HmmParams(
            log_start=jnp.asarray(ls, jnp.float32),
            log_trans=jnp.asarray(lt, jnp.float32),
            log_em=jnp.asarray(lem, jnp.float32),
        )

    def _check(self, params, symbols, lengths):
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.ops import dp
        from tehmm_tpu.ops import pallas_kernels as pk

        obs = track_log_likelihoods(params.log_em, symbols)
        want_p, want_s = dp.viterbi(
            params.log_start, params.log_trans, obs, lengths
        )
        got_p, got_s = pk.viterbi_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths,
        )
        np.testing.assert_array_equal(
            np.asarray(got_p), np.asarray(want_p)
        )
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-5
        )

    def test_paths_bit_identical_ragged(self, rng, make_hmm):
        S, T, V, B, L = 5, 3, 6, 4, 37
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, L - 9, 1, 0], jnp.int32)
        self._check(params, symbols, lengths)

    def test_near_tie_model(self, rng, make_hmm):
        """Uniform-ish model: many exact ties — first-hit argmax must
        match the XLA decoder everywhere."""
        S, T, V, B, L = 4, 1, 3, 3, 23
        ls = np.log(np.full(S, 1.0 / S, np.float32))
        lt = np.log(np.full((S, S), 1.0 / S, np.float32))
        lem = np.log(np.full((S, T, V), 1.0 / V, np.float32))
        from tehmm_tpu.models.params import HmmParams

        params = HmmParams(
            log_start=jnp.asarray(ls), log_trans=jnp.asarray(lt),
            log_em=jnp.asarray(lem),
        )
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, L - 5, L], jnp.int32)
        self._check(params, symbols, lengths)

    def test_multigroup(self, rng, make_hmm, monkeypatch):
        import tehmm_tpu.ops.pallas_kernels as pk

        monkeypatch.setattr(
            pk, "_pick_batch_group_vit4", lambda *a, **k: 128
        )
        S, T, V, B, L = 3, 2, 4, 259, 11       # B > Bg=128 -> G=3
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray(
            rng.randint(0, L + 1, size=(B,)), jnp.int32
        )
        self._check(params, symbols, lengths)


class TestFusedMaxPostV4:
    """Fused max-posterior decode: symbols -> argmax-gamma path; the
    forward reuses the v4 E-step kernel and the backward emits the
    int32 path directly (gamma never materializes)."""

    def _params(self, make_hmm, S, T, V):
        from tehmm_tpu.models.params import HmmParams

        ls, lt, lem = make_hmm(S, T, V)
        return HmmParams(
            log_start=jnp.asarray(ls, jnp.float32),
            log_trans=jnp.asarray(lt, jnp.float32),
            log_em=jnp.asarray(lem, jnp.float32),
        )

    def _check(self, params, symbols, lengths):
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.ops import dp
        from tehmm_tpu.ops import pallas_kernels as pk

        obs = track_log_likelihoods(params.log_em, symbols)
        ah, _, _ = dp.forward_scaled(
            params.log_start, params.log_trans, obs, lengths
        )
        bh, _ = dp.backward_scaled(params.log_trans, obs, lengths)
        want = np.asarray(
            jnp.argmax(dp.posterior_scaled(ah, bh), axis=-1)
        )
        got = np.asarray(pk.posterior_decode_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths,
        ))
        lens = np.asarray(lengths)
        for b in range(len(lens)):
            np.testing.assert_array_equal(
                got[b, : lens[b]], want[b, : lens[b]]
            )
            assert (got[b, lens[b]:] == 0).all()

    def test_matches_xla_argmax_gamma_ragged(self, rng, make_hmm):
        S, T, V, B, L = 5, 3, 6, 4, 37
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, L - 9, 1, 0], jnp.int32)
        self._check(params, symbols, lengths)

    def test_larger_state_count(self, rng, make_hmm):
        S, T, V, B, L = 20, 5, 8, 3, 64
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, 40, L], jnp.int32)
        self._check(params, symbols, lengths)

    def test_multigroup(self, rng, make_hmm, monkeypatch):
        import tehmm_tpu.ops.pallas_kernels as pk

        monkeypatch.setattr(
            pk, "_pick_batch_group_v4", lambda *a, **k: 128
        )
        S, T, V, B, L = 3, 2, 4, 259, 11       # B > Bg=128 -> G=3
        params = self._params(make_hmm, S, T, V)
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray(
            rng.randint(0, L + 1, size=(B,)), jnp.int32
        )
        self._check(params, symbols, lengths)


class TestFusedV4SegmentWeights:
    """Segment mode on the fused engines: obs_weights streams alongside
    the symbols; parity vs the XLA path's obs * w at every output."""

    def _setup(self, make_hmm, rng, S=5, T=2, V=4, B=4, L=37):
        from tehmm_tpu.models.params import HmmParams

        ls, lt, lem = make_hmm(S, T, V)
        params = HmmParams(
            log_start=jnp.asarray(ls, jnp.float32),
            log_trans=jnp.asarray(lt, jnp.float32),
            log_em=jnp.asarray(lem, jnp.float32),
        )
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, L - 7, 1, 0][:B], jnp.int32)
        weights = jnp.asarray(
            rng.randint(1, 9, size=(B, L)).astype(np.float32)
        )
        return params, symbols, lengths, weights

    def test_estep_weighted_matches_xla(self, rng, make_hmm):
        from tehmm_tpu.ops import em as em_ops
        from tehmm_tpu.ops import pallas_kernels as pk

        params, symbols, lengths, w = self._setup(make_hmm, rng)
        a = em_ops.em_sufficient_stats(
            params, symbols, lengths, engine="xla", obs_weights=w
        )
        start, pair, emc, llb = pk.em_counts_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths, w,
        )
        trans = pair * jnp.exp(params.log_trans)
        np.testing.assert_allclose(
            float(a.loglik), float(llb.sum()), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.start), np.asarray(start), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.trans), np.asarray(trans), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(a.em), np.asarray(emc), rtol=1e-4, atol=1e-3
        )

    def test_viterbi_weighted_bit_identical(self, rng, make_hmm):
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.ops import dp
        from tehmm_tpu.ops import pallas_kernels as pk

        params, symbols, lengths, w = self._setup(make_hmm, rng)
        obs = track_log_likelihoods(params.log_em, symbols)
        obs = obs * w[:, :, None]
        want_p, want_s = dp.viterbi(
            params.log_start, params.log_trans, obs, lengths
        )
        got_p, got_s = pk.viterbi_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths, w,
        )
        np.testing.assert_array_equal(
            np.asarray(got_p), np.asarray(want_p)
        )
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-4
        )

    def test_maxpost_weighted_matches_xla(self, rng, make_hmm):
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.ops import dp
        from tehmm_tpu.ops import pallas_kernels as pk

        params, symbols, lengths, w = self._setup(make_hmm, rng)
        obs = track_log_likelihoods(params.log_em, symbols)
        obs = obs * w[:, :, None]
        ah, _, _ = dp.forward_scaled(
            params.log_start, params.log_trans, obs, lengths
        )
        bh, _ = dp.backward_scaled(params.log_trans, obs, lengths)
        want = np.asarray(
            jnp.argmax(dp.posterior_scaled(ah, bh), axis=-1)
        )
        got = np.asarray(pk.posterior_decode_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths, w,
        ))
        lens = np.asarray(lengths)
        for b in range(len(lens)):
            np.testing.assert_array_equal(
                got[b, : lens[b]], want[b, : lens[b]]
            )


class TestFusedV4Gauss:
    """Gaussian-track emissions on the fused engines: the normal
    log-densities enter as a quadratic-form MXU dot against a streamed
    [mask | x | x²] feature block (models/gauss.py coefficients)."""

    def _setup(self, make_hmm, rng, S=5, T=2, V=4, B=3, L=33, Gn=2):
        from tehmm_tpu.models.gauss import GaussParams
        from tehmm_tpu.models.params import HmmParams

        ls, lt, lem = make_hmm(S, T, V)
        params = HmmParams(
            log_start=jnp.asarray(ls, jnp.float32),
            log_trans=jnp.asarray(lt, jnp.float32),
            log_em=jnp.asarray(lem, jnp.float32),
        )
        symbols = jnp.asarray(rng.randint(0, V, size=(B, L, T)))
        lengths = jnp.asarray([L, L - 7, 1][:B], jnp.int32)
        vals = rng.randn(B, L, Gn).astype(np.float32)
        vals[rng.rand(B, L, Gn) < 0.1] = np.nan     # missing values
        gp = GaussParams(
            mu=jnp.asarray(rng.randn(S, Gn).astype(np.float32)),
            log_var=jnp.asarray(
                np.log(0.5 + rng.rand(S, Gn).astype(np.float32))
            ),
        )
        return params, symbols, lengths, jnp.asarray(vals), gp

    def test_estep_gauss_matches_xla(self, rng, make_hmm):
        from tehmm_tpu.ops import em as em_ops
        from tehmm_tpu.ops import pallas_kernels as pk

        params, symbols, lengths, vals, gp = self._setup(make_hmm, rng)
        a = em_ops.em_sufficient_stats(
            params, symbols, lengths, engine="xla",
            gauss_params=gp, gauss_values=vals,
        )
        start, pair, emc, llb, (gn, gx, gx2) = (
            pk.em_counts_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                symbols, lengths, None, gp, vals,
            )
        )
        np.testing.assert_allclose(
            float(a.loglik), float(llb.sum()), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.trans),
            np.asarray(pair * jnp.exp(params.log_trans)),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(a.em), np.asarray(emc), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(a.gauss_n), np.asarray(gn), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(a.gauss_x), np.asarray(gx), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(a.gauss_x2), np.asarray(gx2),
            rtol=1e-4, atol=1e-4,
        )

    def test_decodes_gauss_match_xla(self, rng, make_hmm):
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.models.gauss import gauss_log_likelihoods
        from tehmm_tpu.ops import dp
        from tehmm_tpu.ops import pallas_kernels as pk

        params, symbols, lengths, vals, gp = self._setup(make_hmm, rng)
        obs = track_log_likelihoods(params.log_em, symbols) \
            + gauss_log_likelihoods(gp, vals)
        want_p, _ = dp.viterbi(
            params.log_start, params.log_trans, obs, lengths
        )
        got_p, _ = pk.viterbi_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths, None, gp, vals,
        )
        np.testing.assert_array_equal(
            np.asarray(got_p), np.asarray(want_p)
        )
        ah, _, _ = dp.forward_scaled(
            params.log_start, params.log_trans, obs, lengths
        )
        bh, _ = dp.backward_scaled(params.log_trans, obs, lengths)
        want = np.asarray(
            jnp.argmax(dp.posterior_scaled(ah, bh), axis=-1)
        )
        got = np.asarray(pk.posterior_decode_fused_pallas_v4(
            params.log_start, params.log_trans, params.log_em,
            symbols, lengths, None, gp, vals,
        ))
        lens = np.asarray(lengths)
        for b in range(len(lens)):
            np.testing.assert_array_equal(
                got[b, : lens[b]], want[b, : lens[b]]
            )
