"""On-chip scale + end-to-end tier (round-5; round-4 VERDICT weak #8).

The round-4 on-chip surface covered kernel parity at toy shapes; this
file adds the paths that only matter at scale and that Mosaic/real-HBM
behavior can break while the CPU interpreter tier stays green:

  * host-streamed fit == resident fit (loglik trajectory), plain and
    gaussian-valued, through the real double-buffered H2D loop
  * a >=50M-position stitched decode recovering a planted genome
    (Viterbi and max-posterior) through the resident decoder, the
    run-length path transport, and the halo-stitching driver
  * fused segment-weight and gaussian engines at S=128 (the fused-gate
    boundary; round-4 only tested these at S=20)
  * the exact sequence-parallel forward operator (parallel/seqpar) on
    a real-device mesh
  * adversarial run-length transport: paths with ~Lc/2 runs must
    round-trip bit-exact (slot overflow -> per-base fallback)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tehmm_tpu.models.params import HmmParams, init_random
from tehmm_tpu.ops import dp


def _planted(rng, N, S, T, V, run_len):
    """Run-length planted truth + peaked per-state emissions, vectorized
    (same construction as tools/demo_genome_real.py, in memory)."""
    n_runs = 2 * N // run_len + 2
    states = rng.randint(0, S, size=n_runs)
    lens = rng.geometric(1.0 / run_len, size=n_runs)
    ends = np.cumsum(lens)
    n_runs = int(np.searchsorted(ends, N) + 1)
    truth = np.repeat(states[:n_runs], lens[:n_runs])[:N].astype(np.int8)

    sym = np.empty((N, T), np.uint8)
    for t in range(T):
        peak = (truth.astype(np.int64) + t) % (V - 1) + 1
        miss = rng.rand(N) < 0.1
        sym[:, t] = np.where(miss, rng.randint(1, V, size=N), peak)
    return truth, sym


def _peaked_params(S, T, V, run_len):
    """HmmParams matching _planted's generative process."""
    from tehmm_tpu.utils.common import LOG_ZERO

    stay = 1.0 - 1.0 / run_len
    trans = np.full((S, S), (1.0 - stay) / (S - 1))
    np.fill_diagonal(trans, stay)
    start = np.full(S, 1.0 / S)
    log_em = np.full((S, T, V), LOG_ZERO, np.float32)
    for t in range(T):
        for s in range(S):
            p = np.full(V, 0.1 / (V - 1))
            p[(s + t) % (V - 1) + 1] += 0.9
            p[0] = 0.0
            log_em[s, t, 1:] = np.log(p[1:] / p[1:].sum())
    return HmmParams(
        log_start=jnp.asarray(np.log(start), jnp.float32),
        log_trans=jnp.asarray(np.log(trans), jnp.float32),
        log_em=jnp.asarray(log_em),
    )


def _mk_model(S, T, V, seed=0):
    """In-memory MultitrackHmm (no XML fixtures on the chip tier)."""
    from tehmm_tpu.io.category import CategoryMap
    from tehmm_tpu.io.trackxml import Track, TrackList
    from tehmm_tpu.models.hmm import MultitrackHmm

    tl = TrackList()
    cmaps = {}
    for t in range(T):
        name = f"t{t}"
        tl.add(Track(name=name, path=f"{name}.bed"))
        cm = CategoryMap()
        for v in range(V - 1):
            cm.get_map(str(v), update=True)
        cmaps[name] = cm
    params = init_random(S, [V] * T, seed=seed)
    return MultitrackHmm(params, tl, cmaps)


@pytest.mark.parametrize("with_gauss", [False, True])
def test_host_streamed_fit_matches_resident_on_chip(rng, with_gauss):
    """The double-buffered host-streamed pass loop (models/hmm.fit,
    round-4) on the real tunnel: forcing a staging budget of ~1/4 the
    input must reproduce the resident loglik trajectory exactly up to
    f32 stat-summation order."""
    from tehmm_tpu.io.trackdata import TrackTable

    S, T, V = 8, 3, 6
    L = 1 << 19                       # 0.5M positions, 512 chunk rows
    sym = rng.randint(1, V, size=(L, T)).astype(np.uint8)
    vals = None
    if with_gauss:
        vals = rng.randn(L, 2).astype(np.float32)
        vals[rng.rand(L) < 0.1] = np.nan
    tab = TrackTable("chr1", 0, L, sym, values=vals)

    def train(budget):
        m = _mk_model(S, T, V, seed=3)
        if with_gauss:
            from tehmm_tpu.models.gauss import GaussParams

            m.gauss = GaussParams(
                mu=jnp.asarray(
                    np.linspace(-1, 1, S * 2).reshape(S, 2),
                    jnp.float32,
                ),
                log_var=jnp.zeros((S, 2), jnp.float32),
            )
        res = m.fit(
            [tab], max_iterations=3, convergence_tol=0.0,
            chunk_len=1024, max_device_bytes=budget,
        )
        return res.logliks

    ll_res = train(None)
    staged = sym.nbytes + (0 if vals is None else vals.nbytes)
    ll_str = train(staged // 4)       # forces >= 8 streamed blocks
    np.testing.assert_allclose(ll_str, ll_res, rtol=1e-5)


@pytest.mark.parametrize("kind", ["viterbi", "posterior"])
def test_stitched_decode_50m_on_chip(rng, kind):
    """>=50M-position stitched decode on the chip — resident decoder,
    run-length transport, targeted halo widening — recovers a planted
    run-length genome at >=0.97 accuracy (the planted model's own Bayes
    rate; demo_genome_real measures 1.0 at 250M after EM)."""
    from tehmm_tpu.io.trackdata import TrackTable
    from tehmm_tpu.parallel.stitch import (
        posterior_chunked, viterbi_chunked,
    )

    N, S, T, V, run_len = 50_000_000, 5, 2, 6, 300
    truth, sym = _planted(rng, N, S, T, V, run_len)
    params = _peaked_params(S, T, V, run_len)
    tab = TrackTable("chr1", 0, N, sym)

    fn = viterbi_chunked if kind == "viterbi" else posterior_chunked
    paths, report = fn(params, [tab], chunk_len=4096, halo=256)
    (path,) = paths
    assert path.shape == (N,)
    acc = float((path == truth).mean())
    assert acc >= 0.97, (kind, acc)


@pytest.mark.parametrize("mode", ["weights", "gauss"])
def test_fused_engines_s128_on_chip(rng, mode):
    """Segment-weight and gaussian streams through the fused v4 engines
    at S=128 — the top of the fused gate, where VMEM pressure and the
    [8,128] tile layout differ from the S=20 cases round 4 tested."""
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.ops import em as em_ops
    from tehmm_tpu.ops import pallas_kernels as pk

    S, T, V, B, L = 128, 3, 6, 4, 256
    params = init_random(S, [V] * T, seed=1)
    sym = jnp.asarray(rng.randint(1, V, size=(B, L, T)), jnp.int32)
    lens = jnp.asarray([L, L, L // 2, 0], jnp.int32)

    w = None
    gp = vals = None
    obs = track_log_likelihoods(params.log_em, sym)
    if mode == "weights":
        w = jnp.asarray(
            rng.randint(1, 9, size=(B, L)).astype(np.float32)
        )
        obs = obs * w[:, :, None]
    else:
        from tehmm_tpu.models.gauss import (
            GaussParams, gauss_log_likelihoods,
        )

        v_np = rng.randn(B, L, 2).astype(np.float32)
        v_np[rng.rand(B, L) < 0.1] = np.nan
        vals = jnp.asarray(v_np)
        gp = GaussParams(
            mu=jnp.asarray(rng.randn(S, 2).astype(np.float32)),
            log_var=jnp.zeros((S, 2), jnp.float32),
        )
        obs = obs + gauss_log_likelihoods(gp, vals)

    a = em_ops.em_sufficient_stats(
        params, sym, lens, engine="xla", obs_weights=w,
        gauss_params=gp, gauss_values=vals,
    )
    b = em_ops.em_sufficient_stats(
        params, sym, lens, engine="pallas", obs_weights=w,
        gauss_params=gp, gauss_values=vals,
    )
    assert abs(float(a.loglik) - float(b.loglik)) / abs(
        float(a.loglik)
    ) < 1e-5
    np.testing.assert_allclose(
        np.asarray(a.trans), np.asarray(b.trans), rtol=1e-3, atol=1e-3
    )

    want_p, _ = dp.viterbi(
        params.log_start, params.log_trans, obs, lens
    )
    got_p, _ = pk.viterbi_fused_pallas_v4(
        params.log_start, params.log_trans, params.log_em,
        sym, lens, w, gp, vals,
    )
    lens_np = np.asarray(lens)
    for bb in range(B):
        n = int(lens_np[bb])
        np.testing.assert_array_equal(
            np.asarray(got_p)[bb, :n], np.asarray(want_p)[bb, :n],
            err_msg=f"{mode} row {bb}",
        )


def test_seqpar_forward_loglik_on_chip(rng):
    """Exact sequence-parallel forward (parallel/seqpar, round-5) on a
    real-device mesh: operator composition == sequential scaled scan."""
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.parallel.mesh import make_data_mesh
    from tehmm_tpu.parallel.seqpar import forward_loglik_seqpar

    S, T, V, L = 20, 3, 6, 8192
    params = init_random(S, [V] * T, seed=2)
    sym = jnp.asarray(rng.randint(1, V, size=(1, L, T)), jnp.int32)
    obs = track_log_likelihoods(params.log_em, sym)[0]
    mesh = make_data_mesh()

    length = L - 37                   # padded tail must be masked out
    ll = float(forward_loglik_seqpar(
        params.log_start, params.log_trans, obs, length, mesh
    ))
    _, _, ll_ref = dp.forward_scaled(
        params.log_start, params.log_trans, obs[None],
        jnp.asarray([length]),
    )
    assert abs(ll - float(ll_ref[0])) < 1e-5 * abs(ll), (
        ll, float(ll_ref[0]))


def test_rle_transport_overflow_on_chip(rng):
    """Adversarial run-length transport: a decode whose paths switch
    state nearly every base overflows the RLE slot budget and must take
    the per-base fallback — output still bit-equal to the monolithic
    XLA decode (parallel/stitch._pack_for_transport round-5 contract)."""
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.parallel.stitch import _decode_batch

    S, T, V, B, L = 8, 2, 5, 6, 4096
    params = init_random(S, [V] * T, seed=4)
    sym_np = rng.randint(1, V, size=(B, L, T)).astype(np.int32)
    len_np = np.r_[np.full(B - 1, L), [L // 3]].astype(np.int32)

    got = _decode_batch(params, sym_np, len_np, rows_per_pass=3)

    obs = track_log_likelihoods(params.log_em, jnp.asarray(sym_np))
    ref, _ = dp.viterbi(
        params.log_start, params.log_trans, obs, jnp.asarray(len_np)
    )
    ref = np.asarray(ref)
    for b in range(B):
        n = int(len_np[b])
        np.testing.assert_array_equal(got[b, :n], ref[b, :n])


def test_fit_staging_cache_decode_on_chip(rng):
    """round-5: decode_tables on the tables fit() just trained on
    gathers from the retained device batch (no re-upload) — and must
    be bit-identical to the upload-path decode on the real chip."""
    from tehmm_tpu.io.trackdata import TrackTable

    S, T, V = 8, 3, 6
    L = 1 << 18
    sym = rng.randint(1, V, size=(L, T)).astype(np.uint8)
    tab = TrackTable("chr1", 0, L, sym)
    m = _mk_model(S, T, V, seed=5)
    m.fit([tab], max_iterations=2, convergence_tol=0.0,
          chunk_len=1024)
    assert m._prestaged_for([tab]) is not None
    cached, _ = m.decode_tables([tab], chunk_len=4096, halo=256)
    m.release_staging()
    fresh, _ = m.decode_tables([tab], chunk_len=4096, halo=256)
    np.testing.assert_array_equal(cached[0], fresh[0])
