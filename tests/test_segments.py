"""Segment-mode tests (reference: segmentTracks + --segment/--segLen flow;
SURVEY.md §3.4, §5 Long-context, hard part #5)."""

import numpy as np
import pytest

from tehmm_tpu.io import Track, TrackList, write_bed_intervals, \
    read_bed_intervals
from tehmm_tpu.io.segments import expand_path, load_segment_data
from tehmm_tpu.cli import train as cli_train
from tehmm_tpu.cli import eval as cli_eval
from tehmm_tpu.cli import segment_tracks as cli_seg


@pytest.fixture
def seg_fixture(tmp_path):
    """Blocky 2-symbol track: segments compress ~50x."""
    rng = np.random.RandomState(5)
    L = 4000
    truth = np.zeros(L, int)
    for s in range(300, L - 300, 800):
        truth[s : s + 250] = 1
    rows, pos = [], 0
    while pos < L:
        run = rng.randint(30, 80)
        end = min(pos + run, L)
        val = "X" if truth[pos] else "Y"
        rows.append(("chr1", pos, end, val))
        pos = end
    bed = str(tmp_path / "a.bed")
    write_bed_intervals(rows, bed)
    xml = tmp_path / "t.xml"
    xml.write_text(
        f'<teModelConfig><track name="a" path="{bed}"/></teModelConfig>'
    )
    regions = str(tmp_path / "r.bed")
    write_bed_intervals([("chr1", 0, L)], regions)
    return dict(dir=tmp_path, xml=str(xml), regions=regions,
                truth=truth, L=L)


class TestSegmentLoader:
    def test_load_and_expand(self, seg_fixture):
        f = seg_fixture
        segs = str(f["dir"] / "segs.bed")
        rc = cli_seg.main([f["xml"], f["regions"], segs])
        assert rc == 0
        tl = TrackList(f["xml"])
        seg_ivs = read_bed_intervals(segs, ncol=3)
        _td, tables = load_segment_data(tl, seg_ivs)
        (tab,) = tables
        assert len(tab) == len(seg_ivs)
        assert tab.seg_bounds[0] == 0 and tab.seg_bounds[-1] == f["L"]
        assert (tab.lengths > 0).all()
        # constant-value segments must carry the region's symbol
        sym_full = _td.tables[0].symbols
        for i in range(len(tab)):
            lo = tab.seg_bounds[i] - tab.start
            np.testing.assert_array_equal(
                tab.symbols[i], sym_full[lo]
            )
        # expand a fake path covers the whole span
        path = np.arange(len(tab)) % 2
        ivs = expand_path(tab, path, ["A", "B"])
        assert ivs[0][1] == 0 and ivs[-1][2] == f["L"]
        covered = sum(e - s for _, s, e, _ in ivs)
        assert covered == f["L"]


class TestSegmentPipeline:
    def test_segment_em_train_eval(self, seg_fixture):
        f = seg_fixture
        segs = str(f["dir"] / "segs.bed")
        cli_seg.main([f["xml"], f["regions"], segs])
        model = str(f["dir"] / "m.npz")
        rc = cli_train.main(
            [f["xml"], segs, model, "--segment", "--segLen",
             "--numStates", "2", "--iter", "30", "--seed", "4"]
        )
        assert rc == 0
        out = str(f["dir"] / "p.bed")
        rc = cli_eval.main(
            [f["xml"], model, segs, "--segment", "--segLen",
             "--bed", out]
        )
        assert rc == 0
        pred = np.full(f["L"], -1)
        for _c, s, e, n in read_bed_intervals(out, ncol=4):
            pred[s:e] = int(n)
        truth = f["truth"]
        acc = max((pred == truth).mean(), (pred == 1 - truth).mean())
        assert acc > 0.9, acc

    def test_segment_supervised_rejected(self, seg_fixture):
        f = seg_fixture
        with pytest.raises(SystemExit, match="segment"):
            cli_train.main(
                [f["xml"], f["regions"], str(f["dir"] / "x.npz"),
                 "--segment", "--supervised"]
            )

    def test_segment_maxpost_and_pd(self, seg_fixture):
        """--segment with --maxPost and --pd (reference: teHmmEval
        supports posterior decoding on segment-trained models): the
        max-posterior BED matches truth like the Viterbi one, and the
        --pd output has one normalized row per segment."""
        f = seg_fixture
        segs = str(f["dir"] / "segs2.bed")
        cli_seg.main([f["xml"], f["regions"], segs])
        model = str(f["dir"] / "m2.npz")
        rc = cli_train.main(
            [f["xml"], segs, model, "--segment", "--segLen",
             "--numStates", "2", "--iter", "30", "--seed", "4"]
        )
        assert rc == 0
        out = str(f["dir"] / "mp.bed")
        pd_out = str(f["dir"] / "pd.bed")
        rc = cli_eval.main(
            [f["xml"], model, segs, "--segment", "--segLen",
             "--maxPost", "--bed", out, "--pd", pd_out]
        )
        assert rc == 0
        pred = np.full(f["L"], -1)
        for _c, s, e, n in read_bed_intervals(out, ncol=4):
            pred[s:e] = int(n)
        truth = f["truth"]
        acc = max((pred == truth).mean(), (pred == 1 - truth).mean())
        assert acc > 0.9, acc
        # --pd: one row per segment, probabilities sum to 1
        rows = read_bed_intervals(pd_out, ncol=4)
        covered = sum(e - s for _c, s, e, _p in rows)
        assert covered == f["L"]
        for _c, _s, _e, p in rows[:20]:
            probs = np.fromstring(p, sep=",")
            assert abs(probs.sum() - 1.0) < 1e-3

    def test_exact_viterbi_with_weights_matches_monolithic(
        self, seg_fixture
    ):
        """viterbi_exact with segment weights == monolithic weighted
        decode (the exact fallback now covers segment mode too)."""
        import jax.numpy as jnp

        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.models.params import init_random
        from tehmm_tpu.ops import dp
        from tehmm_tpu.parallel.stitch import viterbi_exact

        rng = np.random.RandomState(5)
        S, T, V, L = 3, 2, 5, 300
        params = init_random(S, [V] * T, seed=2)
        sym = rng.randint(0, V, size=(L, T)).astype(np.int32)
        w = rng.randint(1, 7, size=L).astype(np.float32)
        obs = track_log_likelihoods(
            params.log_em, jnp.asarray(sym[None])
        ) * jnp.asarray(w)[None, :, None]
        want, _ = dp.viterbi(
            params.log_start, params.log_trans, obs
        )
        got = viterbi_exact(
            params, [sym], chunk_len=64, weight_arrays=[w]
        )
        np.testing.assert_array_equal(got[0], np.asarray(want[0]))
