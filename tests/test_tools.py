"""Tests for the evaluation / BED-wrangling / segmentation tool suite
(reference script parity: compareBedStates, fitStateNames, addBedGaps,
removeBedOverlaps, chunkBedRegions, addBedColors, bedStats,
segmentTracks, setTrackScaling; SURVEY.md §2b)."""

import numpy as np
import pytest

from tehmm_tpu.cli.compare_bed_states import (
    base_level_confusion,
    base_level_prf,
    compare_bed_files,
    interval_level_prf,
)
from tehmm_tpu.cli.fit_state_names import fit_names
from tehmm_tpu.cli.bed_tools import (
    add_bed_gaps,
    remove_bed_overlaps,
    chunk_bed_regions,
    add_bed_colors,
    bed_stats,
)
from tehmm_tpu.cli.segment_tracks import segment_table
from tehmm_tpu.cli.set_track_scaling import choose_scaling
from tehmm_tpu.io import write_bed_intervals
from tehmm_tpu.io.category import bin_value


class TestCompareBedStates:
    def test_base_confusion_exact(self):
        truth = [("c", 0, 100, "A"), ("c", 100, 200, "B")]
        pred = [("c", 0, 90, "A"), ("c", 90, 200, "B")]
        conf = base_level_confusion(truth, pred)
        assert conf == {("A", "A"): 90, ("A", "B"): 10, ("B", "B"): 100}
        prf = base_level_prf(conf)
        assert prf["A"]["recall"] == 0.9
        assert prf["A"]["precision"] == 1.0
        assert prf["B"]["precision"] == pytest.approx(100 / 110)

    def test_interval_level_with_slack(self):
        """A match requires OVERLAP and both boundaries within slack —
        uniformly, so the metric is monotone in the tolerance (round-3
        review: slack=0 used to accept ANY overlap and slack>0 dropped
        the overlap requirement, so slack=1 was stricter than
        slack=0)."""
        truth = [("c", 0, 100, "A"), ("c", 200, 300, "A")]
        pred = [("c", 5, 95, "A"), ("c", 400, 500, "A")]
        res_strict = interval_level_prf(truth, pred, slack=0)
        assert res_strict["A"]["recall"] == 0.0  # boundaries off by 5
        res_slack = interval_level_prf(truth, pred, slack=5)
        assert res_slack["A"]["recall"] == 0.5  # second truth still missed
        assert res_slack["A"]["precision"] == 0.5
        truth2 = [("c", 0, 100, "A")]
        pred2 = [("c", 3, 97, "A")]
        assert interval_level_prf(truth2, pred2, slack=5)["A"]["f1"] == 1.0
        assert interval_level_prf(truth2, pred2, slack=1)["A"]["f1"] == 0.0
        # exact match at slack=0
        assert interval_level_prf(truth2, truth2, slack=0)["A"]["f1"] == 1.0
        # monotone: widening the tolerance never loses matches
        prev = 0.0
        for sl in (0, 1, 3, 5, 50):
            r = interval_level_prf(truth, pred, slack=sl)["A"]["recall"]
            assert r >= prev
            prev = r
        # slack never excuses a missing overlap
        assert interval_level_prf(
            [("c", 100, 103, "A")], [("c", 104, 107, "A")], slack=5
        )["A"]["f1"] == 0.0

    def test_base_confusion_counts_uncovered_truth(self):
        """Truth bases with no prediction count against recall and
        accuracy (they used to vanish from every denominator, so a 1%
        prediction could score recall 1.0), and self-overlapping input
        is painted to disjoint runs first."""
        truth = [("c", 0, 1000, "TE")]
        pred = [("c", 0, 10, "TE")]
        conf = base_level_confusion(truth, pred)
        assert conf == {("TE", "TE"): 10, ("TE", None): 990}
        prf = base_level_prf(conf)
        assert prf["TE"]["recall"] == pytest.approx(0.01)
        # self-overlap: later record overwrites earlier (painting)
        truth2 = [("c", 0, 100, "A"), ("c", 50, 60, "B")]
        pred2 = [("c", 50, 60, "X")]
        conf2 = base_level_confusion(truth2, pred2)
        assert conf2[("B", "X")] == 10
        assert ("A", "X") not in conf2

    def test_compare_files_end_to_end(self, tmp_path):
        t = str(tmp_path / "t.bed")
        p = str(tmp_path / "p.bed")
        write_bed_intervals([("c", 0, 10, "X")], t)
        write_bed_intervals([("c", 0, 10, "X")], p)
        res = compare_bed_files(t, p)
        assert res["base_accuracy"] == 1.0
        assert res["base"]["X"]["f1"] == 1.0


class TestFitStateNames:
    def test_greedy_mapping(self):
        truth = [("c", 0, 100, "TE"), ("c", 100, 300, "BG")]
        pred = [("c", 0, 95, "1"), ("c", 95, 300, "0")]
        mapping = fit_names(truth, pred)
        assert mapping == {"0": "BG", "1": "TE"}

    def test_unmatched_keeps_name(self):
        truth = [("c", 0, 100, "TE")]
        pred = [("c", 0, 100, "0"), ("c", 100, 200, "9")]
        mapping = fit_names(truth, pred)
        assert mapping["0"] == "TE"
        assert "9" not in mapping


class TestBedTools:
    def test_add_gaps(self):
        ivs = [("c", 10, 20, "A"), ("c", 30, 40, "B")]
        out = add_bed_gaps(ivs, "BG", regions=[("c", 0, 50)])
        assert out == [
            ("c", 0, 10, "BG"), ("c", 10, 20, "A"),
            ("c", 20, 30, "BG"), ("c", 30, 40, "B"),
            ("c", 40, 50, "BG"),
        ]

    def test_remove_overlaps_first_wins(self):
        ivs = [("c", 0, 100, "A"), ("c", 50, 150, "B")]
        out = remove_bed_overlaps(ivs, mode="first")
        assert out == [("c", 0, 100, "A"), ("c", 100, 150, "B")]
        out = remove_bed_overlaps(ivs, mode="last")
        assert out == [("c", 0, 50, "A"), ("c", 50, 150, "B")]

    def test_remove_overlaps_nested(self):
        ivs = [("c", 0, 100, "A"), ("c", 20, 30, "B")]
        assert remove_bed_overlaps(ivs, "first") == [("c", 0, 100, "A")]
        assert remove_bed_overlaps(ivs, "last") == [
            ("c", 0, 20, "A"), ("c", 20, 30, "B"), ("c", 30, 100, "A")
        ]

    def test_chunk_regions(self):
        out = chunk_bed_regions([("c", 0, 250, "x")], 100)
        assert out == [
            ("c", 0, 100, "x"), ("c", 100, 200, "x"), ("c", 200, 250, "x")
        ]

    def test_add_colors_stable(self):
        out = add_bed_colors([("c", 0, 10, "TE"), ("c", 10, 20, "TE")])
        assert out[0][8] == out[1][8]
        assert len(out[0]) == 9

    def test_bed_stats(self):
        stats = bed_stats(
            [("c", 0, 10, "A"), ("c", 20, 50, "A"), ("c", 0, 5, "B")]
        )
        assert stats["A"]["count"] == 2
        assert stats["A"]["total_bases"] == 40
        assert stats["B"]["mean_len"] == 5


class TestSegmentTracks:
    def test_segment_boundaries(self):
        sym = np.array(
            [[1, 1], [1, 1], [2, 1], [2, 1], [2, 2], [1, 1]], np.uint8
        )
        assert segment_table(sym, thresh=0) == [
            (0, 2), (2, 4), (4, 5), (5, 6)
        ]
        # thresh=1 tolerates single-track changes; only the 2-track jump
        # at position 5 forces a boundary
        assert segment_table(sym, thresh=1) == [(0, 5), (5, 6)]

    def test_empty(self):
        assert segment_table(np.zeros((0, 2), np.uint8)) == []


class TestTrackScaling:
    def test_small_int_range_passthrough(self):
        attrs = choose_scaling(np.array([0.0, 1, 2, 3]), 10)
        assert attrs == {"scale": 1.0}

    def test_linear_binning_bounds(self):
        vals = np.random.RandomState(0).uniform(0, 50, 1000)
        attrs = choose_scaling(vals, 10)
        assert "scale" in attrs
        binned = {
            bin_value(v, scale=attrs["scale"],
                      shift=attrs.get("shift", 0.0))
            for v in vals
        }
        assert len(binned) <= 10

    def test_log_binning_bounds(self):
        vals = np.random.RandomState(0).lognormal(0, 4, 1000)
        attrs = choose_scaling(vals, 12)
        assert "logScale" in attrs
        binned = {
            bin_value(v, log_scale=attrs["logScale"],
                      shift=attrs.get("shift", 0.0))
            for v in vals
        }
        assert len(binned) <= 13  # floor boundary effect allows one extra

    def test_non_numeric_none(self):
        assert choose_scaling(np.array([]), 10) is None


class TestTsdFinder:
    def test_planted_tsd_found(self, tmp_path):
        from tehmm_tpu.cli.tsd_finder import find_tsd
        from tehmm_tpu.io.fasta import FastaFile

        seq = list("GATTACA" * 15)[:100]
        seq[25:30] = "ACGTT"
        seq[60:65] = "ACGTT"
        p = tmp_path / "g.fa"
        p.write_text(">chr1\n" + "".join(seq) + "\n")
        fa = FastaFile(str(p))
        hit = find_tsd(fa, "chr1", 30, 60, min_len=4, max_len=6)
        assert hit == ((25, 30), (60, 65))

    def test_no_shared_sequence_gives_none(self, tmp_path):
        from tehmm_tpu.cli.tsd_finder import find_tsd
        from tehmm_tpu.io.fasta import FastaFile

        # flanks share no >= 4-mer: no TSD may be reported
        seq = list("A" * 100)
        seq[15:30] = "ACACACACACACACA"   # left flank: AC repeat
        seq[60:75] = "GTGTGTGTGTGTGTG"   # right flank: GT repeat
        p = tmp_path / "g.fa"
        p.write_text(">chr1\n" + "".join(seq) + "\n")
        fa = FastaFile(str(p))
        assert find_tsd(fa, "chr1", 30, 60, 4, 6) is None

    def test_kmer_table_extension(self):
        from tehmm_tpu.kmer import KmerTable

        t = KmerTable("AAACGTACGAAA", 3)
        matches = t.best_matches("TTACGTACGTT")
        subject_start, query_start, length = matches[0]
        assert t.subject[subject_start:subject_start + length] == \
            "ACGTACG"
        assert length == 7


class TestTrackRanking:
    def _fixture(self, tmp_path):
        from tehmm_tpu.io import write_bed_intervals

        L = 120
        truth = [("chr1", 0, 50, "BG"), ("chr1", 50, 80, "TE"),
                 ("chr1", 80, 120, "BG")]
        # informative track mirrors the truth; noise track is constant
        good, noise = [], []
        for c, s, e, n in truth:
            for i in range(s, e, 10):
                good.append((c, i, min(i + 10, e),
                             "X" if n == "TE" else "Y"))
                noise.append((c, i, min(i + 10, e), "Z"))
        gb, nb = str(tmp_path / "good.bed"), str(tmp_path / "noise.bed")
        write_bed_intervals(good, gb)
        write_bed_intervals(noise, nb)
        xml = tmp_path / "t.xml"
        xml.write_text(
            "<teModelConfig>"
            f'<track name="good" path="{gb}"/>'
            f'<track name="noise" path="{nb}"/>'
            "</teModelConfig>"
        )
        truth_bed = str(tmp_path / "truth.bed")
        write_bed_intervals(truth, truth_bed)
        regions = str(tmp_path / "r.bed")
        write_bed_intervals([("chr1", 0, L)], regions)
        return str(xml), truth_bed, regions

    def test_ranks_informative_track_first(self, tmp_path):
        import json

        from tehmm_tpu.cli import track_ranking

        xml, truth_bed, regions = self._fixture(tmp_path)
        out = str(tmp_path / "out")
        assert track_ranking.main(
            [xml, truth_bed, regions, out, "--maxTracks", "1"]
        ) == 0
        hist = json.load(open(f"{out}/ranking.json"))
        assert hist[0]["track"] == "good"
        assert hist[0]["base_accuracy"] > 0.9

    def test_parallel_candidates_match_sequential(self, tmp_path):
        import json

        from tehmm_tpu.cli import track_ranking

        xml, truth_bed, regions = self._fixture(tmp_path)
        seq, par = str(tmp_path / "seq"), str(tmp_path / "par")
        assert track_ranking.main(
            [xml, truth_bed, regions, seq, "--maxTracks", "1"]
        ) == 0
        assert track_ranking.main(
            [xml, truth_bed, regions, par, "--maxTracks", "1",
             "--numProcesses", "2"]
        ) == 0
        h_seq = json.load(open(f"{seq}/ranking.json"))
        h_par = json.load(open(f"{par}/ranking.json"))
        assert h_seq == h_par


class TestRound3EvalLayerRegressions:
    def test_choose_scaling_bins_continuous_small_range(self):
        """Continuous values in [0, 1) must get a real scale — flooring
        first made them 'already binned' and collapsed the track to one
        symbol (round-3 review)."""
        import numpy as np

        from tehmm_tpu.cli.set_track_scaling import choose_scaling

        rng = np.random.RandomState(0)
        vals = rng.rand(1000)
        attrs = choose_scaling(vals, 10)
        assert attrs and ("logScale" in attrs or attrs["scale"] > 1.0)
        # binning with the chosen attrs must produce > 2 symbols
        scale = attrs.get("scale")
        shift = attrs.get("shift", 0.0)
        if scale:
            binned = np.floor((vals + shift) * scale)
        else:
            import math
            binned = np.floor(
                np.log(vals + shift) / math.log(attrs["logScale"])
            )
        assert len(np.unique(binned)) > 2
        # integers already within budget stay unscaled
        assert choose_scaling(
            np.asarray([0.0, 1.0, 3.0]), 10
        ) == {"scale": 1.0}
        import pytest

        with pytest.raises(ValueError, match="numBins"):
            choose_scaling(vals, 1)

    def test_segment_table_splits_on_gaussian_values(self):
        """Gaussian-track value changes create segment boundaries (their
        symbols column is all-missing, so segmentation used to merge
        different observations into one segment)."""
        import numpy as np

        from tehmm_tpu.cli.segment_tracks import segment_table

        symbols = np.zeros((6, 1), np.int32)       # all-missing column
        values = np.asarray(
            [[1.0], [1.0], [2.5], [2.5], [np.nan], [np.nan]],
            np.float32,
        )
        assert segment_table(symbols, 0, values) == [
            (0, 2), (2, 4), (4, 6)
        ]
        # without values: one segment (unchanged behavior)
        assert segment_table(symbols, 0) == [(0, 6)]
