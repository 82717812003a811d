"""Edge-case robustness: empty inputs, out-of-range queries, degenerate
models, malformed files."""

import numpy as np
import pytest

from tehmm_tpu.io import (
    Track,
    TrackList,
    load_track_data,
    read_bed_intervals,
    write_bed_intervals,
)
from tehmm_tpu.io.bed import parse_bed_line
from tehmm_tpu.io.fasta import FastaFile


class TestBedEdgeCases:
    def test_malformed_line_raises(self):
        with pytest.raises(ValueError, match="malformed"):
            parse_bed_line("chr1\t100")

    def test_empty_file(self, tmp_path):
        p = tmp_path / "e.bed"
        p.write_text("")
        assert read_bed_intervals(str(p)) == []

    def test_space_separated_fallback(self):
        rec = parse_bed_line("chr1 10 20 name")
        assert (rec.chrom, rec.start, rec.end, rec.name) == \
            ("chr1", 10, 20, "name")


class TestTrackDataEdgeCases:
    def test_empty_track_file(self, tmp_path):
        bed = tmp_path / "empty.bed"
        bed.write_text("")
        tl = TrackList()
        tl.add(Track(name="a", path=str(bed)))
        td = load_track_data(tl, [("chr1", 0, 50)])
        assert (td.tables[0].symbols == 0).all()  # all missing

    def test_query_beyond_data(self, tmp_path):
        bed = tmp_path / "a.bed"
        write_bed_intervals([("chr1", 0, 10, "A")], str(bed))
        tl = TrackList()
        tl.add(Track(name="a", path=str(bed)))
        td = load_track_data(tl, [("chr1", 5, 100)])
        sym = td.tables[0].symbols[:, 0]
        assert (sym[:5] != 0).all()
        assert (sym[5:] == 0).all()

    def test_unknown_chrom_query(self, tmp_path):
        bed = tmp_path / "a.bed"
        write_bed_intervals([("chr1", 0, 10, "A")], str(bed))
        tl = TrackList()
        tl.add(Track(name="a", path=str(bed)))
        td = load_track_data(tl, [("chrUn", 0, 20)])
        assert (td.tables[0].symbols == 0).all()


class TestFastaEdgeCases:
    def test_empty_sequence(self, tmp_path):
        p = tmp_path / "g.fa"
        p.write_text(">chr1\n>chr2\nACGT\n")
        fa = FastaFile(str(p))
        assert fa.length("chr1") == 0
        assert fa.fetch("chr1", 0, 10) == ""
        assert fa.fetch("chr2", 0, 4) == "ACGT"

    def test_missing_sequence_raises(self, tmp_path):
        p = tmp_path / "g.fa"
        p.write_text(">chr1\nACGT\n")
        fa = FastaFile(str(p))
        with pytest.raises(KeyError):
            fa.fetch("nope", 0, 4)


class TestDegenerateModels:
    def test_single_state_hmm(self, rng):
        import jax.numpy as jnp

        from tehmm_tpu.models.params import HmmParams, init_flat
        from tehmm_tpu.ops import dp, em

        params = init_flat(1, [3])
        sym = jnp.asarray(rng.randint(1, 3, size=(1, 30, 1)))
        new_params, ll = em.em_step(params, sym, jnp.asarray([3]))
        assert np.isfinite(float(ll))
        from tehmm_tpu.models.emission import track_log_likelihoods

        obs = track_log_likelihoods(new_params.log_em, sym)
        path, _ = dp.viterbi(
            new_params.log_start, new_params.log_trans, obs
        )
        assert (np.asarray(path) == 0).all()

    def test_all_missing_observations(self, rng):
        """Positions that are missing on every track carry no evidence;
        decode must still work (prior-driven path)."""
        import jax.numpy as jnp

        from tehmm_tpu.models.params import init_flat
        from tehmm_tpu.models.emission import track_log_likelihoods
        from tehmm_tpu.ops import dp

        params = init_flat(3, [4])
        sym = jnp.zeros((1, 20, 1), jnp.int32)  # all missing
        obs = track_log_likelihoods(params.log_em, sym)
        np.testing.assert_array_equal(np.asarray(obs), 0.0)
        path, score = dp.viterbi(
            params.log_start, params.log_trans, obs
        )
        assert np.isfinite(float(score[0]))


class TestCliErrors:
    def test_eval_track_mismatch(self, tmp_path):
        from tehmm_tpu.cli import eval as cli_eval
        from tehmm_tpu.cli import train as cli_train

        bed = tmp_path / "a.bed"
        write_bed_intervals(
            [("chr1", 0, 100, "X"), ("chr1", 100, 200, "Y")], str(bed)
        )
        xml = tmp_path / "t.xml"
        xml.write_text(
            f'<teModelConfig><track name="a" path="{bed}"/>'
            "</teModelConfig>"
        )
        truth = tmp_path / "truth.bed"
        write_bed_intervals(
            [("chr1", 0, 100, "BG"), ("chr1", 100, 200, "TE")],
            str(truth),
        )
        model = str(tmp_path / "m.npz")
        cli_train.main([str(xml), str(truth), model, "--supervised"])
        # eval with an XML missing the model's track must fail clearly
        xml2 = tmp_path / "t2.xml"
        xml2.write_text(
            f'<teModelConfig><track name="other" path="{bed}"/>'
            "</teModelConfig>"
        )
        regions = tmp_path / "r.bed"
        write_bed_intervals([("chr1", 0, 200)], str(regions))
        with pytest.raises(SystemExit, match="missing"):
            cli_eval.main([str(xml2), model, str(regions)])

    def test_bad_xml_root(self, tmp_path):
        p = tmp_path / "bad.xml"
        p.write_text("<wrong><track name='a' path='x'/></wrong>")
        with pytest.raises(ValueError, match="teModelConfig"):
            TrackList(str(p))
