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


class TestRound3ReviewRegressions:
    """Round-3 deep-review fixes (models/CLI layer)."""

    def test_exact_decoders_tolerate_empty_tables(self, rng):
        """A zero-length query record (start == end BED row) must not
        crash posterior_exact / viterbi_exact — they stacked row 0 of
        every table unconditionally."""
        import jax.numpy as jnp

        from tehmm_tpu.models.params import HmmParams
        from tehmm_tpu.parallel.stitch import (
            posterior_exact, viterbi_exact,
        )

        S = 2
        params = HmmParams(
            log_start=jnp.asarray(np.log([0.5, 0.5]).astype(np.float32)),
            log_trans=jnp.asarray(
                np.log([[0.9, 0.1], [0.1, 0.9]]).astype(np.float32)
            ),
            log_em=jnp.asarray(np.zeros((S, 1, 3), np.float32)),
        )
        syms = [
            (rng.randint(0, 2, size=(40, 1)) + 1).astype(np.uint8),
            np.zeros((0, 1), np.uint8),          # empty record
        ]
        for fn in (posterior_exact, viterbi_exact):
            out = fn(params, syms, chunk_len=16)
            assert len(out[0]) == 40 and len(out[1]) == 0, fn.__name__
        # all-empty batch
        out = viterbi_exact(params, [np.zeros((0, 1), np.uint8)])
        assert len(out[0]) == 0

    def test_path_to_intervals_empty_numpy_fallback(self, monkeypatch):
        from tehmm_tpu import native
        from tehmm_tpu.models.hmm import path_to_intervals

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        assert path_to_intervals(
            "chr1", 0, np.zeros(0, np.int32), ["a", "b"]
        ) == []

    def test_fix_em_freezes_gaussian_params(self, rng):
        """--fixEm freezes gaussian-track means/variances too — normal
        parameters ARE emission parameters (they silently kept
        training)."""
        import jax.numpy as jnp

        from tehmm_tpu.models.gauss import GaussParams, gauss_m_step

        old = GaussParams(
            mu=jnp.asarray([[1.0], [5.0]]),
            log_var=jnp.asarray([[0.0], [0.5]]),
        )
        gn = jnp.asarray([[10.0], [10.0]])
        gx = jnp.asarray([[30.0], [80.0]])
        gx2 = jnp.asarray([[100.0], [700.0]])
        fixed = gauss_m_step(
            gn, gx, gx2, old, fix_states=jnp.asarray([True, True])
        )
        np.testing.assert_allclose(np.asarray(fixed.mu),
                                   np.asarray(old.mu))
        np.testing.assert_allclose(np.asarray(fixed.log_var),
                                   np.asarray(old.log_var), atol=1e-6)
        free = gauss_m_step(
            gn, gx, gx2, old, fix_states=jnp.asarray([False, True])
        )
        assert abs(float(free.mu[0, 0]) - 3.0) < 1e-5      # refit
        assert abs(float(free.mu[1, 0]) - 5.0) < 1e-5      # frozen

    def test_init_em_prior_padding_keeps_unnamed_states(self, tmp_path):
        """--initModel resume + --initEmProbs growing an alphabet must
        not hand unnamed states probability mass on the new symbol
        (padding with log-prob 0.0 == probability 1 corrupted them)."""
        from tehmm_tpu.cli import train as cli_train
        from tehmm_tpu.io import write_bed_intervals
        from tehmm_tpu.models.params import load_model

        L = 200
        rows = [("chr1", i, i + 10, "A" if (i // 50) % 2 == 0 else "B")
                for i in range(0, L, 10)]
        bed = str(tmp_path / "t.bed")
        write_bed_intervals(rows, bed)
        xml = tmp_path / "t.xml"
        xml.write_text(
            f'<teModelConfig><track name="tr" path="{bed}"/>'
            "</teModelConfig>"
        )
        truth = str(tmp_path / "truth.bed")
        write_bed_intervals(
            [("chr1", 0, 100, "s0"), ("chr1", 100, L, "s1")], truth
        )
        m1 = str(tmp_path / "m1.npz")
        assert cli_train.main(
            [str(xml), truth, m1, "--supervised",
             "--logLevel", "ERROR"]
        ) == 0
        p1, meta1, _ = load_model(m1)
        # resume with a prior that names ONLY s0 and introduces a brand
        # new symbol value "C"
        prior = tmp_path / "em.txt"
        prior.write_text("s0\ttr\tC\t0.5\n")
        m2 = str(tmp_path / "m2.npz")
        assert cli_train.main(
            [str(xml), truth, m2, "--supervised",
             "--initModel", m1, "--initEmProbs", str(prior),
             "--iter", "0", "--logLevel", "ERROR"]
        ) == 0
        p2, meta2, _ = load_model(m2)
        names = meta2["state_names"]
        s1 = names.index("s1")
        v1 = np.exp(np.asarray(p1.log_em, np.float64))
        v2 = np.exp(np.asarray(p2.log_em, np.float64))
        # s1 was not named by the prior: its real-symbol distribution
        # must be unchanged (up to the shared renormalization) and the
        # new symbol's probability ~0
        old_real = v1[s1, 0, 1:v1.shape[2]]
        new_real = v2[s1, 0, 1:v1.shape[2]]
        np.testing.assert_allclose(new_real, old_real, atol=1e-4)
        if v2.shape[2] > v1.shape[2]:
            assert v2[s1, 0, v1.shape[2]:].max() < 1e-4

    def test_segment_exact_and_path_score(self, tmp_path, rng):
        """--segment honors --exact, and segment Viterbi prints the
        PATH's joint log-prob like base-resolution eval (it printed the
        forward total)."""
        import io as _io
        from contextlib import redirect_stdout

        from tehmm_tpu.cli import eval as cli_eval
        from tehmm_tpu.cli import segment_tracks as cli_seg
        from tehmm_tpu.cli import train as cli_train
        from tehmm_tpu.io import write_bed_intervals

        L = 300
        rows = [("chr1", i, i + 10, "X" if 100 <= i < 200 else "Y")
                for i in range(0, L, 10)]
        bed = str(tmp_path / "a.bed")
        write_bed_intervals(rows, bed)
        xml = tmp_path / "t.xml"
        xml.write_text(
            f'<teModelConfig><track name="a" path="{bed}"/>'
            "</teModelConfig>"
        )
        truth = str(tmp_path / "truth.bed")
        write_bed_intervals(
            [("chr1", 0, 100, "BG"), ("chr1", 100, 200, "TE"),
             ("chr1", 200, L, "BG")], truth)
        regions = str(tmp_path / "r.bed")
        write_bed_intervals([("chr1", 0, L)], regions)
        segs = str(tmp_path / "segs.bed")
        assert cli_seg.main([str(xml), regions, segs]) == 0
        model = str(tmp_path / "m.npz")
        assert cli_train.main(
            [str(xml), segs, model, "--segment", "--numStates", "2",
             "--iter", "5", "--seed", "0", "--logLevel", "ERROR"]
        ) == 0

        def run(extra):
            buf = _io.StringIO()
            with redirect_stdout(buf):
                rc = cli_eval.main(
                    [str(xml), model, segs, "--segment",
                     "--bed", str(tmp_path / "o.bed"),
                     "--logLevel", "ERROR"] + extra
                )
            assert rc == 0
            return float(buf.getvalue().strip().splitlines()[-1])

        s_heur = run([])
        s_exact = run(["--exact"])
        # identical decodes -> identical PATH joint scores; and the
        # joint must differ from the forward total (strictly less,
        # since it is one path's share of the likelihood)
        assert abs(s_heur - s_exact) < 1e-6 * max(1.0, abs(s_heur))
        buf = _io.StringIO()
        with redirect_stdout(buf):
            assert cli_eval.main(
                [str(xml), model, segs, "--segment",
                 "--logLevel", "ERROR"]
            ) == 0
        forward_total = float(buf.getvalue().strip().splitlines()[-1])
        assert s_heur < forward_total
