"""Dispatcher, profiling, weighted sharded EM, benchmark harness tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tehmm_tpu.__main__ import main as dispatch_main


class TestDispatcher:
    def test_help_lists_tools(self, capsys):
        assert dispatch_main(["--help"]) == 0
        out = capsys.readouterr().out
        assert "train" in out and "compare-bed-states" in out

    def test_unknown_tool(self, capsys):
        assert dispatch_main(["nonsense"]) == 2

    def test_dispatch_runs_tool(self, tmp_path, capsys):
        bed = tmp_path / "x.bed"
        bed.write_text("c\t0\t10\tA\n")
        rc = dispatch_main(["bed-tools", "stats", str(bed)])
        assert rc == 0
        assert "A" in capsys.readouterr().out


class TestProfiling:
    def test_stage_timer(self):
        from tehmm_tpu.utils.profiling import StageTimer

        st = StageTimer()
        with st.stage("a"):
            pass
        with st.stage("a"):
            pass
        rep = st.report(positions=100, num_states=4)
        assert "a" in rep["stages_seconds"]
        assert rep["cell_updates_per_sec"] > 0

    def test_trace_noop(self):
        from tehmm_tpu.utils.profiling import trace

        with trace(None):
            pass


class TestWeightedEm:
    def test_weights_scale_emission_counts(self, rng, make_hmm):
        from tehmm_tpu.models.params import HmmParams
        from tehmm_tpu.ops import em

        S, T, V, L = 3, 1, 4, 40
        log_start, log_trans, log_em = make_hmm(S, T, V)
        params = HmmParams(
            log_start=jnp.asarray(log_start, jnp.float32),
            log_trans=jnp.asarray(log_trans, jnp.float32),
            log_em=jnp.asarray(log_em, jnp.float32),
        )
        sym = jnp.asarray(rng.randint(1, V, size=(1, L, T)))
        ones = jnp.ones((1, L), jnp.float32)
        s_plain = em.em_sufficient_stats(params, sym)
        s_ones = em.em_sufficient_stats(params, sym, obs_weights=ones)
        np.testing.assert_allclose(
            np.asarray(s_plain.em), np.asarray(s_ones.em), rtol=1e-6
        )
        # weight 2 everywhere: emission counts double; gamma unchanged in
        # total mass per position so em sums to 2 * positions
        twos = ones * 2
        s_twos = em.em_sufficient_stats(params, sym, obs_weights=twos)
        np.testing.assert_allclose(
            float(np.asarray(s_twos.em).sum()), 2.0 * L * T, rtol=1e-4
        )

    def test_sharded_weighted_matches_local(self, rng, make_hmm):
        from tehmm_tpu.models.params import HmmParams
        from tehmm_tpu.ops import em
        from tehmm_tpu.parallel import make_data_mesh, sharded_em_stats

        S, T, V, L, B = 3, 1, 4, 32, 8
        log_start, log_trans, log_em = make_hmm(S, T, V)
        params = HmmParams(
            log_start=jnp.asarray(log_start, jnp.float32),
            log_trans=jnp.asarray(log_trans, jnp.float32),
            log_em=jnp.asarray(log_em, jnp.float32),
        )
        sym = jnp.asarray(rng.randint(1, V, size=(B, L, T)))
        lens = jnp.full((B,), L, jnp.int32)
        w = jnp.asarray(rng.uniform(1, 3, size=(B, L)).astype(np.float32))
        mesh = make_data_mesh(8)
        want = em.em_sufficient_stats(params, sym, lens, obs_weights=w)
        got = sharded_em_stats(params, sym, lens, mesh, obs_weights=w)
        np.testing.assert_allclose(
            np.asarray(got.em), np.asarray(want.em), rtol=1e-4, atol=1e-5
        )


class TestBenchmarkHarness:
    def test_benchmark_two_configs(self, tmp_path, capsys):
        from tehmm_tpu.cli import benchmark as cli_bench
        from tehmm_tpu.io import write_bed_intervals

        rng = np.random.RandomState(0)
        L = 1200
        truth = np.zeros(L, int)
        truth[300:600] = 1
        rows = [
            ("chr1", i, i + 20,
             "X" if (truth[i] and rng.rand() < 0.9) or
                    (not truth[i] and rng.rand() < 0.1) else "Y")
            for i in range(0, L, 20)
        ]
        bed = str(tmp_path / "a.bed")
        write_bed_intervals(rows, bed)
        xml = tmp_path / "t.xml"
        xml.write_text(
            f'<teModelConfig><track name="a" path="{bed}"/>'
            "</teModelConfig>"
        )
        truth_rows = [("chr1", 0, 300, "BG"), ("chr1", 300, 600, "TE"),
                      ("chr1", 600, L, "BG")]
        tb = str(tmp_path / "truth.bed")
        write_bed_intervals(truth_rows, tb)
        rb = str(tmp_path / "r.bed")
        write_bed_intervals([("chr1", 0, L)], rb)
        out = str(tmp_path / "out")
        rc = cli_bench.main([
            str(xml), tb, rb, out,
            "--config", "sup:--supervised",
            "--config", "em2:--numStates 2 --iter 10 --seed 1",
        ])
        assert rc == 0
        summary = json.load(open(os.path.join(out, "summary.json")))
        assert {r["name"] for r in summary} == {"sup", "em2"}
        sup = next(r for r in summary if r["name"] == "sup")
        assert sup["base_accuracy"] > 0.8

    def test_benchmark_parallel_processes(self, tmp_path):
        """--numProcesses runs configs in worker processes and keeps
        summary order (round-1 review: harness was sequential-only)."""
        from tehmm_tpu.cli import benchmark as cli_bench
        from tehmm_tpu.io import write_bed_intervals

        L = 400
        rows = [("chr1", i, i + 20, "X" if 100 <= i < 200 else "Y")
                for i in range(0, L, 20)]
        bed = str(tmp_path / "a.bed")
        write_bed_intervals(rows, bed)
        xml = tmp_path / "t.xml"
        xml.write_text(
            f'<teModelConfig><track name="a" path="{bed}"/>'
            "</teModelConfig>"
        )
        tb = str(tmp_path / "truth.bed")
        write_bed_intervals(
            [("chr1", 0, 100, "BG"), ("chr1", 100, 200, "TE"),
             ("chr1", 200, L, "BG")], tb)
        rb = str(tmp_path / "r.bed")
        write_bed_intervals([("chr1", 0, L)], rb)
        out = str(tmp_path / "outp")
        rc = cli_bench.main([
            str(xml), tb, rb, out,
            "--config", "sup:--supervised",
            "--config", "em2:--numStates 2 --iter 3",
            "--numProcesses", "2",
        ])
        assert rc == 0
        summary = json.load(open(os.path.join(out, "summary.json")))
        assert [r["name"] for r in summary] == ["sup", "em2"]
        assert all("error" not in r for r in summary), summary
