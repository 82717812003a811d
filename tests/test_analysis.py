"""Parameter-analysis tests (reference: parameterAnalysis.py graphics)."""

import os

import numpy as np

from tehmm_tpu import analysis


def _log_em(S=4, T=2, V=5, seed=0):
    rng = np.random.RandomState(seed)
    log_em = np.zeros((S, T, V), np.float32)
    for t in range(T):
        p = rng.dirichlet(np.ones(V - 1), size=S)
        log_em[:, t, 1:] = np.log(p)
    return log_em


class TestAnalysis:
    def test_cluster_orders_all_states(self):
        le = _log_em()
        res = analysis.hierarchical_cluster_states(le)
        assert sorted(res["order"]) == [0, 1, 2, 3]
        assert res["linkage"].shape == (3, 4)

    def test_identical_states_cluster_together(self):
        le = _log_em(S=4)
        le[3] = le[0]  # state 3 == state 0
        res = analysis.hierarchical_cluster_states(le)
        order = res["order"]
        assert abs(order.index(0) - order.index(3)) == 1

    def test_pca_shape(self):
        xy = analysis.pca_states(_log_em(), 2)
        assert xy.shape == (4, 2)

    def test_plots_write_files(self, tmp_path):
        le = _log_em()
        names = ["a", "b", "c", "d"]
        p1 = str(tmp_path / "em.png")
        analysis.plot_emission_heatmap(le, names, ["t0", "t1"], p1)
        p2 = str(tmp_path / "tr.png")
        analysis.plot_transition_graph(
            np.log(np.full((4, 4), 0.25, np.float32)), names, p2
        )
        p3 = str(tmp_path / "pca.png")
        analysis.plot_state_pca(le, names, p3)
        for p in (p1, p2, p3):
            assert os.path.getsize(p) > 1000
