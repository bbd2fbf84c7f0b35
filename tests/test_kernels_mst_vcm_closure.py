"""MST / VCM / closure / temporal-filter kernel oracles.

MST cases mirror /root/reference/tests/test_mst.py:34-117 (all-valid,
partial-NaN, all-NaN stacks) with networkx as the test-side oracle
(the reference uses networkx in production; we only use it in tests).
Closure loop oracles from tests/phase_closure/test_collect_loops.py.
VCM pattern semantics from pyrate/core/covariance.py:286-309.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from pyrate_spark.kernels.mst import (kruskal_mst_edges, mst_select,
                                      mst_select_pixel, mst_stats)
from pyrate_spark.kernels.vcm import vcm_pattern, get_vcmt
from pyrate_spark.kernels.closure import (closed_loops, dedupe_loops,
                                          find_loops,
                                          discard_loops_containing_max_ifg_count,
                                          sum_closure)
from pyrate_spark.kernels.tempfilter import temporal_high_pass, \
    gaussian_temporal_filter

networkx = pytest.importorskip("networkx")


def _random_network(rng, nepochs=8, nedges=14):
    pairs = set()
    while len(pairs) < nedges:
        a, b = rng.randint(0, nepochs, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    first = [p[0] for p in pairs]
    second = [p[1] for p in pairs]
    weight = rng.rand(len(pairs)).round(3).tolist()
    return first, second, weight


class TestMST:
    def test_matches_networkx(self):
        rng = np.random.RandomState(7)
        for trial in range(20):
            f, s, w = _random_network(rng)
            g = networkx.Graph()
            g.add_weighted_edges_from(zip(f, s, w))
            nx_edges = {(min(a, b), max(a, b))
                        for a, b in networkx.minimum_spanning_tree(g).edges()}
            ours, _ = kruskal_mst_edges(f, s, w)
            assert ours == nx_edges, f"trial {trial}"

    def test_all_valid_uses_global(self):
        f = [0, 0, 1, 2]
        s = [1, 2, 2, 3]
        w = [0.1, 0.9, 0.2, 0.3]
        vals = np.array([1.0, 2.0, 3.0, 4.0])
        sel = mst_select_pixel(vals, f, s, w)
        # MST: (0,1) w=.1, (1,2) w=.2, (2,3) w=.3 — edge (0,2) dropped
        assert sel.tolist() == [True, False, True, True]

    def test_partial_nan_recomputes(self):
        f = [0, 0, 1, 2]
        s = [1, 2, 2, 3]
        w = [0.1, 0.9, 0.2, 0.3]
        vals = np.array([np.nan, 2.0, 3.0, 4.0])
        sel = mst_select_pixel(vals, f, s, w)
        # without edge (0,1): MST over remaining = (0,2),(1,2),(2,3)
        assert sel.tolist() == [False, True, True, True]

    def test_all_nan(self):
        sel = mst_select_pixel(np.array([np.nan, np.nan]), [0, 1], [1, 2],
                               [0.1, 0.2])
        assert not sel.any()

    def test_stats_tree_vs_forest(self):
        n_edges, is_tree, ncomp = mst_stats([0, 1], [1, 2], [0.1, 0.1])
        assert (n_edges, is_tree, ncomp) == (2, True, 1)
        # disconnected: 0-1, 2-3
        n_edges, is_tree, ncomp = mst_stats([0, 2], [1, 3], [0.1, 0.1])
        assert (n_edges, is_tree, ncomp) == (2, False, 2)


class TestVCM:
    def test_pattern_values(self):
        # ifgs: (0,1), (0,2), (1,2)
        ifirst = [0, 0, 1]
        isecond = [1, 2, 2]
        pat = vcm_pattern(ifirst, isecond)
        assert_array_almost_equal(np.diag(pat), [1, 1, 1])
        assert pat[0, 1] == 0.5       # share first epoch 0
        assert pat[1, 2] == 0.5       # share second epoch 2
        assert pat[0, 2] == -0.5      # second of 0 == first of 2
        # symmetric
        assert_array_almost_equal(pat, pat.T)

    def test_maxvar_scaling(self):
        v = get_vcmt([0, 0], [1, 2], [4.0, 9.0])
        assert v[0, 0] == 4.0
        assert v[1, 1] == 9.0
        assert v[0, 1] == pytest.approx(2 * 3 * 0.5)


class TestClosureLoops:
    def test_triangle(self):
        """test_collect_loops.py: triangle -> one loop of length 3."""
        graph = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
        count, loops = find_loops(graph, 3)
        assert len(dedupe_loops(loops)) == 1

    def test_k4(self):
        """K4 -> one length-4 loop retained after dedupe."""
        graph = np.ones((4, 4), dtype=int) - np.eye(4, dtype=int)
        _, loops = find_loops(graph, 4)
        assert len(dedupe_loops(loops)) == 1

    def test_signed_weighted_loops_and_closure(self):
        # epochs as ints; obs pairs forming a triangle
        first = [0, 0, 10]
        second = [10, 20, 20]
        loops = closed_loops(first, second, max_loop_length=4)
        assert len(loops) == 1
        loop = loops[0]
        assert loop.weight == 40            # 10 + 20 + 10 days-analog
        signs = {(e.first, e.second): e.sign for e in loop.edges}
        # traversal 0->10->20->0: edges (0,10)+1, (10,20)+1, (0,20)-1
        assert signs[(0, 10)] * signs[(10, 20)] * signs[(0, 20)] == -1
        # consistent values close to zero
        values = {(0, 10): 1.0, (10, 20): 2.0, (0, 20): 3.0}
        closure, breach = sum_closure(loop, values, subtract_median=False,
                                      thr=0.1)
        assert closure == pytest.approx(0.0)
        assert not breach
        values[(0, 20)] = 10.0
        closure, breach = sum_closure(loop, values, subtract_median=False,
                                      thr=0.1)
        assert abs(closure) == pytest.approx(7.0)
        assert breach

    def test_redundancy_discard(self):
        first = [0, 0, 10]
        second = [10, 20, 20]
        loops = closed_loops(first, second) * 5   # same loop repeated
        kept = discard_loops_containing_max_ifg_count(loops, 2)
        assert len(kept) == 3


class TestTemporalFilter:
    def test_lowpass_recovers_constant(self):
        spans = np.linspace(0, 2.0, 13)
        ts = np.full(12, 3.0)
        hp, lp = temporal_high_pass(ts, spans, cutoff_days=30, pthr=1)
        assert_array_almost_equal(lp, 3.0, decimal=6)
        assert_array_almost_equal(hp, 0.0, decimal=6)

    def test_nan_and_threshold(self):
        spans = np.linspace(0, 1.0, 7)
        ts = np.array([1.0, np.nan, 2.0, 3.0, np.nan, 4.0])
        lp = gaussian_temporal_filter(ts, 0.1, spans[:-1], thr=10)
        assert np.isnan(lp).all()      # below threshold
        lp = gaussian_temporal_filter(ts, 0.1, spans[:-1], thr=2)
        assert np.isnan(lp[[1, 4]]).all()
        assert np.isfinite(lp[[0, 2, 3, 5]]).all()

    def test_bad_cutoff(self):
        with pytest.raises(ValueError):
            temporal_high_pass(np.ones(3), np.arange(4.0), 0, 1)
