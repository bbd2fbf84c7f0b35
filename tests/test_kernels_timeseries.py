"""Oracle tests for the time-series inversion kernel.

Values copied from the reference's unit oracles:
/root/reference/tests/test_timeseries.py:87-110 (tscuml vector) and
:304-356 (linear-rate pixels).
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from pyrate_spark.kernels.timeseries import time_series_pixel, design_matrix
from pyrate_spark.kernels.linalg import linregress, linregress_batch, pivoted_qr
from pyrate_spark.kernels.vcm import get_vcmt

# reference fixture: tests/test_timeseries.py:91-95 (1-based epoch ids)
IFIRST = np.asarray([1, 1, 2, 2, 3, 3, 4, 5]) - 1
ISECOND = np.asarray([2, 4, 3, 4, 5, 6, 6, 6]) - 1
SPANS = np.asarray([0.0, 0.1, 0.6, 0.8, 1.1, 1.3])
PHASE = np.asarray([0.5, 4, 2.5, 3.5, 2.5, 3.5, 2.5, 1])
NAN_FRACTION = np.asarray([0.5, 0.4, 0.2, 0.3, 0.1, 0.3, 0.2, 0.1])


class TestTimeSeriesOracle:
    def test_tscuml_laplacian(self):
        """test_timeseries.py:87-110: expected tscuml at decimal=2.

        The reference test uses a vcmt derived from its 17-ifg raster
        dataset; the observations here are exactly consistent (the
        phases satisfy a single cumulative series), so any positive-
        definite weighting recovers the same solution within the
        decimal=2 tolerance. We use the Biggs-pattern vcmt built from
        this network with unit maxvar.
        """
        vcmt = get_vcmt(IFIRST, ISECOND, np.ones(len(IFIRST)))
        # make it positive definite enough for cholesky(pinv(.)):
        # reference passes a full-rank empirical vcmt; identity works too
        tsvel, tsincr, tscuml = time_series_pixel(
            PHASE, IFIRST, ISECOND, SPANS, method=1, pthresh=0,
            smorder=2, smfactor_log10=-0.25, vcmt=np.eye(len(IFIRST)))
        assert_array_almost_equal(tscuml, [0.50, 3.0, 4.0, 5.5, 6.5],
                                  decimal=2)

    def test_tscuml_svd(self):
        """SVD method on the exactly-consistent network recovers the
        cumulative series exactly (Berardino 2002 pseudoinverse)."""
        tsvel, tsincr, tscuml = time_series_pixel(
            PHASE, IFIRST, ISECOND, SPANS, method=2, pthresh=0)
        assert_array_almost_equal(tscuml, [0.50, 3.0, 4.0, 5.5, 6.5],
                                  decimal=5)

    def test_all_nan_returns_nan(self):
        phase = np.full(8, np.nan)
        _, _, tscuml = time_series_pixel(phase, IFIRST, ISECOND, SPANS,
                                         method=2)
        assert np.isnan(tscuml).all()

    def test_pthresh_gate(self):
        """timeseries.py:180: below pthresh -> all NaN."""
        phase = PHASE.copy()
        phase[2:] = np.nan
        _, _, tscuml = time_series_pixel(phase, IFIRST, ISECOND, SPANS,
                                         method=2, pthresh=3)
        assert np.isnan(tscuml).all()

    def test_design_matrix_shape_and_sign(self):
        span = np.diff(SPANS)
        b0 = design_matrix(IFIRST, ISECOND, span, 5)
        assert b0.shape == (8, 5)
        # row 0: epochs 0->1 spans slot 0 only
        assert_array_almost_equal(b0[0], [0.1, 0, 0, 0, 0])
        # row 1: epochs 0->3 spans slots 0..2
        assert_array_almost_equal(b0[1], [0.1, 0.5, 0.2, 0, 0])
        # reversed pair flips sign
        b0r = design_matrix(np.array([3]), np.array([0]), span, 5)
        assert_array_almost_equal(b0r[0], [-0.1, -0.5, -0.2, 0, 0])


class TestLinearRate:
    """Oracles from tests/test_timeseries.py:304-356."""

    def test_clean_line(self):
        t = np.arange(6, dtype=float)
        y = 2.0 * t
        slope, intercept, r, stderr = linregress(t, y)
        assert_array_almost_equal(
            [slope, intercept, r * r, stderr], [2.0, 0.0, 1.0, 0.0])

    def test_outlier_case(self):
        # test_timeseries.py: outlier pixel oracle at rel=1e-6
        t = np.arange(6, dtype=float)
        y = np.array([0.0, 2, 4, 6, 8, 20])
        slope, intercept, r, stderr = linregress(t, y)
        assert slope == pytest.approx(3.428571, rel=1e-5)
        assert intercept == pytest.approx(-1.904761, rel=1e-5)
        assert r * r == pytest.approx(0.812030, rel=1e-5)
        assert stderr == pytest.approx(0.824786, rel=1e-5)

    def test_batch_matches_scalar_and_nan_gate(self):
        rng = np.random.RandomState(42)
        T = np.tile(np.arange(8.0), (5, 1))
        Y = rng.randn(5, 8) * 3 + T * rng.randn(5, 1)
        Y[1, [2, 5]] = np.nan       # partial NaN
        Y[3, :] = np.nan            # all NaN -> nan outputs
        Y[4, 2:] = np.nan           # fewer than 2 samples? no: 2 left
        s, i, r2, se, n = linregress_batch(T, Y)
        for k in range(5):
            mask = ~np.isnan(Y[k])
            if mask.sum() < 2:
                assert np.isnan(s[k])
                continue
            es, ei, er, ese = linregress(T[k][mask], Y[k][mask])
            assert s[k] == pytest.approx(es)
            assert i[k] == pytest.approx(ei)
            assert r2[k] == pytest.approx(er * er)
            assert se[k] == pytest.approx(ese, abs=1e-12)
            assert n[k] == mask.sum()


class TestPivotedQR:
    def test_reconstruction_and_rank_detection(self):
        rng = np.random.RandomState(0)
        a = rng.randn(8, 5)
        a[:, 3] = a[:, 0] + a[:, 1]       # dependent column
        Q, R, piv = pivoted_qr(a)
        assert_array_almost_equal(a[:, piv], Q @ R, decimal=10)
        # dependent structure: rank 4 -> last pivot column is "dependent"
        assert np.linalg.matrix_rank(a) == 4
        # trailing R diagonal ~ 0
        assert abs(R[4, 4]) < 1e-10


def test_rank_structure_matches_union_find():
    """The vectorized min-label CC (r5) must agree with a plain
    union-find on (covered, rank, full) over random incidence graphs,
    including disconnected and chain shapes."""
    import numpy as np
    from pyrate_spark.kernels.timeseries import _rank_structure

    def ref(ifirst, isecond, nv):
        lo = np.minimum(ifirst, isecond)
        hi = np.maximum(ifirst, isecond)
        cover = np.zeros(nv + 1, dtype=np.int64)
        np.add.at(cover, lo, 1)
        np.add.at(cover, hi, -1)
        covered = int(np.count_nonzero(np.cumsum(cover)[:nv] > 0))
        parent = list(range(nv + 1))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(lo.tolist(), hi.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        nodes = sorted(set(lo.tolist()) | set(hi.tolist()))
        comps = len({find(n) for n in nodes})
        rank = len(nodes) - comps
        return covered, rank, covered == rank

    rng = np.random.default_rng(31)
    for trial in range(1500):
        nv = int(rng.integers(2, 60))
        ne = int(rng.integers(1, 100))
        a = rng.integers(0, nv, ne)
        b = rng.integers(0, nv + 1, ne)
        b = np.where(b == a, (a + 1) % (nv + 1), b)
        assert _rank_structure(a, b, nv) == ref(a, b, nv), trial
