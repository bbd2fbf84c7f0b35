"""Stacking kernel oracles — values from
/root/reference/tests/test_stackrate.py:52-103."""

import numpy as np
from numpy.testing import assert_array_almost_equal, assert_array_equal

from pyrate_spark.kernels.stack import stack_rate_pixel, mask_rate

PHASE = np.array([0.5, 3.5, 4, 2.5, 3.5, 1])
SPAN = np.array([[0.1, 0.7, 0.8, 0.5, 0.7, 0.2]])
VCMT = np.eye(6)
MST = np.array([1, 1, 1, 1, 0, 1], dtype=bool)


class TestStackRatePixel:
    def test_oracle(self):
        rate, error, samples = stack_rate_pixel(PHASE, MST, VCMT, SPAN,
                                                nsig=3, pthresh=3)
        assert_array_almost_equal(rate, 5.0)
        assert_array_almost_equal(error, 0.836242010007091)
        assert samples == 5

    def test_below_pthresh(self):
        mst = np.zeros(6, dtype=bool)
        mst[0] = True
        rate, error, samples = stack_rate_pixel(PHASE, mst, VCMT, SPAN,
                                                nsig=3, pthresh=3)
        assert np.isnan(rate) and np.isnan(error)
        assert samples == 1


class TestStackRateNonDiagonalVCM:
    """The general (non-diagonal VCM) branch: whitening must use the
    UPPER Cholesky factor of inv(vcm) — scipy.linalg.cholesky's default
    at reference stack.py:153 — not numpy's lower factor. Verified
    against an independent step-by-step simulation of the reference
    loop (stack.py:92-165) written inline."""

    def _biggs_vcmt(self):
        # Biggs-pattern-shaped SPD covariance: pattern off-diagonals
        # (+-0.5 structure) shrunk toward a dominant diagonal so the
        # Cholesky exists, seeded and deterministic
        from pyrate_spark.kernels.epochs import epochs_from_pairs
        from pyrate_spark.kernels.vcm import get_vcmt
        fs = np.array([0, 100, 200, 0, 100, 300]) * 86400
        ss = np.array([100, 200, 300, 200, 300, 400]) * 86400
        _, _, ifirst, isecond = epochs_from_pairs(fs, ss)
        maxvar = np.array([1.0, 2.0, 0.5, 1.5, 1.0, 0.8])
        V = get_vcmt(ifirst, isecond, maxvar)
        off = V - np.diag(np.diag(V))
        return np.diag(np.diag(V)) + 0.35 * off

    def _reference_loop(self, obs, mst, vcmt, span, nsig, pthresh):
        """Direct transliteration of stack.py:92-165 semantics with an
        explicit scipy-style UPPER whitening factor."""
        obs = np.asarray(obs, float)
        span = np.atleast_2d(np.asarray(span, float))
        ind = np.nonzero(np.asarray(mst).ravel())[0]
        default_no = len(ind)
        while len(ind) >= pthresh:
            ifgv = obs[ind]
            B = span[:, ind]
            V = vcmt[np.ix_(ind, ind)]
            T = np.linalg.cholesky(V)          # lower (stack.py:129)
            A = np.linalg.solve(T, B.T)
            b = np.linalg.solve(T, ifgv.T)
            v, *_ = np.linalg.lstsq(A, b, rcond=None)
            err2 = B.dot(np.linalg.inv(V).dot(B.conj().T))
            err = np.sqrt(np.diag(np.linalg.inv(err2)))
            r = (B * v[0]) - ifgv
            U = np.linalg.cholesky(np.linalg.inv(V)).T   # scipy upper
            wr = np.abs(U.dot(r.T))
            if wr.max() > nsig:
                ind = np.delete(ind, wr.argmax())
            else:
                return float(v[0]), float(err[0]), int(len(ifgv))
        return np.nan, np.nan, int(default_no)

    def test_matches_reference_loop_with_drops(self):
        vcmt = self._biggs_vcmt()
        obs = np.array([0.6, 3.4, 4.2, 9.0, 3.1, 1.2])   # 9.0 = outlier
        span = np.array([[0.27, 0.27, 0.27, 0.55, 0.55, 0.27]])
        mst = np.ones(6, dtype=bool)
        got = stack_rate_pixel(obs, mst, vcmt, span, nsig=2, pthresh=3)
        want = self._reference_loop(obs, mst, vcmt, span, 2, 3)
        assert got[2] == want[2]
        assert_array_almost_equal(got[0], want[0])
        assert_array_almost_equal(got[1], want[1])
        assert got[2] < 6      # the drop loop actually fired

    def test_upper_vs_lower_changes_drop(self):
        """On an asymmetric VCM the lower factor would rank residuals
        differently; guard that our wr equals the upper-factor wr."""
        vcmt = self._biggs_vcmt()
        V = vcmt
        r = np.array([0.4, -1.2, 0.3, 2.0, -0.2, 0.1])
        U = np.linalg.cholesky(np.linalg.inv(V)).T
        L = np.linalg.cholesky(np.linalg.inv(V))
        assert not np.allclose(np.abs(U @ r), np.abs(L @ r))

    def test_general_branch_consistent_with_diagonal(self):
        """A VCM with negligible off-diagonals (forces the general
        branch) must agree with the diagonal fast path."""
        d = np.array([1.0, 2.0, 0.5, 1.5, 1.0, 0.8])
        v_diag = np.diag(d)
        v_gen = v_diag.copy()
        v_gen[0, 1] = v_gen[1, 0] = 1e-13
        got_d = stack_rate_pixel(PHASE, MST, v_diag, SPAN, 3, 3)
        got_g = stack_rate_pixel(PHASE, MST, v_gen, SPAN, 3, 3)
        assert got_d[2] == got_g[2]
        assert_array_almost_equal(got_d[0], got_g[0], decimal=8)
        assert_array_almost_equal(got_d[1], got_g[1], decimal=8)


class TestMaskRate:
    """test_stackrate.py:78-103."""

    def setup_method(self):
        self.r = np.array([5.0, 4.5])
        self.e = np.array([1.1, 2.1])

    def test_maxsig1(self):
        rate, error, _ = mask_rate(self.r, self.e, 1)
        assert_array_equal(rate, [np.nan, np.nan])
        assert_array_equal(error, [np.nan, np.nan])

    def test_maxsig2(self):
        rate, error, _ = mask_rate(self.r, self.e, 2)
        assert_array_equal(rate, [5.0, np.nan])
        assert_array_equal(error, [1.1, np.nan])

    def test_maxsig3(self):
        rate, error, _ = mask_rate(self.r, self.e, 3)
        assert_array_equal(rate, self.r)
        assert_array_equal(error, self.e)
