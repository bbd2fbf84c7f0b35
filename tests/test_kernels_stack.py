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
