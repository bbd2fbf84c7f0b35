"""Round-trip tests for the Gorilla tier codec (FIXTURES.md F4 vectors:
constant, monotonic, NaN-bearing, plus randomized + hypothesis)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyrate_spark.kernels.gorilla import encode_block, decode_block


def roundtrip(ts, vals):
    blk = encode_block(np.asarray(ts, dtype=np.int64),
                       np.asarray(vals, dtype=np.float64))
    dts, dvals = decode_block(blk)
    np.testing.assert_array_equal(dts, np.asarray(ts, dtype=np.int64))
    # bit-exact including NaN patterns
    np.testing.assert_array_equal(
        dvals.view(np.uint64),
        np.asarray(vals, dtype=np.float64).view(np.uint64))
    return blk


def test_empty():
    blk = encode_block(np.empty(0, np.int64), np.empty(0, np.float64))
    ts, vals = decode_block(blk)
    assert len(ts) == 0 and len(vals) == 0


def test_single():
    roundtrip([1700000000], [3.14])


def test_constant_series_compresses():
    ts = 1700000000 + 3600 * np.arange(1000)
    vals = np.full(1000, 42.5)
    blk = roundtrip(ts, vals)
    # regular grid + constant values -> ~2 bits/point
    assert len(blk) < 1000 * 8 * 0.1


def test_monotonic():
    ts = 1700000000 + 60 * np.arange(500)
    roundtrip(ts, np.linspace(0, 10, 500))


def test_nan_bearing():
    ts = 1700000000 + np.array([0, 60, 180, 240, 600])
    roundtrip(ts, [1.0, np.nan, 2.0, np.nan, 3.0])


def test_irregular_timestamps():
    rng = np.random.RandomState(42)
    ts = np.cumsum(rng.randint(1, 100000, 200)) + 1700000000
    roundtrip(ts, rng.randn(200) * 1e6)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**40),
                          st.floats(allow_nan=False, allow_infinity=True,
                                    width=64)),
                min_size=1, max_size=64))
def test_property_roundtrip(pairs):
    ts = np.sort(np.array([p[0] for p in pairs], dtype=np.int64))
    vals = np.array([p[1] for p in pairs], dtype=np.float64)
    roundtrip(ts, vals)
