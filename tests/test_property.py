"""Property-based kernel tests (hypothesis, derandomized for CI
stability): invariants that hold for ALL inputs, complementing the
fixed-oracle tests the reference's suite uses."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pyrate_spark.kernels.covariance import autocov_grid
from pyrate_spark.kernels.gorilla import decode_block, encode_block
from pyrate_spark.kernels.linalg import linregress_batch
from pyrate_spark.kernels.tempfilter import temporal_high_pass

SET = settings(max_examples=60, deadline=None, derandomize=True)

finite = st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False, width=64)
value_or_nan = st.one_of(finite, st.just(float("nan")))


@given(st.lists(value_or_nan, min_size=1, max_size=64),
       st.integers(min_value=0, max_value=10 ** 6))
@SET
def test_gorilla_roundtrip_bitexact(vals, t0):
    ts = t0 + np.arange(len(vals), dtype=np.int64) * 3600
    v = np.array(vals, dtype=np.float64)
    out_ts, out_v = decode_block(encode_block(ts, v))
    np.testing.assert_array_equal(out_ts, ts)
    # bit-exact including NaN patterns
    np.testing.assert_array_equal(out_v.view(np.int64), v.view(np.int64))


@given(st.lists(value_or_nan, min_size=2, max_size=40),
       st.integers(min_value=1, max_value=60))
@SET
def test_highpass_plus_lowpass_reconstructs(vals, cutoff):
    v = np.array(vals, dtype=np.float64)
    spans = np.cumsum(np.full(len(v) + 1, 0.01))
    hp, lp = temporal_high_pass(v, spans, cutoff, 1, dtype=np.float64)
    ok = np.isfinite(v)
    # hp = v - lp exactly, but lp mixes magnitudes: reconstruction is
    # exact to eps * the largest participating value
    scale = max(1.0, float(np.nanmax(np.abs(v))) if ok.any() else 1.0)
    np.testing.assert_allclose((hp + lp)[ok], v[ok], rtol=1e-9,
                               atol=1e-9 * scale)
    # the low-pass of a constant series is that constant
    c = np.full(len(v), 7.5)
    _, lp_c = temporal_high_pass(c, spans, cutoff, 1, dtype=np.float64)
    np.testing.assert_allclose(lp_c, 7.5, rtol=1e-9)


@given(st.lists(finite, min_size=3, max_size=20), st.data())
@SET
def test_linregress_matches_polyfit(ys, data):
    y = np.array(ys, dtype=np.float64)
    t = np.arange(len(y), dtype=np.float64)
    T = t[None, :]
    Y = y[None, :]
    s, i, r2, se, n = linregress_batch(T, Y)
    want = np.polyfit(t, y, 1)
    scale = max(1.0, float(np.abs(y).max()))
    np.testing.assert_allclose(s[0], want[0], rtol=1e-6,
                               atol=1e-9 * scale)
    np.testing.assert_allclose(i[0], want[1], rtol=1e-6,
                               atol=1e-9 * scale)
    assert n[0] == len(y)


@given(st.lists(finite, min_size=2, max_size=128))
@SET
def test_autocov_fft_equals_direct(vals):
    x = np.array(vals, dtype=np.float64)
    nzc = max(int(np.count_nonzero(x)), 1)
    got = autocov_grid(x, nzc)
    n = len(x)
    c = np.array([np.dot(x, np.roll(x, -k)) for k in range(n)])
    want = np.fft.fftshift(c) / nzc
    scale = max(1.0, float(np.abs(x).max()) ** 2 * n)
    np.testing.assert_allclose(got, want, rtol=1e-8,
                               atol=1e-10 * scale)


@given(st.integers(min_value=0, max_value=2 ** 60 - 1),
       st.sets(st.integers(min_value=0, max_value=59), min_size=0,
               max_size=3))
@SET
def test_simhash_band_pigeonhole(fp, flip_bits):
    """Any pair at hamming <= 3 shares at least one of the 4 15-bit
    bands — the completeness guarantee behind simhash_near_pairs."""
    other = fp
    for b in flip_bits:
        other ^= 1 << b
    bands_a = [(fp >> (15 * k)) & 0x7FFF for k in range(4)]
    bands_b = [(other >> (15 * k)) & 0x7FFF for k in range(4)]
    assert any(a == b for a, b in zip(bands_a, bands_b))


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.lists(st.tuples(st.integers(0, 2 ** 40),
                       st.floats(allow_nan=True, allow_infinity=True,
                                 width=64)),
             min_size=0, max_size=40),
    min_size=0, max_size=12))
def test_decode_blocks_property(batches):
    """Property: lane-parallel batch decode == per-block scalar decode
    for arbitrary block batches (mixed sizes, NaN/inf, empties)."""
    from pyrate_spark.kernels.gorilla import decode_blocks
    blocks = []
    for pairs in batches:
        ts = np.sort(np.array([p[0] for p in pairs], dtype=np.int64))
        vals = np.array([p[1] for p in pairs], dtype=np.float64)
        blocks.append(encode_block(ts, vals))
    got = decode_blocks(blocks)
    assert len(got) == len(blocks)
    for blk, (gt, gv) in zip(blocks, got):
        st_, sv = decode_block(blk)
        np.testing.assert_array_equal(gt, st_)
        assert np.array_equal(gv.view(np.uint64), sv.view(np.uint64))
