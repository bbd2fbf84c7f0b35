"""Round-trip tests for the Gorilla tier codec (FIXTURES.md F4 vectors:
constant, monotonic, NaN-bearing, plus randomized + hypothesis)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyrate_spark.kernels.gorilla import (_encode_block_scalar,
                                          encode_block, decode_block)


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


def test_pack_tokens_matches_reference_bitwriter():
    """The word-aligned OR-scatter packer must produce the exact bytes
    of a straightforward per-token bit writer for arbitrary widths
    (0-64), alignments, and 2^63+ values."""
    from pyrate_spark.kernels.gorilla import _pack_tokens

    def ref_pack(vals, widths):
        cur, nb, buf = 0, 0, bytearray()
        for v, w in zip(vals, widths):
            cur = (cur << w) | (int(v) & ((1 << w) - 1))
            nb += w
            while nb >= 8:
                nb -= 8
                buf.append((cur >> nb) & 0xFF)
                cur &= (1 << nb) - 1
        if nb:
            buf.append((cur << (8 - nb)) & 0xFF)
        return bytes(buf)

    rng = np.random.RandomState(1)
    for trial in range(150):
        m = rng.randint(0, 60)
        w = rng.choice([0, 1, 2, 5, 7, 9, 12, 13, 16, 31, 33, 50, 64],
                       size=m)
        v = rng.randint(0, 2 ** 62, size=m).astype(np.uint64)
        v[w == 64] = np.uint64(2 ** 64 - 1) - v[w == 64]
        got = _pack_tokens(v, w.astype(np.int64))
        assert got == ref_pack(v.tolist(), w.tolist()), trial


def test_vectorized_and_scalar_encoders_both_roundtrip():
    """Same decoder inverts both the block-static-window vectorized
    encoder and the paper's greedy per-point encoder, and the static
    window costs at most a few percent of size on tier-shaped data."""
    from pyrate_spark.kernels.gorilla import _encode_block_scalar
    rng = np.random.RandomState(9)
    tot_v = tot_s = 0
    for trial in range(25):
        n = rng.randint(0, 300)
        ts = (np.cumsum(rng.randint(1, 4000, size=n)).astype(np.int64)
              if n else np.empty(0, np.int64))
        vals = np.round(rng.randn(n), 2)
        vals[rng.rand(n) < 0.15] = np.nan
        if n > 4:
            vals[1:3] = vals[0]          # xor == 0 path
            ts[-1] += 10 ** 10           # 64-bit dod path
        for enc in (encode_block, _encode_block_scalar):
            blk = enc(ts, vals)
            dt, dv = decode_block(blk)
            assert np.array_equal(dt, ts)
            assert np.array_equal(dv.view(np.uint64), vals.view(np.uint64))
        tot_v += len(encode_block(ts, vals))
        tot_s += len(_encode_block_scalar(ts, vals))
    assert tot_v <= tot_s * 1.05


def test_decode_blocks_matches_scalar_decoder():
    """Lane-parallel batch decode == per-block decode, bit-exact, over
    mixed encoders / NaN runs / constants / 64-bit dod and xor edges,
    including empty and single-point blocks."""
    from pyrate_spark.kernels.gorilla import decode_blocks
    rng = np.random.default_rng(17)
    blocks, expect = [], []
    for l in range(64):
        n = int(rng.integers(0, 120))
        ts = np.cumsum(rng.integers(1, 5000, size=max(n, 1)))[:n] \
            .astype(np.int64)
        if l % 5 == 0 and n > 3:
            ts[3] += 10 ** 14            # 64-bit dod branch
        v = np.round(rng.normal(0, 2, size=n), 2)
        v[rng.random(n) < 0.15] = np.nan
        if l % 4 == 0 and n:
            v[:] = 7.5                   # all-zero xor stream
        if l % 9 == 0 and n > 1:
            v[1] = -1e308                # full-width xor payload
        enc = encode_block if l % 2 else _encode_block_scalar
        blocks.append(enc(ts, v))
        expect.append((ts, v))
    got = decode_blocks(blocks)
    assert len(got) == len(blocks)
    for (ts, v), (gt, gv), blk in zip(expect, got, blocks):
        st, sv = decode_block(blk)
        np.testing.assert_array_equal(gt, ts)
        np.testing.assert_array_equal(gt, st)
        assert np.array_equal(gv.view(np.uint64), v.view(np.uint64))
        assert np.array_equal(gv.view(np.uint64), sv.view(np.uint64))


def test_decode_blocks_truncation_fails_loudly():
    from pyrate_spark.kernels.gorilla import decode_blocks
    ts = np.cumsum(np.full(500, 37)).astype(np.int64)
    v = np.sin(np.arange(500) * 0.3)
    blk = encode_block(ts, v)
    ok = decode_blocks([blk, blk])
    assert np.array_equal(ok[0][0], ts) and np.array_equal(ok[1][1], v)
    with pytest.raises(ValueError, match="truncated"):
        decode_blocks([blk, blk[: len(blk) // 2]])


def test_decode_blocks_empty_inputs():
    from pyrate_spark.kernels.gorilla import decode_blocks
    assert decode_blocks([]) == []
    out = decode_blocks([encode_block(np.array([], dtype=np.int64),
                                      np.array([], dtype=np.float64))])
    assert len(out) == 1 and len(out[0][0]) == 0


def test_decode_blocks_skewed_sizes():
    """Hot-url skew: one huge block among many tiny ones must not
    inflate the padded output (lanes are grouped by size); results
    stay bit-exact and in input order."""
    from pyrate_spark.kernels.gorilla import decode_blocks
    rng = np.random.default_rng(23)
    sizes = [5000] + [int(rng.integers(0, 30)) for _ in range(150)] + [0]
    blocks, expect = [], []
    for i, n in enumerate(sizes):
        ts = np.cumsum(rng.integers(1, 900, size=max(n, 1)))[:n] \
            .astype(np.int64)
        v = np.round(rng.normal(0, 1, size=n), 3)
        enc = encode_block if i % 2 else _encode_block_scalar
        blocks.append(enc(ts, v))
        expect.append((ts, v))
    got = decode_blocks(blocks)
    for (ts, v), (gt, gv) in zip(expect, got):
        np.testing.assert_array_equal(ts, gt)
        assert np.array_equal(v.view(np.uint64) if len(v) else v,
                              gv.view(np.uint64) if len(gv) else gv)


def test_encode_blocks_matches_per_block_encoder():
    """r5 lane-parallel batch encode == encode_block per series,
    BYTE-identical, across the same edge matrix the decoder test uses
    (empty/single/constant/NaN/64-bit dod + xor), with enough total
    points to cross the CHUNK_POINTS internal boundary."""
    from pyrate_spark.kernels.gorilla import CHUNK_POINTS, encode_blocks
    rng = np.random.default_rng(23)
    series = [(np.array([], np.int64), np.array([], np.float64)),
              (np.array([7], np.int64), np.array([2.5])),
              (np.array([7, 67], np.int64), np.array([2.5, 2.5]))]
    while sum(len(t) for t, _ in series) < CHUNK_POINTS + 1000:
        n = int(rng.integers(0, 800))
        ts = np.cumsum(rng.integers(1, 5000, size=max(n, 1)))[:n] \
            .astype(np.int64)
        if len(series) % 5 == 0 and n > 3:
            ts[3] += 10 ** 14            # 64-bit dod branch
        v = np.round(rng.normal(0, 2, size=n), 2)
        v[rng.random(n) < 0.15] = np.nan
        if len(series) % 4 == 0 and n:
            v[:] = 7.5                   # all-zero xor stream
        if len(series) % 9 == 0 and n > 1:
            v[1] = -1e308                # full-width xor payload
        series.append((ts, v))
    ref = [encode_block(t, v) for t, v in series]
    got = encode_blocks(series)
    assert ref == got
    # and the batch output round-trips through the batch decoder
    from pyrate_spark.kernels.gorilla import decode_blocks
    for (ts, v), (gt, gv) in zip(series, decode_blocks(got)):
        np.testing.assert_array_equal(gt, ts)
        assert np.array_equal(gv.view(np.uint64), v.view(np.uint64))


def test_encode_blocks_hot_key_skew():
    """One 50k-point block among hundreds of tiny ones: flat layout
    means no padding blowup; outputs stay byte-identical."""
    from pyrate_spark.kernels.gorilla import encode_blocks
    rng = np.random.default_rng(5)
    series = [(np.arange(50_000, dtype=np.int64) * 60,
               np.round(rng.normal(0, 1, 50_000), 3))]
    for i in range(300):
        n = int(rng.integers(1, 6))
        series.append((np.arange(n, dtype=np.int64) * 3600 + i,
                       np.round(rng.normal(0, 1, n), 2)))
    assert encode_blocks(series) == [encode_block(t, v) for t, v in series]
