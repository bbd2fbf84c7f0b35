"""Gorilla encode microbench: vectorized block encoder vs the per-point
scalar reference. Prints one JSON line. Run on an otherwise-idle box;
median-of-5 warm runs."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyrate_spark.kernels.gorilla import (_encode_block_scalar,  # noqa: E402
                                          decode_block, decode_blocks,
                                          encode_block)


def best_of(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.RandomState(42)
    n = 500_000
    ts = np.cumsum(rng.randint(1, 3600, size=n)).astype(np.int64)
    vals = np.round(rng.randn(n), 2)
    encode_block(ts[:1000], vals[:1000])          # warm
    _encode_block_scalar(ts[:1000], vals[:1000])
    t_vec = best_of(lambda: encode_block(ts, vals), 5)
    t_scl = best_of(lambda: _encode_block_scalar(ts, vals), 3)
    blk = encode_block(ts, vals)
    dt, dv = decode_block(blk)
    assert np.array_equal(dt, ts) and np.array_equal(dv, vals)
    t_dec = best_of(lambda: decode_block(blk), 3)
    # the production decode shape: one Arrow batch of many url blocks,
    # decoded lane-parallel (decode_tier feeds decode_blocks this way)
    lanes, per = 512, 1000
    batch = [encode_block(ts[i * per:(i + 1) * per],
                          vals[i * per:(i + 1) * per])
             for i in range(lanes)]
    got = decode_blocks(batch)
    for i in range(lanes):
        assert np.array_equal(got[i][0], ts[i * per:(i + 1) * per])
        assert np.array_equal(got[i][1], vals[i * per:(i + 1) * per])
    t_bat = best_of(lambda: decode_blocks(batch), 3)
    print(json.dumps({
        "metric": "gorilla_encode_rows_per_sec",
        "value": round(n / t_vec),
        "unit": "rows/sec",
        "scalar_rows_per_sec": round(n / t_scl),
        "speedup_vs_scalar": round(t_scl / t_vec, 2),
        "decode_rows_per_sec": round(n / t_dec),
        "decode_batch_rows_per_sec": round(lanes * per / t_bat),
        "decode_batch_lanes": lanes,
        "bytes_per_point": round(len(blk) / n, 2),
        "n": n}))


if __name__ == "__main__":
    main()
