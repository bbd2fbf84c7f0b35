"""Streaming tier maintenance: correctness vs the batch rollup, late
data within the watermark, resume-from-checkpoint across runs."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.rollup import tier_rollup
from pyrate_spark.streaming.tiers import (read_pages_stream,
                                          run_tier_maintenance)

BASE = dt.datetime(2024, 1, 1)


def _pages_rows(spec):
    """spec: list of (url, hour_offset_float, value)."""
    rows = []
    for url, h, v in spec:
        ts = BASE + dt.timedelta(hours=h)
        text = f"v={v:.6f} body"
        rows.append((url, ts, bytearray(b"<html>"), text, "en"))
    return rows


PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def test_streaming_matches_batch_and_handles_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _pages_rows([
        ("a", 0.1, 1.0), ("a", 0.5, 3.0),       # hour 0
        ("a", 1.2, 5.0),                          # hour 1
        ("b", 0.3, 10.0),
    ])
    spark.createDataFrame(batch1, PAGES_DDL).write.mode("append").parquet(src)
    q = run_tier_maintenance(read_pages_stream(spark, src), out, ckpt,
                             tier="1 hour", watermark="2 hours")
    q.awaitTermination(120)

    # batch 2: a LATE row for hour 0 (within the 2h watermark: max seen
    # event time is 1.2h, watermark = -0.8h < 0h) + new rows far ahead
    # that push the watermark past hours 0-1 so those buckets finalise
    batch2 = _pages_rows([
        ("a", 0.8, 7.0),                          # late, hour 0
        ("a", 9.0, 2.0), ("b", 9.5, 4.0),        # advance watermark to 7h
    ])
    spark.createDataFrame(batch2, PAGES_DDL).write.mode("append").parquet(src)
    q = run_tier_maintenance(read_pages_stream(spark, src), out, ckpt,
                             tier="1 hour", watermark="2 hours")
    q.awaitTermination(120)

    got = (spark.read.parquet(out)
           .orderBy("url", "bucket_start").toPandas())
    # hour-0 bucket of url a must include the late row: avg(1,3,7)
    a0 = got[(got.url == "a")
             & (got.bucket_start == BASE)].iloc[0]
    assert a0["n_obs"] == 3
    assert a0["value_avg"] == pytest.approx(11.0 / 3)

    # equivalence with the batch rollup on the same finalised window
    all_pages = spark.read.parquet(src)
    from pyrate_spark.operators.extract import extract_series
    batch = tier_rollup(extract_series(all_pages), "1 hour", 0.5)
    bdf = (batch.where(F.col("bucket_start") < F.lit(BASE + dt.timedelta(hours=7)))
           .orderBy("url", "bucket_start").toPandas())
    gdf = (got[got.bucket_start < BASE + dt.timedelta(hours=7)]
           .reset_index(drop=True))
    assert len(bdf) == len(gdf)
    for col in ("url", "n_obs"):
        assert (bdf[col].to_numpy() == gdf[col].to_numpy()).all()
    import numpy as np
    np.testing.assert_allclose(bdf["value_avg"].astype(float),
                               gdf["value_avg"].astype(float))
