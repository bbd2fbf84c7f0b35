"""Tier backfill (the Iceberg MERGE analog): after repairing late
data, the tier store equals a from-scratch rollup of the full raw
store, and only the affected day partitions are rewritten."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.rollup import tier_rollup
from pyrate_spark.plans.backfill import (backfill_tier, write_raw_store,
                                         write_tier_store)

BASE = dt.datetime(2024, 1, 1)
DDL = "url string, warc_ts timestamp, value double"


def _rows(spec):
    return [(u, BASE + dt.timedelta(hours=h), float(v)) for u, h, v in spec]


def _tier_pdf(df):
    return (df.select("url", "bucket_start", "value_avg", "null_fraction",
                      "n_obs")
            .orderBy("url", "bucket_start").toPandas())


@pytest.fixture()
def stores(spark, tmp_path):
    raw = str(tmp_path / "raw")
    tier = str(tmp_path / "tier")
    initial = _rows([("a", 0.1, 1.0), ("a", 0.5, 3.0), ("a", 25.0, 5.0),
                     ("b", 0.2, 10.0), ("b", 49.0, 20.0)])
    src = spark.createDataFrame(initial, DDL)
    write_raw_store(src, raw)
    write_tier_store(tier_rollup(src, "1 hour", 0.5), tier)
    return raw, tier


def test_backfill_equals_from_scratch(spark, stores, tmp_path):
    raw, tier = stores
    late = spark.createDataFrame(_rows([("a", 0.8, 7.0)]), DDL)  # day 0
    n = backfill_tier(spark, late, raw, tier, "1 hour", 0.5)
    assert n == 1                                  # one day repaired
    got = _tier_pdf(spark.read.parquet(tier).drop("_day"))
    full_raw = spark.read.parquet(raw).drop("_day")
    want = _tier_pdf(tier_rollup(full_raw, "1 hour", 0.5))
    assert got.equals(want)
    # the hour-0 bucket now includes the late row: avg(1, 3, 7)
    h0 = got[(got.url == "a")
             & (got.bucket_start == BASE)]["value_avg"].iloc[0]
    assert h0 == pytest.approx(11.0 / 3)


def test_backfill_touches_only_affected_partitions(spark, stores):
    raw, tier = stores
    before = {d: os.stat(os.path.join(tier, d)).st_mtime_ns
              for d in os.listdir(tier) if d.startswith("_day=")}
    late = spark.createDataFrame(_rows([("b", 49.5, 30.0)]), DDL)  # day 2
    backfill_tier(spark, late, raw, tier, "1 hour", 0.5)
    after = {d: os.stat(os.path.join(tier, d)).st_mtime_ns
             for d in os.listdir(tier) if d.startswith("_day=")}
    changed = {d for d in before if after.get(d) != before[d]}
    assert changed == {"_day=2024-01-03"}


def test_backfill_week_tier_expands_to_window(spark, tmp_path):
    """A week bucket spans 7 raw day-partitions: the repair must read
    the whole window, not just the late row's day."""
    raw = str(tmp_path / "raw_w")
    tier = str(tmp_path / "tier_w")
    spec = [("a", 24.0 * k, float(k)) for k in range(10)]   # 10 days
    src = spark.createDataFrame(_rows(spec), DDL)
    write_raw_store(src, raw)
    write_tier_store(tier_rollup(src, "1 week", 0.5), tier)
    late = spark.createDataFrame(_rows([("a", 26.0, 100.0)]), DDL)
    backfill_tier(spark, late, raw, tier, "1 week", 0.5)
    got = _tier_pdf(spark.read.parquet(tier).drop("_day"))
    want = _tier_pdf(tier_rollup(spark.read.parquet(raw).drop("_day"),
                                 "1 week", 0.5))
    assert got.equals(want)
