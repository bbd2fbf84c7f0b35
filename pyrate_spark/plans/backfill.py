"""Tier backfill for late data beyond the streaming watermark — the
Iceberg MERGE analog (SURVEY.md §2.9).

The streaming tier job finalises a bucket once the watermark passes it;
records arriving later (re-crawls, delayed WARC segments) can no longer
update it in-stream. The batch repair path:

1. append the late rows to the RAW store (source of truth), which is
   day-partitioned;
2. find the day partitions the late rows touch (a tiny distinct);
3. re-run the tier rollup over ONLY those raw partitions — partition
   pruning makes this read proportional to the lateness, not the table;
4. dynamic-partition-overwrite the recomputed days into the tier store.

Step 3+4 are exactly what an Iceberg `MERGE INTO tier USING recomputed`
compiles to on a day-partitioned table; the parquet implementation here
keeps the same plan shape (and the same invariant: after backfill the
tier equals a from-scratch rollup of raw, asserted in
tests/test_backfill.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyrate_spark.operators.rollup import tier_rollup

DAY_COL = "_day"


def _with_day(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    return df.withColumn(DAY_COL, F.to_date(ts_col))


def write_raw_store(series: DataFrame, path: str,
                    mode: str = "overwrite") -> None:
    """Day-partitioned raw store (url, warc_ts, value)."""
    (_with_day(series).write.mode(mode)
     .partitionBy(DAY_COL).parquet(path))


def append_late(series_late: DataFrame, raw_path: str) -> None:
    write_raw_store(series_late, raw_path, mode="append")


def write_tier_store(tier_df: DataFrame, path: str,
                     mode: str = "overwrite") -> None:
    """Day-partitioned tier store, dynamic overwrite so a backfill
    replaces only the partitions it recomputed."""
    (_with_day(tier_df, "bucket_start").write.mode(mode)
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(DAY_COL).parquet(path))


def backfill_tier(spark: SparkSession, late_rows: DataFrame,
                  raw_path: str, tier_path: str, tier: str = "1 hour",
                  thresh: float = 0.5) -> int:
    """MERGE-equivalent repair: append late rows to raw, recompute the
    touched day partitions from raw (pruned scan), overwrite exactly
    those tier partitions. Returns the number of day partitions
    repaired."""
    import datetime as dt
    from pyrate_spark.operators.rollup import TIER_SECONDS
    append_late(late_rows, raw_path)
    step = TIER_SECONDS[tier]
    # affected days = every day overlapped by a touched TIER BUCKET —
    # a week bucket spans 7 raw day-partitions, all of which feed its
    # recomputation (tiny driver-side set: one distinct over late rows)
    bucket_starts = [r[0] for r in late_rows.select(
        (F.floor(F.unix_timestamp("warc_ts") / step) * step)
        .cast("long").alias("b")).distinct().collect()]
    if not bucket_starts:
        return 0
    days = sorted({
        (dt.datetime.utcfromtimestamp(b) + dt.timedelta(days=k)).date()
        for b in bucket_starts
        for k in range(max(1, (step + 86399) // 86400))})
    raw = spark.read.parquet(raw_path)
    affected = raw.where(F.col(DAY_COL).isin(days)).drop(DAY_COL)
    # affected days are whole tier windows by construction, so every
    # recomputed bucket is complete AND every overwritten day partition
    # is fully covered (dynamic overwrite replaces whole partitions —
    # filtering to touched buckets would drop their siblings)
    recomputed = tier_rollup(affected, tier, thresh)
    write_tier_store(recomputed, tier_path, mode="overwrite")
    return len(days)
