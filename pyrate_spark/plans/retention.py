"""Tiered retention policy — the "retention" leg of the rollup +
downsample + retention engine (BASELINE.json north rule;
drop-chunks-style semantics recast as partition planning).

At 10^12 rows, expiry must be a METADATA operation: the raw store is
day-partitioned (plans/backfill.write_raw_store), so expiring to
``keep_days`` means dropping whole day partitions older than the
cutoff — no data scan, no rewrite (the Iceberg drop-partition /
expire-snapshot equivalent). Row-level filtering is only the logical
view (``surviving`` — a partition-prunable predicate).

The reference has no retention analog (products are recomputed per
run, conv2tif/prepifg outputs accumulate); retention is the web-scale
graft's own requirement.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyrate_spark.plans.backfill import DAY_COL

DAY_SECONDS = 86400


def policy_cutoff_day(now_ts: dt.datetime, keep_days: int | None) -> str | None:
    """UTC day string below which partitions expire: the newest
    ``keep_days`` whole day partitions (including today's partial one)
    survive. None keeps everything."""
    if keep_days is None:
        return None
    day0 = dt.datetime(now_ts.year, now_ts.month, now_ts.day)
    return (day0 - dt.timedelta(days=keep_days - 1)).strftime("%Y-%m-%d")


def surviving(df: DataFrame, keep_days: int | None, now_ts: dt.datetime,
              ts_col: str = "warc_ts") -> DataFrame:
    """Logical retention view: rows on or after the cutoff day. The
    predicate is on the day of ``ts_col`` so it partition-prunes on a
    day-partitioned store."""
    cut = policy_cutoff_day(now_ts, keep_days)
    if cut is None:
        return df
    return df.where(F.date_trunc("day", F.col(ts_col))
                    >= F.lit(f"{cut} 00:00:00").cast("timestamp"))


def expire_day_store(spark: SparkSession, path: str, keep_days: int,
                     now_ts: dt.datetime) -> dict:
    """Physically expire a day-partitioned store: list the day
    partitions (directory names — a metadata read), drop those older
    than the cutoff via the Hadoop FS API, keep the rest untouched.
    Returns {"cutoff_day", "dropped": [...], "kept": [...]}. No data
    file is read or rewritten."""
    cut = policy_cutoff_day(now_ts, keep_days)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(path)
    fs = base.getFileSystem(conf)
    dropped, kept = [], []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith(f"{DAY_COL}="):
            continue
        day = name.split("=", 1)[1]
        if day < cut:
            fs.delete(st.getPath(), True)
            dropped.append(day)
        else:
            kept.append(day)
    return {"cutoff_day": cut, "dropped": sorted(dropped),
            "kept": sorted(kept)}
