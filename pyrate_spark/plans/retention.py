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


def compact_day_store(spark: SparkSession, path: str,
                      max_files_per_day: int = 4,
                      target_bytes: int = 128 * 1024 * 1024,
                      min_age_days: int | None = None,
                      now_ts: dt.datetime | None = None) -> dict:
    """Small-file compaction for a day-partitioned store — the ops
    counterpart of streaming append: every availableNow maintenance
    pass appends files, and at 10^12 rows a day partition accumulating
    hundreds of tiny parquet files destroys scan planning (footer
    reads, task churn). For each day partition with more than
    ``max_files_per_day`` data files, rewrite it to
    ceil(bytes / target_bytes) files and swap atomically (write to a
    sibling tmp dir, delete old, rename — the Iceberg rewrite-datafiles
    equivalent). ``min_age_days`` skips recent partitions that are
    still receiving appends (compact behind the write frontier only).
    Partition listing is metadata; only over-fragmented days are read.

    Returns {"compacted": {day: (files_before, files_after)},
    "skipped": [days]}.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(path)
    fs = base.getFileSystem(conf)
    frontier = None
    if min_age_days is not None:
        now_ts = now_ts or dt.datetime.utcnow()
        frontier = policy_cutoff_day(now_ts, min_age_days)
    compacted, skipped = {}, []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith(f"{DAY_COL}="):
            continue
        day = name.split("=", 1)[1]
        if frontier is not None and day >= frontier:
            skipped.append(day)
            continue
        files = [f for f in fs.listStatus(st.getPath())
                 if f.getPath().getName().endswith(".parquet")]
        if len(files) <= max_files_per_day:
            skipped.append(day)
            continue
        nbytes = sum(f.getLen() for f in files)
        n_out = max(1, -(-nbytes // target_bytes))
        part_dir = f"{path}/{name}"
        tmp_dir = f"{path}/.compact_tmp_{name}"
        (spark.read.parquet(part_dir).repartition(n_out)
         .write.mode("overwrite").parquet(tmp_dir))
        fs.delete(st.getPath(), True)
        ok = fs.rename(hpath(tmp_dir), st.getPath())
        if not ok:
            raise IOError(f"compaction rename failed for {part_dir}")
        n_after = sum(1 for f in fs.listStatus(st.getPath())
                      if f.getPath().getName().endswith(".parquet"))
        compacted[day] = (len(files), n_after)
    return {"compacted": compacted, "skipped": sorted(skipped)}


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
