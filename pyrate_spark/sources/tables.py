"""Bucketed table storage — shuffle-free joins and groupBys at scale.

At 10^12 rows, every url-keyed join/groupBy costs a full shuffle unless
the table layout already clusters by url. The reference solves this
with its tile-partitioned npy cache (shared.py:1261-1288: every stage
re-reads data pre-split the same way); the Spark-native equivalent is a
**bucketed table**: ``bucketBy(n, 'url')`` at write time persists the
hash-partitioning into the catalog, and every later equi-join or
aggregation on url reads it back WITHOUT an Exchange (verified by
tests/test_tables.py inspecting the physical plan).

In production these are Iceberg tables with a bucket partition
transform; the session catalog + parquet implementation here keeps the
same plan shape without an Iceberg runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 64,
                   key: str = "url", sort_col: str | None = "warc_ts",
                   mode: str = "overwrite") -> None:
    """Persist with bucket metadata (and within-bucket sort, so merge
    joins and per-key kernels read pre-sorted data)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_tier_ranged(tier_df: DataFrame, path: str,
                      n_files: int | None = None,
                      key: str = "url", ts_col: str = "bucket_start",
                      mode: str = "overwrite") -> None:
    """Range-layout tier write (north rule: repartition-by-range on
    (url, time-bucket)): ``repartitionByRange(key, ts)`` +
    ``sortWithinPartitions`` clusters each parquet file on a contiguous
    (url, bucket) range, so file- and row-group-level min/max stats
    prune BOTH url point-lookups and time-range scans — the access
    pattern of tier reads (a dashboard asks for one url's recent
    buckets, a backfill asks for one time slice of all urls). A hash
    layout spreads every url across every file and can prune neither."""
    spark = tier_df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (tier_df.repartitionByRange(n, key, ts_col)
     .sortWithinPartitions(key, ts_col)
     .write.mode(mode).parquet(path))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan —
    the assertion primitive for 'this join is co-located'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange hashpartitioning" in line
               or "Exchange rangepartitioning" in line)
