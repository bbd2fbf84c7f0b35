"""Event-window operators: sessionization and per-bucket top-k.

Sessionization is THE web-analytics windowing primitive the fixed
tier grid can't express: consecutive snapshots of a url merge into one
session while they are less than ``gap`` apart, however long the
session runs. Spark's native ``session_window`` handles the dynamic
merge in one hash aggregation (and the same expression works under
Structured Streaming with watermark-based state eviction — the
standard scale path for out-of-order web logs). The DuckDB oracle
replays it as textbook gaps-and-islands: a lag() flag marking gap
starts, a running sum numbering the islands.

Top-k per bucket (heavy hitters per hour) is the ranked companion:
rank urls inside each time bucket and keep the best k — one shuffle on
the bucket, deterministic ties, QUALIFY-style oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(series: DataFrame, gap: str = "30 minutes",
               value_col: str = "value",
               ts_col: str = "warc_ts") -> DataFrame:
    """(url, warc_ts, value) -> one row per session: events closer
    than ``gap`` chain into the same session (Spark ``session_window``
    — window end extends to last event + gap). One hash aggregation;
    works unchanged as a streaming continuous aggregate."""
    w = F.session_window(ts_col, gap)
    return (series
            .groupBy("url", w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.avg(value_col).alias("value_avg"),
                 F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts"))
            .select("url",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "value_avg", "first_ts", "last_ts"))


def topk_per_bucket(tier_df: DataFrame, k: int = 5,
                    value_col: str = "value_avg",
                    ts_col: str = "bucket_start") -> DataFrame:
    """Heavy hitters: the ``k`` highest-valued urls inside every time
    bucket. Rank window partitioned by the BUCKET (not the url — at
    10^12 rows the bucket count is bounded by the retention window
    while urls are unbounded, so per-bucket partitions stay shardable
    and no global sort exists). NULL values are excluded; ties break
    on url ascending, deterministically."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (Window.partitionBy(ts_col)
         .orderBy(F.col(value_col).desc(), F.col("url").asc()))
    return (tier_df
            .where(F.col(value_col).isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("url", ts_col, value_col, "rank"))
