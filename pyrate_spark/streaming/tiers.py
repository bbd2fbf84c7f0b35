"""Streaming continuous aggregates: tier maintenance as a Structured
Streaming job.

The reference recomputes products from scratch per run (batch);
the graft maintains tiers incrementally: ``readStream`` over the pages
source -> watermarked tumbling-window aggregation with EXACTLY the
batch tier_rollup semantics (same expressions: mean + null-fraction +
count, NULL iff null_fraction >= thresh) -> append-mode sink. Late
crawl records (out-of-order warc_ts) within the watermark update their
bucket before it finalises; beyond it they are dropped — the
documented trade against unbounded state.

State/checkpoint lives in the streaming checkpoint dir; restarting the
query resumes from it (the streaming twin of plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def read_pages_stream(spark: SparkSession, path: str,
                      schema: str = PAGES_SCHEMA) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "32")
            .parquet(path))


def streaming_tier_rollup(pages_stream: DataFrame, tier: str = "1 hour",
                          thresh: float = 0.5,
                          watermark: str = "2 hours",
                          value_expr=None) -> DataFrame:
    """Streaming twin of operators.rollup.tier_rollup (same output
    schema); watermark bounds state for late data."""
    from pyrate_spark.operators.extract import extract_series
    series = extract_series(pages_stream, value_expr)
    return streaming_series_rollup(series, tier, thresh, watermark)


def streaming_series_rollup(series: DataFrame, tier: str = "1 hour",
                            thresh: float = 0.5,
                            watermark: str = "2 hours") -> DataFrame:
    """The watermarked tier aggregation over a ready (url, warc_ts,
    value) stream — same expressions as the batch tier_rollup, so a
    fully-flushed streaming run equals the batch result bucket-for-
    bucket (driver-gated by the streaming_rollup_hourly oracle)."""
    win = F.window("warc_ts", tier)
    agg = (series
           .withWatermark("warc_ts", watermark)
           .groupBy("url", win.alias("w"))
           .agg(F.avg("value").alias("_avg"),
                F.avg(F.when(F.col("value").isNull(), 1.0)
                       .otherwise(0.0)).alias("null_fraction"),
                F.count(F.lit(1)).alias("n_obs")))
    keep = (F.col("null_fraction") < F.lit(thresh)) | \
           ((F.col("null_fraction") == 0.0) & (F.lit(thresh) == 0.0))
    return agg.select(
        "url",
        F.col("w.start").alias("bucket_start"),
        F.when(keep, F.col("_avg")).otherwise(F.lit(None)).alias("value_avg"),
        "null_fraction",
        "n_obs")


def streaming_cascade_rollup(prev_tier_stream: DataFrame,
                             tier: str = "1 day", thresh: float = 0.5,
                             watermark: str = "0 seconds") -> DataFrame:
    """Continuous aggregate tier N-1 -> tier N (the streaming twin of
    operators.rollup.cascade_rollup, same weighted-mean math so the
    cascade equals a direct rollup of raw): reads the PREVIOUS tier's
    table as a stream — e.g. the parquet sink streaming_series_rollup
    appends to — and maintains the coarser tier incrementally, never
    touching raw data. Append mode + watermark finalise a parent
    bucket once all its child buckets have passed the frontier."""
    win = F.window("bucket_start", tier)
    n_valid = F.col("n_obs") * (1.0 - F.col("null_fraction"))
    agg = (prev_tier_stream
           .withWatermark("bucket_start", watermark)
           .groupBy("url", win.alias("w"))
           .agg((F.sum(F.col("value_avg") * n_valid)
                 / F.sum(F.when(F.col("value_avg").isNotNull(), n_valid)
                          .otherwise(0.0))).alias("_avg"),
                (F.sum(F.col("null_fraction") * F.col("n_obs"))
                 / F.sum("n_obs")).alias("null_fraction"),
                F.sum("n_obs").alias("n_obs")))
    keep = (F.col("null_fraction") < F.lit(thresh)) | \
           ((F.col("null_fraction") == 0.0) & (F.lit(thresh) == 0.0))
    return agg.select(
        "url",
        F.col("w.start").alias("bucket_start"),
        F.when(keep, F.col("_avg")).otherwise(F.lit(None))
        .alias("value_avg"),
        "null_fraction",
        "n_obs")


def run_tier_maintenance(pages_stream: DataFrame, out_path: str,
                         checkpoint_path: str, tier: str = "1 hour",
                         thresh: float = 0.5, watermark: str = "2 hours"):
    """One availableNow maintenance pass: process everything currently
    in the source, append finalised buckets to the tier table, keep
    watermark/window state in the checkpoint for the next pass. Returns
    the StreamingQuery (caller awaits termination)."""
    tiers = streaming_tier_rollup(pages_stream, tier, thresh, watermark)
    return (tiers.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def streaming_sessionize(series: DataFrame, gap: str = "30 minutes",
                         watermark: str = "0 seconds") -> DataFrame:
    """Streaming twin of operators.windows.sessionize: native dynamic
    session windows under Structured Streaming — sessions grow while
    events keep arriving within ``gap`` and finalise (append-mode
    emit) once the watermark passes the session end. Same output
    schema and same touch-merge boundary semantics as the batch
    operator, so a fully-flushed run equals it row-for-row (the
    streaming_sessionize_30m gate replays the batch oracle). State per
    key is one open session — the canonical bounded-state web-log
    shape."""
    w = F.session_window("warc_ts", gap)
    return (series
            .withWatermark("warc_ts", watermark)
            .groupBy("url", w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.avg("value").alias("value_avg"),
                 F.min("warc_ts").alias("first_ts"),
                 F.max("warc_ts").alias("last_ts"))
            .select("url",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "value_avg", "first_ts", "last_ts"))
