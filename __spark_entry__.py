"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline at sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus
the training-data-pipeline suite) — EVERY query has a DuckDB oracle
in ``oracle_sql()``: exact value twins where the math is
SQL-expressible (including the md5-hash-mode LSH pipelines, the FFT
autocovariance via a modular self-join, and the 4-epoch Laplacian
inversion via 3x3 Cramer), and measured-recall gate tables for the
ANN paths whose hash geometry SQL cannot replay. Numeric outputs are
rounded identically on both sides (regression-scale values to 3dp,
value-scale to 5dp, ratios to 6dp); float32 kernel outputs pass
through an explicit float32 cast on BOTH sides before rounding so
solver last-ulp noise collapses; timestamps are emitted as
unix-seconds bigints so hashing is robust to timezone/precision
representation.

The time-series stand-in over the driver tables: events(user_id, ts,
value) with url = cast(user_id as string), warc_ts = second-truncated
ts. Deterministic NULL injection (event_id % 10 == 0) exercises the
NaN paths (reference nodata semantics, shared.py:342-366).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyrate_spark.config import EngineConfig
from pyrate_spark.operators import dedup as dd
from pyrate_spark.operators import similarity as sim
from pyrate_spark.operators import text as tx
from pyrate_spark.operators.extract import extract_text_html
from pyrate_spark.operators.grouped import (linear_rate_per_url,
                                            mask_rate_df, mst_annotate,
                                            stack_rate_per_url,
                                            temporal_highpass_per_url,
                                            timeseries_per_url)
from pyrate_spark.operators.pairs import (epoch_ids, network_pairs,
                                          sequential_pairs)
from pyrate_spark.operators.rollup import (cascade_rollup, cumulative,
                                           gapfill_tier, nn_downsample,
                                           retention_crop, tier_rollup)

YEAR_SECONDS = 365.25 * 86400.0

# ---------------------------------------------------------------------------
# shared source fragments
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str, nulls: bool = True,
            floor_value: bool = False) -> DataFrame:
    """Canonical series source: duplicate (url, second) observations
    collapse to their mean. Without this, ONE duplicate timestamp (it
    exists at sf0.1) makes every lag/rank/pair construction order-
    ambiguous between Spark and the SQL twin. No-op where timestamps
    are unique (avg of one value is the value)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = F.col("value")
    if floor_value:
        v = F.floor(v).cast("double")
    if nulls:
        v = F.when(F.pmod(F.col("event_id"), F.lit(10)) == 0,
                   None).otherwise(v)
    return (e.select(
        F.col("user_id").cast("string").alias("url"),
        F.date_trunc("second", F.col("ts")).alias("warc_ts"),
        v.alias("value"))
        .groupBy("url", "warc_ts").agg(F.avg("value").alias("value")))


# SQL twin of _events (DuckDB); driver pre-registers `events` as a view
def _events_sql(nulls: bool = True, floor_value: bool = False) -> str:
    v = "floor(value)" if floor_value else "value"
    if nulls:
        v = f"CASE WHEN event_id % 10 = 0 THEN NULL ELSE {v} END"
    return (f"SELECT url, warc_ts, avg(v) AS value FROM ("
            f"SELECT CAST(user_id AS VARCHAR) AS url, "
            f"date_trunc('second', ts) AS warc_ts, {v} AS v FROM events) "
            f"GROUP BY url, warc_ts")


_HOURLY_SQL = f"""
    SELECT url,
           CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT) // 3600 * 3600
               AS bucket_unix,
           avg(value) AS raw_avg,
           avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) AS null_fraction,
           count(*) AS n_obs
    FROM ({_events_sql()}) GROUP BY 1, 2
"""


def _u(col):
    return F.unix_timestamp(col).cast("long")


def _nn(col):
    """NaN -> NULL so Spark kernel outputs hash like DuckDB's NULLs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c), None).otherwise(c)


def _duck_round5(col):
    """DuckDB's round(x, 5) on DOUBLE, replicated bit-for-bit:
    std::round(x * 1e5) / 1e5 — half away from zero, and the SIGN of a
    zero result follows the sign of x (round(-1e-9, 5) is -0.0, not
    +0.0). Spark's F.round goes through BigDecimal HALF_UP, which
    both drops the negative zero and rounds the exact decimal
    expansion rather than the x*1e5 product, so its output can differ
    from the DuckDB oracle's in the value hash even when every value
    compares == (the r7 closure_sums_tri/closure_classmap reds:
    1,365 rows of -0.0 vs +0.0 at sf0.01). Verified bit-identical to
    DuckDB over 600k samples including exact half-boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    y = c * F.lit(100000.0)
    mag = F.floor(F.abs(y) + F.lit(0.5)).cast("double") / F.lit(100000.0)
    # sign test must see the sign BIT, not the comparison sign: an input
    # of exactly -0.0 fails `c < 0`, but its string form keeps the minus
    # (ANSI mode forbids the 1.0/x -> -Infinity probe)
    neg = (c < 0) | ((c == 0) & c.cast("string").startswith("-"))
    return F.when(neg, -mag).otherwise(mag)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select("vec_id",
                    F.transform("embedding",
                                lambda x: x.cast("double")).alias("embedding"),
                    "label")


QUERY_IDS = list(range(10))      # similarity query vectors


def _run_stateful_once(spark, frame, build_stream, ddl):
    """Write `frame`, run one single-batch availableNow pass of a
    stateful streaming job over it, read the sink back. Append-mode
    applyInPandasWithState emits fully per batch (no watermark
    withholding), so one batch over in-order data IS the complete
    result — the deterministic gate shape for stateful twins."""
    import tempfile
    tmp = tempfile.mkdtemp(prefix="pyrate_stream_gate_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    frame.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ddl).parquet(src)
    job = (build_stream(stream).writeStream.format("parquet")
           .option("path", out).option("checkpointLocation", ckpt)
           .outputMode("append").trigger(availableNow=True).start())
    job.awaitTermination(300)
    return spark.read.parquet(out)

# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events -> series -> hourly tier -> daily cascade ->
    per-url linear rate (kernel path) at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    s = _events(spark, sf_dir)
    hourly = tier_rollup(s, "1 hour", thresh=0.5)
    daily = cascade_rollup(hourly, "1 day", thresh=0.5)
    cfg = EngineConfig(velerror_nsig=1, salt_buckets=16)
    lr = linear_rate_per_url(daily.where(F.col("value_avg").isNotNull()),
                             cfg, value_col="value_avg",
                             ts_col="bucket_start")
    return lr.select("url", F.round("rate", 3).alias("rate"),
                     F.round("rsquared", 6).alias("rsquared"),
                     F.col("samples").cast("long").alias("samples"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {}

    # ---------------- scans / projections / epochs ----------------
    def q_epoch_ids(spark, sf):
        s = _events(spark, sf)
        out = epoch_ids(s)
        return out.select("url", _u("warc_ts").alias("ts_unix"),
                          F.col("epoch_id").cast("long").alias("epoch_id"),
                          F.round("span_years", 9).alias("span_years"))
    q["epoch_ids"] = q_epoch_ids

    def q_sequential_pairs(spark, sf):
        p = sequential_pairs(_events(spark, sf))
        return p.select("url", _u("ts_first").alias("first_unix"),
                        _u("ts_second").alias("second_unix"),
                        F.round("delta_value", 5).alias("delta_value"),
                        F.round("time_span", 9).alias("time_span"))
    q["sequential_pairs"] = q_sequential_pairs

    def q_network_pairs(spark, sf):
        p = network_pairs(_events(spark, sf), max_span_days=2,
                          max_pairs_per_epoch=3)
        return p.select("url", _u("ts_first").alias("first_unix"),
                        _u("ts_second").alias("second_unix"),
                        F.round("delta_value", 5).alias("delta_value"),
                        F.round("time_span", 9).alias("time_span"),
                        F.round("nan_fraction", 6).alias("nan_fraction"))
    q["network_pairs"] = q_network_pairs

    # ---------------- rollups / tiers (D1-D3, T17, A6) ----------------
    def q_rollup_hourly(spark, sf):
        t = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_avg", 5).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["rollup_hourly"] = q_rollup_hourly

    def q_rollup_daily_cascade(spark, sf):
        h = tier_rollup(_events(spark, sf), "1 hour", thresh=0.99)
        d = cascade_rollup(h, "1 day", thresh=0.5)
        return d.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round(F.col("value_avg").cast("float").cast("double"), 3)
                        .alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["rollup_daily_cascade"] = q_rollup_daily_cascade

    def q_rollup_weekly(spark, sf):
        t = tier_rollup(_events(spark, sf), "1 week", thresh=0.5)
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round(F.col("value_avg").cast("float").cast("double"), 2)
                        .alias("value_avg"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["rollup_weekly"] = q_rollup_weekly

    def q_streaming_rollup_hourly(spark, sf):
        """§2.9 gate: the availableNow Structured-Streaming tier job
        over the same events, flushed to completion, equals the batch
        hourly rollup oracle bucket-for-bucket. Flush protocol: append-
        mode only emits windows the watermark has passed, and the
        watermark used for eviction in a batch is the one computed
        after the PREVIOUS batch — so two sentinel passes (far-future
        rows on a reserved url, filtered from the output) drive every
        real bucket across the emission frontier deterministically.
        The source is coalesced to ONE parquet file so the first pass
        is provably a single micro-batch (ADVICE r3: with multiple
        files and maxFilesPerTrigger, an out-of-order batch split
        would advance the watermark past still-unread older rows and
        append mode would silently drop their buckets)."""
        import datetime
        import tempfile
        from pyrate_spark.streaming.tiers import streaming_series_rollup
        tmp = tempfile.mkdtemp(prefix="pyrate_stream_gate_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        ddl = "url string, warc_ts timestamp, value double"
        s = _events(spark, sf)
        s.coalesce(1).write.mode("overwrite").parquet(src)
        mx = s.agg(F.max("warc_ts")).first()[0]

        def one_pass():
            stream = spark.readStream.schema(ddl).parquet(src)
            job = (streaming_series_rollup(stream, "1 hour", thresh=0.5,
                                           watermark="0 seconds")
                   .writeStream.format("parquet").option("path", out)
                   .option("checkpointLocation", ckpt)
                   .outputMode("append")
                   .trigger(availableNow=True).start())
            job.awaitTermination(300)

        one_pass()
        for days in (40, 80):
            flush = spark.createDataFrame(
                [("__flush__", mx + datetime.timedelta(days=days), None)],
                ddl)
            flush.write.mode("append").parquet(src)
            one_pass()
        t = (spark.read.parquet(out)
             .where(F.col("url") != "__flush__"))
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_avg", 5).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["streaming_rollup_hourly"] = q_streaming_rollup_hourly

    def q_nn_downsample(spark, sf):
        t = nn_downsample(_events(spark, sf), "1 hour")
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_last", 5).alias("value_last"),
                        _u("last_ts").alias("last_unix"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["nn_downsample"] = q_nn_downsample

    def q_retention_intersection(spark, sf):
        s = retention_crop(_events(spark, sf), mode=1)
        return s.select("url", _u("warc_ts").alias("ts_unix"),
                        F.round("value", 5).alias("value"))
    q["retention_intersection"] = q_retention_intersection

    def q_cumulative_hourly(spark, sf):
        t = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        c = cumulative(t.where(F.col("value_avg").isNotNull()))
        return c.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_cuml", 5).alias("value_cuml"))
    q["cumulative_hourly"] = q_cumulative_hourly

    def q_gapfill_locf(spark, sf):
        t = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        g = gapfill_tier(t, "1 hour", method="locf")
        return g.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_filled", 5).alias("value_filled"))
    q["gapfill_locf"] = q_gapfill_locf

    def q_gapfill_interp(spark, sf):
        """T17 linear-interpolation gap-fill (TimescaleDB
        interpolate() semantics): gaps lerp between bracketing
        observed buckets, edges outside the first/last observation
        stay NULL."""
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             # pin the lerp inputs: avg() summation order differs
             # between engines in the last ulp, and the lerp's
             # multipliers amplify that across the round-5 boundary
             .withColumn("value_avg", F.round("value_avg", 5)))
        g = gapfill_tier(t, "1 hour", method="interp")
        # no final round: with round-5 inputs the lerp is bit-identical
        # across engines (verified), while round() itself is NOT (the
        # two engines disagree on scaled-halfway doubles)
        return g.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_filled"))
    q["gapfill_interp"] = q_gapfill_interp

    def q_asof_tier_join(spark, sf):
        """As-of join (new r5): every raw event enriched with the most
        recent OBSERVED hourly bucket at-or-before it (below-threshold
        buckets are gaps, so matches really do reach back), matches
        staler than 2 h nulled out — vs DuckDB's native ASOF LEFT
        JOIN."""
        from pyrate_spark.operators.asof import asof_join
        s = _events(spark, sf)
        hourly = (tier_rollup(s, "1 hour", thresh=0.5)
                  .where(F.col("value_avg").isNotNull())
                  .select("url", "bucket_start",
                          F.col("value_avg").alias("asof_avg")))
        j = asof_join(s, hourly, tolerance_sec=7200)
        return j.select("url", _u("warc_ts").alias("ts_unix"),
                        F.round("value", 5).alias("value"),
                        _u("asof_ts").alias("asof_unix"),
                        F.round("asof_avg", 5).alias("asof_avg"))
    q["asof_tier_join"] = q_asof_tier_join

    # ---------------- aggregations (A1-A5, A9) ----------------
    def q_nan_fraction(spark, sf):
        s = _events(spark, sf)
        return (s.groupBy("url")
                .agg(F.round(F.avg(F.when(F.col("value").isNull(), 1.0)
                                   .otherwise(0.0)), 6).alias("nan_fraction"),
                     F.count(F.lit(1)).alias("n")))
    q["nan_fraction"] = q_nan_fraction

    def q_epoch_histogram(spark, sf):
        s = _events(spark, sf)
        return (s.groupBy("warc_ts").count()
                .select(_u("warc_ts").alias("ts_unix"),
                        F.col("count").alias("n_repeat")))
    q["epoch_histogram"] = q_epoch_histogram

    def q_ref_median(spark, sf):
        s = _events(spark, sf)
        med = s.groupBy("url").agg(F.median("value").alias("med"))
        return (s.join(med, "url")
                .select("url", _u("warc_ts").alias("ts_unix"),
                        F.round(F.col("value") - F.col("med"), 5)
                        .alias("value_centred")))
    q["ref_median"] = q_ref_median

    def q_refpixel_argmin(spark, sf):
        s = _events(spark, sf)
        cand = (s.groupBy("url")
                .agg(F.stddev_samp("value").alias("sd"),
                     F.count("value").alias("nvalid"))
                .where(F.col("nvalid") >= 10))
        return (cand.orderBy(F.asc_nulls_last("sd"), F.asc("url")).limit(1)
                .select("url", F.round("sd", 6).alias("sd"),
                        F.col("nvalid").cast("long").alias("nvalid")))
    q["refpixel_argmin"] = q_refpixel_argmin

    def q_refpixel_grid(spark, sf):
        """A5 grid-faithful search: candidates = url cohorts (first url
        char), layers = day buckets, per-layer population std with the
        every-layer min-valid gate, score = mean of stds, global argmin
        with ascending tie-break (refpixel.py:136-316)."""
        from pyrate_spark.operators.refpixel import refpixel_grid_search
        s = _events(spark, sf)
        out = refpixel_grid_search(s, cohort_expr=F.substring("url", 1, 1),
                                   bucket="1 day", min_valid=2)
        return out.select("cohort", F.round("mean_sd", 5).alias("mean_sd"),
                          F.col("n_layers").cast("long").alias("n_layers"))
    q["refpixel_grid"] = q_refpixel_grid

    def q_los_projection(spark, sf):
        """P7: LOS -> vertical via per-row incidence angle."""
        from pyrate_spark.operators.refpixel import los_project
        s = _events(spark, sf).withColumn(
            "incidence",
            F.lit(0.3) + F.lit(0.5) * F.pmod(_u("warc_ts"), F.lit(100))
            / F.lit(100.0))
        out = los_project(s, "incidence", to="vertical")
        return out.select("url", _u("warc_ts").alias("ts_unix"),
                          F.round("value", 5).alias("value_vert"))
    q["los_projection"] = q_los_projection

    def q_coh_stats(spark, sf):
        s = _events(spark, sf)
        def _r5(c):
            return F.round(c.cast("float").cast("double"), 5)
        return (s.groupBy("url")
                .agg(_r5(F.median("value")).alias("med"),
                     _r5(F.avg("value")).alias("mean"),
                     _r5(F.stddev_samp("value")).alias("sd")))
    q["coh_stats"] = q_coh_stats

    # ---------------- regression / stacking / inversion ----------------
    def q_linear_rate_sql(spark, sf):
        s = _events(spark, sf).where(F.col("value").isNotNull())
        w0 = Window.partitionBy("url")
        t = s.withColumn(
            "t_years",
            (_u("warc_ts") - _u(F.min("warc_ts").over(w0))).cast("double")
            / F.lit(YEAR_SECONDS))
        out = (t.groupBy("url")
               .agg(F.regr_slope("value", "t_years").alias("slope"),
                    F.regr_intercept("value", "t_years").alias("icept"),
                    F.regr_r2("value", "t_years").alias("r2"),
                    F.regr_count("value", "t_years").alias("n"),
                    F.regr_sxx("value", "t_years").alias("sxx"),
                    F.regr_syy("value", "t_years").alias("syy"))
               .where(F.col("n") >= 2))
        stderr = F.sqrt((1 - F.col("r2")) * F.col("syy") / F.col("sxx")
                        / (F.col("n") - 2))
        return out.select("url",
                          _nn(F.round("slope", 3)).alias("rate"),
                          _nn(F.round("icept", 3)).alias("intercept"),
                          _nn(F.round("r2", 6)).alias("rsquared"),
                          _nn(F.round(stderr, 3)).alias("error"),
                          F.col("n").cast("long").alias("samples"))
    q["linear_rate_sql"] = q_linear_rate_sql

    def q_linear_rate_kernel(spark, sf):
        s = _events(spark, sf).where(F.col("value").isNotNull())
        cfg = EngineConfig(velerror_nsig=1, salt_buckets=16)
        lr = linear_rate_per_url(s, cfg, value_col="value",
                                 ts_col="warc_ts")
        return (lr.withColumn("samples", _nn("samples"))
                .where(F.col("samples").isNotNull() & (F.col("samples") >= 2))
                .select("url",
                        _nn(F.round("rate", 3)).alias("rate"),
                        _nn(F.round("intercept", 3)).alias("intercept"),
                        _nn(F.round("rsquared", 6)).alias("rsquared"),
                        _nn(F.round("error", 3)).alias("error"),
                        F.col("samples").cast("long").alias("samples")))
    q["linear_rate_kernel"] = q_linear_rate_kernel

    def q_stack_rate_noiter(spark, sf):
        p = sequential_pairs(_events(spark, sf))
        cfg = EngineConfig(nsig=10 ** 9, pthr=1, velerror_nsig=1,
                           salt_buckets=16)
        st = stack_rate_per_url(p, cfg, use_mst=False)
        return st.select("url",
                         _nn(F.round("rate", 2)).alias("rate"),
                         _nn(F.round("error", 2)).alias("error"),
                         F.col("samples").cast("long").alias("samples"))
    q["stack_rate_noiter"] = q_stack_rate_noiter

    def q_mask_rate(spark, sf):
        p = sequential_pairs(_events(spark, sf))
        cfg = EngineConfig(nsig=10 ** 9, pthr=1, velerror_nsig=1,
                           salt_buckets=16)
        st = mask_rate_df(stack_rate_per_url(p, cfg, use_mst=False),
                          maxsig=500.0)
        return st.select("url",
                         _nn(F.round("rate_masked", 2)).alias("rate_masked"),
                         _nn(F.round("error_masked", 2)).alias("error_masked"))
    q["mask_rate"] = q_mask_rate

    def q_timeseries_chain(spark, sf):
        """SVD inversion on the (connected, integer-valued) chain network:
        tscuml must equal value - first(value) exactly."""
        s = _events(spark, sf, nulls=False, floor_value=True)
        p = sequential_pairs(s)
        cfg = EngineConfig(ts_method=2, ts_pthr=0, salt_buckets=16)
        ts = timeseries_per_url(p, cfg, use_mst=False)
        return ts.select(
            "url", _u("epoch_ts").alias("epoch_unix"),
            F.round(_nn("tscuml"), 0).cast("long").alias("tscuml"))
    q["timeseries_chain"] = q_timeseries_chain

    def q_timeseries_laplacian(spark, sf):
        """T4 end-to-end: Laplacian-smoothed inversion (method 1) on the
        first-4-epoch chain per url. With 3 velocity unknowns the system
        is small enough that the oracle solves the same smoothed normal
        equations by 3x3 Cramer in SQL. Both sides pass the result
        through float32 (the kernel's output dtype) before rounding so
        lstsq-vs-Cramer last-ulp noise collapses."""
        s = _events(spark, sf, nulls=False)
        w = Window.partitionBy("url").orderBy("warc_ts")
        # spread epochs (1, 21, 41, 61): day-scale spans keep the
        # smoothed system well-conditioned (the 3 smoothing/constraint
        # rows annihilate constants, so s^2 terms carry the data)
        s4 = (s.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn").isin(1, 21, 41, 61))
              .withColumn("_n", F.count(F.lit(1))
                          .over(Window.partitionBy("url")))
              .where(F.col("_n") == 4).drop("_rn", "_n"))
        p = sequential_pairs(s4)
        cfg = EngineConfig(ts_method=1, ts_pthr=0, sm_order=2,
                           sm_factor=-0.25, salt_buckets=16)
        ts = timeseries_per_url(p, cfg, use_mst=False)
        return ts.select(
            "url", _u("epoch_ts").alias("epoch_unix"),
            _nn(F.round(F.col("tscuml").cast("double"), 4)).alias("tscuml"))
    q["timeseries_laplacian"] = q_timeseries_laplacian

    def q_mst_edge_count(spark, sf):
        """G1 invariant: spanning tree of a connected epoch network has
        n_epochs - 1 edges. Uses the null-free series — NaN-valued edges
        are dropped by the per-pixel MST (mst.py:230-257), which would
        disconnect the graph and void the invariant."""
        p = network_pairs(_events(spark, sf, nulls=False), max_span_days=30,
                          max_pairs_per_epoch=2)
        ann = mst_annotate(p, EngineConfig(salt_buckets=16))
        return (ann.groupBy("url")
                .agg(F.sum(F.col("in_mst").cast("long")).alias("mst_edges"),
                     F.countDistinct("ts_first", "ts_second").alias("n_pairs")))
    q["mst_edge_count"] = q_mst_edge_count

    # ---------------- correction stages (T15, A3/P10, G3, codec) -------
    def q_orbital_detrend(spark, sf):
        from pyrate_spark.operators.corrections import orbital_detrend
        s = _events(spark, sf).where(F.col("value").isNotNull())
        out = orbital_detrend(s, EngineConfig(), degree=1)
        return out.select("url", _u("warc_ts").alias("ts_unix"),
                          _nn(F.round("value", 4)).alias("value_detr"))
    q["orbital_detrend"] = q_orbital_detrend

    def q_ref_phase_subtract(spark, sf):
        from pyrate_spark.operators.corrections import ref_phase_subtract
        s = _events(spark, sf)
        out = ref_phase_subtract(s, EngineConfig(), bucket="1 day")
        # + 0.0 collapses -0.0 to +0.0 (round() HALF_UP vs DuckDB banker's
        # rounding can disagree on the SIGN of zero while values compare ==)
        return out.select("url", _u("warc_ts").alias("ts_unix"),
                          (F.round("value", 5) + F.lit(0.0))
                          .alias("value_centred"))
    q["ref_phase_subtract"] = q_ref_phase_subtract

    def q_closure_triangles(spark, sf):
        from pyrate_spark.operators.corrections import closure_loop_counts
        p = network_pairs(_events(spark, sf, nulls=False),
                          max_span_days=30, max_pairs_per_epoch=2)
        return closure_loop_counts(p, EngineConfig(salt_buckets=16),
                                   loop_length=3)
    q["closure_triangles"] = q_closure_triangles

    def q_closure_sums_tri(spark, sf):
        """A8 closure table (new r7): one row per (url, triangle) with
        the signed closure sum — the quantity plot_closure.py renders.
        At max_loop_length=3 the kernel's traversal is deterministic
        (a->b->c->a ascending), so closure = d(a,b)+d(b,c)-d(a,c) and a
        3-way SQL self-join replays the whole table including the
        '|'-joined sorted-epoch loop_key and the loop weight
        (= 2*(c-a) seconds)."""
        from pyrate_spark.operators.corrections import closure_sums
        p = network_pairs(_events(spark, sf, nulls=False),
                          max_span_days=30, max_pairs_per_epoch=2)
        cfg = EngineConfig(max_loop_length=3,
                           max_loop_redundancy=10 ** 6, salt_buckets=16)
        return closure_sums(p, cfg).select(
            "url", "loop_key",
            F.col("n_edges").cast("long").alias("n_edges"),
            "loop_weight",
            _duck_round5("closure").alias("closure"))
    q["closure_sums_tri"] = q_closure_sums_tri

    def q_closure_classmap(spark, sf):
        """closure_plot's distributed half under the hard gate (new
        r7): nearest-entry class assignment of per-(url, loop) closure
        against the fixed symmetric bound thr*pi (plot_closure.py's
        vmin/vmax). Classes are computed from the 5-dp-rounded closure
        on BOTH sides so the gate checks the class algebra, not last-
        ulp float drift (the unrounded closures are value-hash-gated
        by closure_sums_tri). The PNG assembly itself is pytest-gated
        (tests/test_quicklook.py TestClosurePlot, deterministic
        bytes)."""
        from pyrate_spark.operators.corrections import closure_sums
        from pyrate_spark.operators.quicklook import class_index_col
        p = network_pairs(_events(spark, sf, nulls=False),
                          max_span_days=30, max_pairs_per_epoch=2)
        cfg = EngineConfig(max_loop_length=3,
                           max_loop_redundancy=10 ** 6, salt_buckets=16)
        bound = 10.0 * math.pi
        s = closure_sums(p, cfg).withColumn(
            "closure", _duck_round5("closure"))
        return s.select(
            "url", "loop_key", "closure",
            class_index_col("closure", -bound, bound).alias("cls"))
    q["closure_classmap"] = q_closure_classmap

    def q_orbital_network(spark, sf):
        """T16 on the chain network: the joint per-epoch inversion is
        exactly determined, so fitted offsets equal the cumulative
        deltas (= value - first value, integer-exact with the floored
        series) and every corrected residual is 0."""
        from pyrate_spark.operators.corrections import orbital_network
        s = _events(spark, sf, nulls=False, floor_value=True)
        p = sequential_pairs(s)
        out = orbital_network(p, EngineConfig(salt_buckets=16),
                              use_mst=False)
        return out.select(
            "url", _u("ts_first").alias("first_unix"),
            _u("ts_second").alias("second_unix"),
            (F.round("delta_corrected", 5) + F.lit(0.0)).alias("corrected"),
            F.round("o_second", 0).cast("long").alias("o_second"))
    q["orbital_network"] = q_orbital_network

    def q_closure_fixpoint(spark, sf):
        """G6 iterative closure check run with no-breach parameters
        (huge closure_thr, uncapped redundancy, triangles only): the
        fixpoint then reduces to 'keep edges in >=1 triangle', which a
        3-way self-join oracle can verify, including the iteration
        count (2 iff something was dropped, else 1; keys with no
        triangle abort intact at iteration 1). The breach-driven drop
        sequence is pytest-verified on hand-computed networks."""
        from pyrate_spark.operators.corrections import closure_fixpoint
        p = network_pairs(_events(spark, sf, nulls=False),
                          max_span_days=30, max_pairs_per_epoch=2)
        cfg = EngineConfig(max_loop_length=3, max_loop_redundancy=10 ** 6,
                           closure_thr=1e18, salt_buckets=16)
        out = closure_fixpoint(p, cfg)
        return (out.groupBy("url")
                .agg(F.count(F.lit(1)).alias("n_surviving"),
                     F.max("n_iter").cast("long").alias("n_iter")))
    q["closure_fixpoint"] = q_closure_fixpoint

    def q_dem_error(spark, sf):
        """T14 nuisance-regressor co-estimation: y = a + b*t + c*aux per
        url (aux = props length — a deterministic per-row covariate).
        The kernel solves by lstsq; the oracle solves the same 3x3
        normal equations by Cramer's rule in SQL."""
        from pyrate_spark.operators.corrections import dem_error_analog
        e = spark.read.parquet(f"{sf}/events.parquet")
        s = (e.select(
                F.col("user_id").cast("string").alias("url"),
                F.date_trunc("second", "ts").alias("warc_ts"),
                F.when(F.pmod("event_id", F.lit(10)) == 0, None)
                 .otherwise(F.col("value")).alias("value"),
                # covariate must VARY within a key to be identifiable:
                # props length alone is constant for many urls at
                # higher sf (collinear with the intercept -> the
                # coefficient is numerically meaningless), so a
                # deterministic per-row term joins it
                (F.length("props") + F.pmod("event_id", F.lit(97)))
                .cast("double").alias("aux"))
             .groupBy("url", "warc_ts")            # collapse dup seconds
             .agg(F.avg("value").alias("value"), F.avg("aux").alias("aux"))
             .where(F.col("value").isNotNull()))
        out = dem_error_analog(s, EngineConfig(salt_buckets=16))
        return (out.groupBy("url")
                .agg(F.first("aux_coef").alias("c"))
                .select("url",
                        _nn(F.round(F.col("c").cast("float")
                                    .cast("double"), 5)).alias("aux_coef")))
    q["dem_error"] = q_dem_error

    def q_maxvar_full(spark, sf):
        """A11 full maxvar: FFT circular autocovariance of the daily
        regular grid (gaps zeroed, nzc-normalised, first-half lags).
        The oracle computes the same circular autocovariance by direct
        modular self-join — equality IS the Wiener-Khinchin check at
        data scale. alpha is the non-SQL part (iterative fit) and is
        pytest-verified instead."""
        from pyrate_spark.operators.corrections import maxvar_full
        s = _events(spark, sf)
        out = maxvar_full(s, EngineConfig(salt_buckets=16),
                          bucket_seconds=86400, calc_alpha=False)
        # f32-quantize before round: partial-sum order in avg()/FFT varies
        # with partitioning at last-ulp scale; both sides collapse to the
        # same float32 before any rounding decision
        return out.select("url",
                          _nn(F.round(F.col("maxvar").cast("float")
                                      .cast("double"), 4)).alias("maxvar"),
                          F.col("n_grid").cast("long").alias("n_grid"),
                          F.col("nzc").cast("long").alias("nzc"))
    q["maxvar_full"] = q_maxvar_full

    def q_aux_tile_average(spark, sf):
        """A10: per-(url, day-tile) mean of the aux covariate joined
        back to rows."""
        from pyrate_spark.operators.corrections import aux_tile_average
        e = spark.read.parquet(f"{sf}/events.parquet")
        s = (e.select(F.col("user_id").cast("string").alias("url"),
                      F.date_trunc("second", "ts").alias("warc_ts"),
                      F.length("props").cast("double").alias("aux"))
             .groupBy("url", "warc_ts")           # collapse dup seconds
             .agg(F.avg("aux").alias("aux")))
        out = aux_tile_average(s, "aux", "1 day")
        return out.select("url", _u("warc_ts").alias("ts_unix"),
                          F.round("aux_tile_avg", 5).alias("aux_tile_avg"),
                          F.col("aux_tile_n").cast("long").alias("aux_tile_n"))
    q["aux_tile_average"] = q_aux_tile_average

    def q_lookup_join(spark, sf):
        """S10 (gamma.py:519-596): crop + multilook CENTRE-sampling of
        an auxiliary lookup table over the (day, hour) grid, paired
        with the matching multilook-mean tiles of the data grid. The
        SQL twin replays the centre-index arithmetic (even factor:
        min + looks/2 - 1; odd: min + (looks-1)/2) exactly."""
        from pyrate_spark.operators.lookup import (lookup_join,
                                                   lookup_table_select,
                                                   multilook_tiles)
        e = _events(spark, sf)
        d0 = e.agg(F.min(F.floor(F.unix_timestamp("warc_ts") / 86400))
                   .cast("long").alias("d0"))
        cells = (e.crossJoin(F.broadcast(d0))
                 .select((F.floor(F.unix_timestamp("warc_ts") / 86400)
                          - F.col("d0")).cast("long").alias("y"),
                         F.hour("warc_ts").cast("long").alias("x"),
                         "value"))
        lt = cells.groupBy("y", "x").agg(F.avg("value").alias("az"),
                                         F.count("value").alias("rg"))
        sel = lookup_table_select(lt, xlooks=3, ylooks=2,
                                  xmin=2, xmax=20, ymin=1, ymax=25)
        tiles = multilook_tiles(cells, 3, 2, 2, 20, 1, 25)
        out = lookup_join(tiles, sel)
        q5 = lambda c: (F.round(F.col(c).cast("float").cast("double"), 5)
                        + F.lit(0.0)).alias(c)
        return out.select("out_y", "out_x", q5("tile_avg"),
                          F.col("tile_n").cast("long").alias("tile_n"),
                          q5("az"), F.col("rg").cast("long").alias("rg"))
    q["lookup_join"] = q_lookup_join

    def _geometry_grid(spark, sf):
        """The S10 (day, hour) grid with deterministic geometry inputs:
        rg from the per-cell observation count (bounded mod 97 so the
        triangle stays physical at every sf), az linear-in-time mod the
        azimuth image length, lon/lat/height pure grid algebra."""
        e = _events(spark, sf)
        d0 = e.agg(F.min(F.floor(F.unix_timestamp("warc_ts") / 86400))
                   .cast("long").alias("d0"))
        cells = (e.crossJoin(F.broadcast(d0))
                 .select((F.floor(F.unix_timestamp("warc_ts") / 86400)
                          - F.col("d0")).cast("long").alias("y"),
                         F.hour("warc_ts").cast("long").alias("x"),
                         "value"))
        lt = cells.groupBy("y", "x").agg(F.count("value").alias("n"))
        return lt.select(
            "y", "x",
            F.pmod("n", F.lit(97)).cast("double").alias("rg"),
            F.pmod(F.col("x") + F.col("y") * 24, F.lit(1000))
            .cast("double").alias("az"),
            (F.lit(110.0) + F.col("x") * 0.05).alias("lon_deg"),
            (F.lit(-30.0) - F.col("y") * 0.05).alias("lat_deg"),
            (F.col("y") * 50.0 + F.col("x") * 10.0).alias("dem_height"))

    def q_pixel_geometry(spark, sf):
        """Derived per-pixel radar geometry (geometry.py:123-345, new
        r7): earth radius -> range distance -> look/incidence angles
        (law of cosines) -> satellite position (Eqs. 103-104) ->
        Vincenty-inverse azimuth (6 fixed unrolled iterations, same
        count in the DuckDB replay) -> derived perpendicular baseline.
        Pure column algebra end-to-end; f32-quantize before rounding
        on the trig outputs (divergent-libm policy, as maxvar)."""
        from pyrate_spark.operators.geometry import (local_baseline,
                                                     pixel_geometry)
        out = local_baseline(pixel_geometry(_geometry_grid(spark, sf)))
        q5 = lambda c: (F.round(F.col(c).cast("float").cast("double"), 5)
                        + F.lit(0.0)).alias(c)
        return out.select(
            "y", "x",
            # exact multiply-add of exact inputs — no quantize needed
            F.round("range_dist", 5).alias("range_dist"),
            q5("look_angle"), q5("incidence_angle"),
            q5("azimuth_angle"), q5("bperp"))
    q["pixel_geometry"] = q_pixel_geometry

    def q_dem_error_derived(spark, sf):
        """T14 fed by the DERIVED bperp (r7, VERDICT r6 missing #2):
        the nuisance covariate is no longer an input column but the
        geometry-derived perpendicular baseline looked up by the (day,
        hour) grid cell of each observation — closing the reference's
        dem_error.py + geometry.py chain end-to-end. Oracle replays
        the trig AND the 3x3 Cramer solve."""
        from pyrate_spark.operators.corrections import dem_error_analog
        from pyrate_spark.operators.geometry import (local_baseline,
                                                     pixel_geometry)
        geom = (local_baseline(pixel_geometry(_geometry_grid(spark, sf)))
                .select("y", "x", "bperp"))
        e = _events(spark, sf)
        d0 = e.agg(F.min(F.floor(F.unix_timestamp("warc_ts") / 86400))
                   .cast("long").alias("d0"))
        s = (e.where(F.col("value").isNotNull())
             .crossJoin(F.broadcast(d0))
             .withColumn("y", (F.floor(F.unix_timestamp("warc_ts")
                                       / 86400)
                               - F.col("d0")).cast("long"))
             .withColumn("x", F.hour("warc_ts").cast("long"))
             .join(F.broadcast(geom), ["y", "x"])
             .select("url", "warc_ts", "value",
                     F.col("bperp").alias("aux")))
        out = dem_error_analog(s, EngineConfig(salt_buckets=16))
        return (out.groupBy("url")
                .agg(F.first("aux_coef").alias("c"))
                .select("url",
                        _nn(F.round(F.col("c").cast("float")
                                    .cast("double"), 5)).alias("aux_coef")))
    q["dem_error_derived"] = q_dem_error_derived

    def q_gorilla_roundtrip(spark, sf):
        """Hourly tier THROUGH the Gorilla codec: encode per-url blocks,
        decode, compare against the plain hourly oracle — proves the
        tier payload round-trips bit-exactly inside the engine."""
        from pyrate_spark.operators.tiersink import decode_tier, encode_tier
        t = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        enc = encode_tier(t, "1 hour", EngineConfig(salt_buckets=16))
        dec = decode_tier(enc)
        return dec.select("url", _u("bucket_start").alias("bucket_unix"),
                          _nn(F.round("value_avg", 5)).alias("value_avg"))
    q["gorilla_roundtrip"] = q_gorilla_roundtrip

    # ---------------- dedup / text / similarity ----------------
    def q_dedup_exact(spark, sf):
        return (dd.exact_dedup(_docs(spark, sf))
                .select("doc_id", "content_hash",
                        F.col("canonical_id").cast("long").alias("canonical_id"),
                        F.col("dup_count").cast("long").alias("dup_count")))
    q["dedup_exact"] = q_dedup_exact

    def q_dedup_jaccard(spark, sf):
        """Uncapped exact baseline (tail oracle twin): the quadratic
        candidate join is an explicit ``max_df=None`` opt-out — the
        operator's DEFAULT is the DF-capped scale path (r7)."""
        return dd.jaccard_pairs(_docs(spark, sf), threshold=0.5,
                                max_df=None)
    q["dedup_jaccard"] = q_dedup_jaccard

    def q_dedup_jaccard_capped(spark, sf):
        """DF-capped candidate generation (the 100 TB-safe path): tokens
        in > max_df docs are excluded from the candidate join; emitted
        scores remain exact full-set Jaccard."""
        return dd.jaccard_pairs(_docs(spark, sf), threshold=0.5,
                                max_df=100)
    q["dedup_jaccard_capped"] = q_dedup_jaccard_capped

    def q_dedup_clusters(spark, sf):
        """Near-dup CLUSTERS (new r7): connected components over the
        capped-jaccard verified pair graph via iterative min-label
        propagation — the keep-one-representative step a 10^12-doc
        dedup pass needs after pair generation. cluster_id = min doc_id
        in the component; singletons (docs in no pair) cluster with
        themselves. Oracle replays the pair graph with the
        dedup_jaccard_capped SQL and closes it with a recursive
        reachability CTE."""
        docs = _docs(spark, sf)
        pairs = dd.jaccard_pairs(docs, threshold=0.5, max_df=100)
        cl = dd.near_dup_clusters(pairs, docs=docs)
        return cl.select("doc_id",
                         F.col("cluster_id").cast("long").alias("cluster_id"),
                         F.col("cluster_size").cast("long")
                         .alias("cluster_size"),
                         "is_canonical")
    q["dedup_clusters"] = q_dedup_clusters

    def q_html_text_invariant(spark, sf):
        """BASELINE row invariant as a hard gate (new r7): wrap the
        documents text in the canonical html shell (same construction
        as datagen/ingest), recover it with extract_text_html (UTF-8
        decode + anchored dotall regexp, JVM-side), and emit the
        per-row byte-identity verdict plus an md5 of the recovered
        bytes so the value hash pins the content, not just the
        boolean."""
        d = _docs(spark, sf)
        pages = d.select(
            "doc_id",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                              F.lit("</body></html>")), "UTF-8")
            .alias("html"),
            "text")
        ex = extract_text_html(pages)
        return ex.select(
            "doc_id",
            (F.col("text_from_html") == F.col("text")).alias("ok"),
            F.md5(F.encode("text_from_html", "UTF-8")).alias("text_md5"))
    q["html_text_invariant"] = q_html_text_invariant

    def q_dedup_minhash_lsh(spark, sf):
        """md5 hash mode: DuckDB replays the WHOLE LSH pipeline
        (min-hash sigs -> band buckets -> candidates -> exact verify)
        bit-for-bit, so the oracle checks recall behaviour too."""
        return dd.minhash_lsh_pairs(_docs(spark, sf), threshold=0.5,
                                    hash_mode="md5")
    q["dedup_minhash_lsh"] = q_dedup_minhash_lsh

    def q_dedup_simhash(spark, sf):
        """md5 hash mode (60-bit fp); banding is exhaustive for
        hamming<=3, so the oracle is the all-pairs popcount filter."""
        out = dd.simhash_near_pairs(_docs(spark, sf), max_hamming=3,
                                    hash_mode="md5")
        return out.select("doc_a", "doc_b",
                          F.col("hamming").cast("long").alias("hamming"))
    q["dedup_simhash"] = q_dedup_simhash

    def q_token_count(spark, sf):
        t = tx.token_count(_docs(spark, sf))
        return t.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                        F.col("n_subtokens").cast("long").alias("n_subtokens"),
                        "n_bpe_pieces")
    q["token_count"] = q_token_count

    def q_text_quality(spark, sf):
        t = tx.quality_score(_docs(spark, sf))
        return t.select("doc_id",
                        F.col("n_chars_measured").cast("long")
                        .alias("n_chars_measured"),
                        F.col("n_tokens").cast("long").alias("n_tokens"),
                        "punct_ratio", "stopword_ratio", "quality")
    q["text_quality"] = q_text_quality

    def q_lang_id(spark, sf):
        t = tx.lang_id(_docs(spark, sf))
        return t.select("doc_id", "pred_lang",
                        F.col("marker_hits").cast("long").alias("marker_hits"))
    q["lang_id"] = q_lang_id

    def q_fingerprint(spark, sf):
        return tx.fingerprint(_docs(spark, sf))
    q["fingerprint"] = q_fingerprint

    def q_fingerprint_rolling(spark, sf):
        """Rabin-Karp rolling hash: whole-doc polynomial hash + min
        windowed hash (content-defined-chunking primitive), pure
        fold/transform column algebra."""
        return tx.fingerprint_rolling(_docs(spark, sf), window=32).select(
            "doc_id", "rh_full", "rh_min_window",
            F.col("n_chars").cast("long").alias("n_chars"))
    q["fingerprint_rolling"] = q_fingerprint_rolling

    def q_domain_extract(spark, sf):
        """URL canonicalisation gate (new r7): deterministic synthetic
        URLs over documents (subdomain / multi-label-suffix / port-free
        variety from doc_id arithmetic — same construction replayed in
        the oracle), then registrable_domain()'s host + PSL-shaped
        extraction checked per row. The group-by-domain rollup this
        feeds is plain groupBy, gated elsewhere a dozen ways."""
        d = _docs(spark, sf)
        suffix = F.element_at(
            F.array(F.lit("com"), F.lit("co.uk"), F.lit("org")),
            (F.col("doc_id") % 3 + 1).cast("int"))
        sub = (F.when(F.col("doc_id") % 2 == 0, F.lit("www."))
                .otherwise(F.lit("")))
        url = F.concat(F.lit("https://"), sub, F.col("source"),
                       F.lit("."), suffix, F.lit("/"), F.col("lang"),
                       F.lit("/"), F.col("doc_id").cast("string"))
        return tx.registrable_domain(
            d.select("doc_id", url.alias("url")))
    q["domain_extract"] = q_domain_extract

    def q_gopher_repetition(spark, sf):
        """Gopher/C4 repetition quality gate (new r7): whitespace
        tokens, distinct-token ratio, top-token fraction and the
        keep/drop decision per document — explode + two hash aggs,
        SQL-replayable exactly (counts are integers; ratios rounded
        identically both sides)."""
        return tx.repetition_stats(_docs(spark, sf))
    q["gopher_repetition"] = q_gopher_repetition

    def q_strip_boilerplate(spark, sf):
        """CCNet-style cross-document span dedup (new r7): spans with
        corpus document-frequency above 80% dropped, survivors
        reassembled in order. Gate uses single-space delim (documents
        carry no newlines) — words play the boilerplate lines; the
        frac-threshold broadcast join path is the one exercised."""
        return dd.strip_boilerplate(_docs(spark, sf), delim=" ",
                                    max_df_frac=0.8)
    q["strip_boilerplate"] = q_strip_boilerplate

    def q_decontaminate(spark, sf):
        """Training-data decontamination gate (new r7): every 50th
        document plays the benchmark corpus; documents sharing any
        distinct 3-gram shingle with it are flagged with the shared
        count. Broadcast equi-join on the shingle — the corpus side
        never shuffles."""
        d = _docs(spark, sf)
        return dd.decontaminate(d, d.where(F.col("doc_id") % 50 == 0))
    q["decontaminate"] = q_decontaminate

    def q_pii_scrub(spark, sf):
        """PII redaction gate (new r7): deterministic synthetic PII
        (an email, a dotted-quad IP, a 10-digit account run derived
        from doc_id) appended to every document — replayed identically
        in the oracle — then pii_scrub's counts + scrubbed text
        checked per row on full string equality."""
        d = _docs(spark, sf)
        did = F.col("doc_id")
        injected = F.concat(
            F.col("text"),
            F.lit(" mail u"), did.cast("string"),
            F.lit("@ex"), (did % 3).cast("string"), F.lit(".org ip 10."),
            (did % 256).cast("string"), F.lit(".0.1 acct 9"),
            F.lpad(did.cast("string"), 9, "0"))
        return tx.pii_scrub(
            d.select("doc_id", injected.alias("text")))
    q["pii_scrub"] = q_pii_scrub

    def q_corr_leadlag(spark, sf):
        """Cross-series lead-lag correlation (new r7): densest-12
        hourly series, Pearson r at lags -2..2 h, best |r| per pair
        (correlate.py; VCM analog covariance.py:257-310). r is
        float-squashed + rounded BEFORE the per-pair argmax so the
        lag tie-break is engine-stable."""
        from pyrate_spark.operators.correlate import corr_pairs
        t = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        pairs = corr_pairs(t, bucket_sec=3600, top_keys=12,
                           min_overlap=6, lags=(-2, -1, 0, 1, 2))
        r5 = F.round(F.col("r").cast("float").cast("double"), 5)
        rounded = pairs.select("url_a", "url_b",
                               F.col("lag").cast("long").alias("lag"),
                               r5.alias("r"),
                               F.col("n_overlap").cast("long")
                               .alias("n_overlap"))
        w = Window.partitionBy("url_a", "url_b").orderBy(
            F.desc(F.abs(F.col("r"))), F.asc("lag"))
        return (rounded.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .select("url_a", "url_b", F.col("lag").alias("best_lag"),
                        "r", "n_overlap"))
    q["corr_leadlag"] = q_corr_leadlag

    def q_hash_split_assign(spark, sf):
        """Deterministic train/val/test assignment (new r7): xor-shift
        avalanche over doc_id, thresholded at the cumulative weights
        (sampling.py). The gate pins the FULL assignment table — the
        oracle replays the hash arithmetic bit-for-bit in SQL."""
        from pyrate_spark.operators.sampling import hash_split
        out = hash_split(_docs(spark, sf),
                         weights={"train": 0.8, "val": 0.1, "test": 0.1})
        return out.select("doc_id", "lang", "split")
    q["hash_split_assign"] = q_hash_split_assign

    def q_stratified_sample(spark, sf):
        """Deterministic per-language hash sample (new r7): membership
        is a pure function of (doc_id, salt) — rerun/cluster-size
        invariant, unlike df.sampleBy. Exact row-set gate."""
        from pyrate_spark.operators.sampling import stratified_sample
        out = stratified_sample(
            _docs(spark, sf),
            fractions={"de": 0.5, "en": 0.25, "es": 0.75,
                       "fr": 0.1, "zh": 1.0},
            stratum_col="lang", salt=1)
        return out.select("doc_id", "lang")
    q["stratified_sample"] = q_stratified_sample

    def q_profile_documents(spark, sf):
        """Single-pass column profiler (new r7): per-column row/null/
        distinct/min/max over documents in ONE aggregation
        (profile.py). exact=True is the gate twin of the
        approx_count_distinct scale default."""
        from pyrate_spark.operators.profile import profile_columns
        out = profile_columns(_docs(spark, sf),
                              cols=["doc_id", "text", "lang", "source",
                                    "n_chars"], exact=True)
        return out.select("col_name",
                          F.col("n_rows").cast("long").alias("n_rows"),
                          F.col("n_null").cast("long").alias("n_null"),
                          "null_fraction",
                          F.col("n_distinct").cast("long")
                          .alias("n_distinct"),
                          "min_str", "max_str")
    q["profile_documents"] = q_profile_documents

    def q_ohlc_hourly(spark, sf):
        """Candlestick continuous aggregate (r7, rollup.ohlc_rollup —
        TimescaleDB candlestick_agg): time-ordered open/close + high/
        low per (url, hour). Every output value is a raw input value
        passed through (endpoint selection, no arithmetic), so the
        gate is EXACT with zero rounding."""
        from pyrate_spark.operators.rollup import ohlc_rollup
        t = ohlc_rollup(_events(spark, sf), "1 hour")
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        "open", "high", "low", "close",
                        _u("open_ts").alias("open_ts_unix"),
                        _u("close_ts").alias("close_ts_unix"),
                        F.col("n_valid").cast("long").alias("n_valid"))
    q["ohlc_hourly"] = q_ohlc_hourly

    def q_ohlc_daily_cascade(spark, sf):
        """Candle mergeability gate (r7, rollup.ohlc_cascade —
        TimescaleDB rollup(candlestick_agg)): hourly candles cascaded
        to daily must equal a direct daily candle of raw — the oracle
        IS the direct form, so a green row proves the cascade exact
        (coarse tiers never rescan raw at scale)."""
        from pyrate_spark.operators.rollup import ohlc_rollup, ohlc_cascade
        t = ohlc_cascade(ohlc_rollup(_events(spark, sf), "1 hour"),
                         "1 day")
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        "open", "high", "low", "close",
                        _u("open_ts").alias("open_ts_unix"),
                        _u("close_ts").alias("close_ts_unix"),
                        F.col("n_valid").cast("long").alias("n_valid"))
    q["ohlc_daily_cascade"] = q_ohlc_daily_cascade

    def q_histogram_tier_hourly(spark, sf):
        """Mergeable fixed-bin histogram tier (r7,
        rollup.histogram_rollup — TimescaleDB histogram() with under/
        overflow edge bins): exact integer bin counts per (url, hour),
        gated as exploded (bin, cnt) rows with zero counts filtered on
        both sides. [0, 256) x 16 bins = width 16 (a power of two, so
        the floor-division bin index is IEEE-identical cross-engine);
        the sf values reach ~327, exercising the overflow bin."""
        from pyrate_spark.operators.rollup import histogram_rollup
        h = histogram_rollup(_events(spark, sf), "1 hour",
                             lo=0.0, hi=256.0, n_bins=16)
        return (h.select("url", _u("bucket_start").alias("bucket_unix"),
                         F.posexplode("counts").alias("bin", "cnt"))
                 .where(F.col("cnt") > 0)
                 .select("url", "bucket_unix",
                         F.col("bin").cast("long").alias("bin"),
                         F.col("cnt").cast("long").alias("cnt")))
    q["histogram_tier_hourly"] = q_histogram_tier_hourly

    def q_histogram_tier_cascade(spark, sf):
        """Histogram mergeability gate (r7, rollup.histogram_cascade):
        hourly bins summed to daily must equal the direct daily
        histogram of raw — the oracle IS the direct form (the OHLC
        cascade-gate pattern), so green = binned distributions cascade
        exactly and coarse-tier percentiles never rescan raw."""
        from pyrate_spark.operators.rollup import (histogram_rollup,
                                                   histogram_cascade)
        h = histogram_cascade(
            histogram_rollup(_events(spark, sf), "1 hour",
                             lo=0.0, hi=256.0, n_bins=16),
            "1 day", n_bins=16)
        return (h.select("url", _u("bucket_start").alias("bucket_unix"),
                         F.posexplode("counts").alias("bin", "cnt"))
                 .where(F.col("cnt") > 0)
                 .select("url", "bucket_unix",
                         F.col("bin").cast("long").alias("bin"),
                         F.col("cnt").cast("long").alias("cnt")))
    q["histogram_tier_cascade"] = q_histogram_tier_cascade

    def q_histogram_quantile_tier(spark, sf):
        """Quantile estimate FROM the cascaded daily histogram tier
        (r7, rollup.histogram_quantile_est — the Prometheus
        histogram_quantile recipe): p95 interpolated inside the first
        bin whose running count reaches ceil(0.95 * n_in), clamped to
        the domain. The one histogram-family function previously gated
        by pytest only; the oracle replays the crossing-bin search and
        the interpolation in the SAME operand order (round-6 both
        sides)."""
        from pyrate_spark.operators.rollup import (histogram_quantile_est,
                                                   histogram_rollup,
                                                   histogram_cascade)
        d = histogram_cascade(
            histogram_rollup(_events(spark, sf), "1 hour",
                             lo=0.0, hi=256.0, n_bins=16),
            "1 day", n_bins=16)
        est = histogram_quantile_est(d, 0.95, lo=0.0, hi=256.0,
                                     n_bins=16)
        return est.select("url", _u("bucket_start").alias("bucket_unix"),
                          F.round("q_est", 6).alias("q_est"),
                          "n_in_range")
    q["histogram_quantile_tier"] = q_histogram_quantile_tier

    def q_distinct_tier_daily(spark, sf):
        """Mergeable distinct-count tier (r7, rollup.distinct_tier +
        distinct_cascade — Spark-native Datasketches HLL): hourly
        sketches UNIONED to daily, estimate checked against the exact
        per-day COUNT(DISTINCT) oracle. Valid because every (url, day)
        group at test scale stays in the sketch's exact coupon mode
        (max 11 distinct values at sf0.1 vs a few-hundred threshold at
        lg_k=12) — so a green row proves BOTH the sketch path and its
        mergeability; the at-scale estimate contract is documented on
        the operator."""
        from pyrate_spark.operators.rollup import (distinct_cascade,
                                                   distinct_tier)
        d = distinct_cascade(
            distinct_tier(_events(spark, sf), "1 hour"), "1 day")
        return d.select("url", _u("bucket_start").alias("bucket_unix"),
                        "n_distinct_est")
    q["distinct_tier_daily"] = q_distinct_tier_daily

    def q_knn_bruteforce(spark, sf):
        out = sim.cosine_topk(_emb(spark, sf), QUERY_IDS, k=5)
        return out.select(F.col("query_id").cast("long").alias("query_id"),
                          F.col("neighbor_id").cast("long").alias("neighbor_id"),
                          "cosine", F.col("rank").cast("long").alias("rank"))
    q["knn_bruteforce"] = q_knn_bruteforce

    def q_knn_ivf(spark, sf):
        """IVF over LEARNED k-means cells (Lloyd's on a deterministic
        sample, broadcast centroids, distributed assignment). The gate:
        per-query recall@5 against the exact brute-force baseline must
        clear 0.39 at a 4/8-cell (50%) scan fraction — the synthetic
        embeddings are isotropic-random (avg pairwise cosine ~0), the
        information-theoretic worst case for ANN, so the measured floor
        (0.4-0.6 across sf) IS the honest number."""
        e = _emb(spark, sf)
        bf = sim.cosine_topk(e, QUERY_IDS, k=5)
        iv = sim.ivf_topk_kmeans(e, QUERY_IDS, k=5, probes=4, n_cells=8)
        r = sim.recall_vs_bruteforce(iv, bf, k=5)
        return r.select(F.col("query_id").cast("long").alias("query_id"),
                        (F.col("recall") >= 0.39).alias("recall_ok"))
    q["knn_ivf"] = q_knn_ivf

    def q_knn_lsh(spark, sf):
        """Multi-table hyperplane LSH (24 tables x 4 planes, candidate =
        any-table signature match) + exact rerank; gate: per-query
        recall@5 >= 0.79 vs brute force (measured floor 0.8 across sf
        on the isotropic-random embeddings)."""
        e = _emb(spark, sf)
        bf = sim.cosine_topk(e, QUERY_IDS, k=5)
        ml = sim.lsh_topk_multi(e, QUERY_IDS, k=5, n_tables=24,
                                planes_per_table=4)
        r = sim.recall_vs_bruteforce(ml, bf, k=5)
        return r.select(F.col("query_id").cast("long").alias("query_id"),
                        (F.col("recall") >= 0.79).alias("recall_ok"))
    q["knn_lsh"] = q_knn_lsh

    def q_dedup_cosine(spark, sf):
        """Embedding-cosine near-dup (brute exact baseline — the scale
        path is method='lsh', candidate-bucketed, whose machinery the
        knn_lsh recall gate covers)."""
        out = sim.cosine_near_pairs(_emb(spark, sf), threshold=0.25)
        return out.select(F.col("id_a").cast("long").alias("id_a"),
                          F.col("id_b").cast("long").alias("id_b"),
                          "cosine")
    q["dedup_cosine"] = q_dedup_cosine

    def q_dedup_cosine_lsh(spark, sf):
        """Embedding-cosine near-dup, the 10^12-row path: multi-table
        hyperplane LSH candidate generation + exact verify. Gates three
        facts: (1) the LSH pair set is a SUBSET of the exact brute set
        (no false positives survive the exact verify), (2) recall >=
        0.9 (measured 0.95-0.96 at sf0.001/0.01/0.1 on isotropic-random
        embeddings — the ANN worst case), (3) n_brute, which the oracle
        recomputes independently in SQL, pinning the baseline itself."""
        e = _emb(spark, sf)
        brute = sim.cosine_near_pairs(e, threshold=0.25, method="brute")
        lsh = sim.cosine_near_pairs(e, threshold=0.25, method="lsh")
        outside = lsh.join(brute.select("id_a", "id_b"),
                           ["id_a", "id_b"], "left_anti")
        return (brute.agg(F.count(F.lit(1)).alias("n_brute"))
                .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_lsh")))
                .crossJoin(outside.agg(F.count(F.lit(1)).alias("n_out")))
                .select(F.col("n_brute").cast("long").alias("n_brute"),
                        (F.col("n_out") == 0).alias("subset_ok"),
                        ((F.col("n_lsh") / F.col("n_brute")) >= 0.9)
                        .alias("recall_ok")))
    q["dedup_cosine_lsh"] = q_dedup_cosine_lsh

    def q_multimodal_features(spark, sf):
        """Stubbed decode is sha256-deterministic, so the oracle
        recomputes the identical feature bytes in DuckDB. posexplode to
        scalar rows keeps the output canonicalizable (no list column)."""
        from pyrate_spark.operators.multimodal import (extract_features,
                                                       synth_assets)
        f = extract_features(synth_assets(spark, 64), feat_dim=8)
        return f.select(
            "asset_id", "kind",
            F.posexplode("feat").alias("pos", "fv"),
            "decode_ok").select(
            "asset_id", "kind", F.col("pos").cast("long").alias("pos"),
            F.round(F.col("fv").cast("double"), 9).alias("feat_val"),
            "decode_ok")
    q["multimodal_features"] = q_multimodal_features

    def q_multimodal_resize(spark, sf):
        """Fit-in-box resize: geometry is column algebra, pixel work is
        the stubbed mapInPandas stage whose deterministic stand-in
        payload the oracle recomputes (sha256 of payload+geometry)."""
        from pyrate_spark.operators.multimodal import (resize_assets,
                                                       synth_assets)
        out = resize_assets(synth_assets(spark, 64), max_w=256, max_h=256)
        return out.select(
            "asset_id", "kind",
            F.col("out_width").cast("long").alias("out_width"),
            F.col("out_height").cast("long").alias("out_height"),
            F.lower(F.hex("payload_resized")).alias("resized_sha"))
    q["multimodal_resize"] = q_multimodal_resize

    def q_frame_sample(spark, sf):
        """Video frame-sampling plan: timestamps to decode, pure
        sequence+explode."""
        from pyrate_spark.operators.multimodal import (frame_sample_plan,
                                                       synth_assets)
        out = frame_sample_plan(synth_assets(spark, 64), every_ms=1000)
        return out.select("asset_id",
                          F.col("frame_ms").cast("long").alias("frame_ms"))
    q["frame_sample"] = q_frame_sample

    def q_temporal_highpass(spark, sf):
        """T11: Gaussian-weighted high-pass on the irregular time axis.
        SQL twin = per-url self-join over the interval-midpoint axis."""
        cfg = EngineConfig(tlpf_cutoff_days=2, tlpf_pthr=1, salt_buckets=16)
        s = _events(spark, sf)
        out = temporal_highpass_per_url(s, cfg)
        return out.select("url", _u("epoch_ts").alias("ts_unix"),
                          _nn(F.round(F.col("value_hp").cast("float")
                                      .cast("double"), 4)).alias("value_hp"),
                          _nn(F.round(F.col("value_lp").cast("float")
                                      .cast("double"), 4)).alias("value_lp"))
    q["temporal_highpass"] = q_temporal_highpass

    def q_cohort_lowpass_fft(spark, sf):
        """T12 true spectral path: per-cohort daily grid -> NN NaN-fill
        -> FFT Gaussian low-pass (sigma = std(dist)/cutoff) -> iFFT ->
        join back. SQL twin replays the whole pipeline with a direct
        DFT (double trig sum) — exact, not an approximation gate."""
        from pyrate_spark.operators.corrections import cohort_lowpass_fft
        s = _events(spark, sf)
        cohort = F.pmod(F.col("url").cast("long"), F.lit(8)).cast("string")
        out = cohort_lowpass_fft(s, EngineConfig(salt_buckets=16),
                                 bucket_seconds=86400, cutoff_days=5.0,
                                 cohort_expr=cohort)
        return out.select(
            "url", _u("warc_ts").alias("ts_unix"),
            (_nn(F.round(F.col("value_hp").cast("float")
                         .cast("double"), 4)) + F.lit(0.0)).alias("value_hp"),
            (_nn(F.round(F.col("value_lp").cast("float")
                         .cast("double"), 4)) + F.lit(0.0)).alias("value_lp"))
    q["cohort_lowpass_fft"] = q_cohort_lowpass_fft

    # ---------------- relational anchor ----------------
    def q_pricing_summary(spark, sf):
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                     F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
                     F.round(F.sum(F.col("l_extendedprice")
                                   * (1 - F.col("l_discount"))), 2)
                     .alias("sum_disc"),
                     F.round(F.avg("l_quantity"), 5).alias("avg_qty"),
                     F.count(F.lit(1)).alias("count_order")))
    q["pricing_summary"] = q_pricing_summary

    def q_retention_policy(spark, sf):
        """Tiered retention policy (the engine's 'retention' leg):
        per-tier day-aligned cutoffs relative to the newest datum —
        raw keeps 14 days, hourly 21, daily forever — and surviving
        row counts through the partition-prunable predicate. The
        physical partition-drop path (expire_day_store: Hadoop-FS
        delete of whole day partitions, no data scan) is
        pytest-verified; this gates the policy math."""
        import datetime
        import functools
        from pyrate_spark.plans.retention import (policy_cutoff_day,
                                                  surviving)
        s = _events(spark, sf)
        now = s.agg(F.max("warc_ts")).first()[0]
        hourly = tier_rollup(s, "1 hour", thresh=0.5)
        daily = cascade_rollup(hourly, "1 day", thresh=0.5)
        tiers = [("raw", s, "warc_ts", 14),
                 ("hourly", hourly, "bucket_start", 21),
                 ("daily", daily, "bucket_start", None)]
        frames = []
        for name, df, col, keep in tiers:
            cut = policy_cutoff_day(now, keep)
            cu = None if cut is None else int(
                datetime.datetime.strptime(cut, "%Y-%m-%d")
                .replace(tzinfo=datetime.timezone.utc).timestamp())
            frames.append(
                surviving(df, keep, now, ts_col=col)
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .select(F.lit(name).alias("tier"),
                        F.lit(cu).cast("long").alias("cutoff_unix"),
                        F.col("n_rows").cast("long").alias("n_rows")))
        return functools.reduce(lambda a, b: a.unionAll(b), frames)
    q["retention_policy"] = q_retention_policy

    def q_checkpoint_roundtrip(spark, sf):
        """S5/S8 gate: the hourly tier computed THROUGH the
        checkpointed bucket runner — first pass stopped after 2 of 4
        batches (simulated kill), second pass resumes the remainder —
        read back from the partitioned store equals the direct-rollup
        oracle row-for-row."""
        import tempfile
        from pyrate_spark.plans.checkpoint import (checkpointed_run,
                                                   read_result)
        out = tempfile.mkdtemp(prefix="pyrate_ckpt_gate_")
        s = _events(spark, sf)

        def tf(d):
            return tier_rollup(d, "1 hour", thresh=0.5)

        checkpointed_run(s, out, tf, n_buckets=16, batches=4,
                         max_batches=2)
        checkpointed_run(s, out, tf, n_buckets=16, batches=4)
        t = read_result(spark, out)
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_avg", 5).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["checkpoint_roundtrip"] = q_checkpoint_roundtrip

    def q_snapshot_time_travel(spark, sf):
        """Snapshot store gate (new r5): odd-hour buckets committed as
        v1, even-hour appended as v2, then v3 OVERWRITES the table
        with only the odd half — reading AS OF v2 must still equal
        the full direct rollup (snapshot isolation / time travel:
        the later overwrite is invisible to a v2 reader)."""
        import tempfile
        from pyrate_spark.plans.snapshots import (commit_snapshot,
                                                  read_snapshot)
        store = tempfile.mkdtemp(prefix="pyrate_snap_gate_")
        hourly = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        # hour-aligned buckets: unix % 7200 == 3600 <=> odd hour index
        odd = F.pmod(_u("bucket_start"), F.lit(7200)) == 3600
        commit_snapshot(hourly.where(odd), store, mode="append")
        commit_snapshot(hourly.where(~odd), store, mode="append")
        commit_snapshot(hourly.where(odd), store, mode="overwrite")
        t = read_snapshot(spark, store, version=2)
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_avg", 5).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["snapshot_time_travel"] = q_snapshot_time_travel

    def q_snapshot_merge_upsert(spark, sf):
        """MERGE INTO gate (new r5, tail): commit the hourly tier,
        upsert a delta that halves every even-hour bucket's value,
        read back latest — equals the direct rollup with the CASE
        applied (update leg; the insert leg is pytest-gated)."""
        import tempfile
        from pyrate_spark.plans.snapshots import (commit_snapshot,
                                                  merge_snapshot,
                                                  read_snapshot)
        store = tempfile.mkdtemp(prefix="pyrate_merge_gate_")
        hourly = tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
        commit_snapshot(hourly, store, mode="append")
        even = F.pmod(_u("bucket_start"), F.lit(7200)) == 0
        delta = (hourly.where(even)
                 .withColumn("value_avg", F.col("value_avg") * 0.5))
        merge_snapshot(delta, store, keys=("url", "bucket_start"))
        t = read_snapshot(spark, store)
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round("value_avg", 5).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["snapshot_merge_upsert"] = q_snapshot_merge_upsert

    def q_counter_rate_hourly(spark, sf):
        """PromQL-style counter delta/rate with reset detection over
        the hourly tier (new r5, tail). Inputs pinned to round-5 so
        the lag arithmetic is bit-identical across engines; outputs
        emitted unrounded (deterministic given pinned inputs)."""
        from pyrate_spark.operators.rollup import counter_rate
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        c = counter_rate(t)
        return c.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"), F.col("delta"),
                        F.col("rate_per_sec"))
    q["counter_rate_hourly"] = q_counter_rate_hourly

    def q_ewma_hourly(spark, sf):
        """EWMA (adjust=False recurrence, alpha=0.3) per url over the
        hourly tier (new r5, tail): an exact JVM fold via
        sort_array + aggregate; DuckDB's list_reduce replays the
        identical operation order, so no output rounding is needed."""
        from pyrate_spark.operators.rollup import ewma_tier
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        e = ewma_tier(t, alpha=0.3)
        return e.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"), F.col("value_ewma"))
    q["ewma_hourly"] = q_ewma_hourly

    def q_anomaly_zscore_hourly(spark, sf):
        """Trailing 24-bucket z-score anomaly flags over the hourly
        tier (new r5, tail). Frame sum/sum-of-squares are exact left
        folds over the frame-ordered history (same policy as
        ewma_hourly: DuckDB list_prepend(0.0, ...) + list_reduce
        replays Spark's aggregate() initial-value fold bit-for-bit),
        so the z-score and the boolean flag need no tolerance; zscore
        is emitted rounded only for the hash."""
        from pyrate_spark.operators.anomaly import anomaly_zscore
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        a = anomaly_zscore(t, window=24, nsig=2.0, min_obs=6)
        return a.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"),
                        F.col("n_window").cast("long").alias("n_window"),
                        F.round("zscore", 6).alias("zscore"),
                        F.col("is_anomaly"))
    q["anomaly_zscore_hourly"] = q_anomaly_zscore_hourly

    def q_seasonal_residual(spark, sf):
        """Hour-of-day seasonal baseline + residual per url (new r5,
        tail). Timezone-free: hod is integer arithmetic on the epoch
        bucket on BOTH sides; baseline is a plain groupBy-style avg,
        rounded like every other avg gate."""
        from pyrate_spark.operators.anomaly import seasonal_baseline
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5))
             .withColumn("bucket_unix", _u("bucket_start"))
             .drop("bucket_start"))
        b = seasonal_baseline(t, ts_col="bucket_unix")
        # residual re-derived from the ROUNDED baseline: subtraction
        # of two cross-engine-identical doubles is deterministic,
        # whereas value - raw_baseline can straddle a half-up boundary
        return b.select("url", "bucket_unix", "value_avg",
                        F.col("hod").cast("int").alias("hod"),
                        F.round("baseline", 5).alias("baseline"),
                        F.round(F.col("value_avg")
                                - F.round("baseline", 5), 5)
                        .alias("residual"),
                        F.col("n_profile"))
    q["seasonal_residual"] = q_seasonal_residual

    def q_cusum_changepoint(spark, sf):
        """Two-sided CUSUM level-shift statistics over the hourly
        tier (new r5, tail). Standardisation stats and the running
        recurrence are exact folds (ewma policy); DuckDB replays the
        identical operation order via prefix list_reduce, so the
        statistics and the flag are bit-equal with no tolerance."""
        from pyrate_spark.operators.anomaly import cusum_changepoint
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        c = cusum_changepoint(t, k=0.5, h=4.0)
        return c.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"),
                        F.round("cusum_hi", 6).alias("cusum_hi"),
                        F.round("cusum_lo", 6).alias("cusum_lo"),
                        F.col("is_change"))
    q["cusum_changepoint"] = q_cusum_changepoint

    def q_holt_forecast(spark, sf):
        """Holt linear-trend smoothing + one-step forecast over the
        hourly tier (new r5, tail). Exact-fold recurrence (ewma
        policy) replayed by DuckDB prefix list_reduce — bit-equal,
        rounded only for the hash."""
        from pyrate_spark.operators.anomaly import holt_forecast
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        hf = holt_forecast(t, alpha=0.5, beta=0.3)

        # identical-arithmetic rounding (floor(x*1e6 + 0.5)/1e6 on
        # BOTH sides): engine-native round() implementations disagree
        # on exact half boundaries even for bit-equal inputs
        def r6(c):
            return F.floor(F.col(c) * 1e6 + F.lit(0.5)) / 1e6
        return hf.select("url", _u("bucket_start").alias("bucket_unix"),
                         F.col("value_avg"),
                         r6("level").alias("level"),
                         r6("trend").alias("trend"),
                         r6("forecast").alias("forecast"),
                         r6("forecast_error").alias("forecast_error"))
    q["holt_forecast"] = q_holt_forecast

    def q_slo_burn_rate(spark, sf):
        """Multi-window SLO burn rate over the hourly tier (new r5,
        tail). Integer window counts divided once — exact dyadic
        ratios, no rounding needed on the rates."""
        from pyrate_spark.operators.anomaly import slo_burn_rate
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        b = slo_burn_rate(t, threshold=80.0, short_window=6,
                          long_window=24, burn_threshold=0.5)
        return b.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"), F.col("violation"),
                        F.col("short_rate"), F.col("long_rate"),
                        F.col("is_burning"))
    q["slo_burn_rate"] = q_slo_burn_rate

    def q_sessionize_30m(spark, sf):
        """Web-analytics sessionization (new r5, tail): Spark
        session_window vs the DuckDB gaps-and-islands replay. Pure
        integer-second arithmetic except value_avg (round-5)."""
        from pyrate_spark.operators.windows import sessionize
        s = sessionize(_events(spark, sf), gap="30 minutes")
        return s.select("url",
                        _u("session_start").alias("session_start_unix"),
                        _u("session_end").alias("session_end_unix"),
                        F.col("n_events").cast("long").alias("n_events"),
                        F.round("value_avg", 5).alias("value_avg"),
                        _u("first_ts").alias("first_unix"),
                        _u("last_ts").alias("last_unix"))
    q["sessionize_30m"] = q_sessionize_30m

    def q_topk_hourly(spark, sf):
        """Per-bucket heavy hitters (new r5, tail): top-3 urls by
        (round-5-pinned) hourly value, ties on url — ranked inside the
        bucket so no global sort exists."""
        from pyrate_spark.operators.windows import topk_per_bucket
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5)))
        k = topk_per_bucket(t, k=3)
        return k.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.col("value_avg"),
                        F.col("rank").cast("long").alias("rank"))
    q["topk_hourly"] = q_topk_hourly

    def q_streaming_sessionize_30m(spark, sf):
        """§2.9 twin (new r5, tail): availableNow streaming session
        windows, sentinel-flushed to completion, equal the batch
        sessionize oracle row-for-row (same flush protocol as
        streaming_rollup_hourly; far-future __flush__ rows drive the
        real sessions across the append-mode frontier)."""
        import datetime
        import tempfile
        from pyrate_spark.streaming.tiers import streaming_sessionize
        tmp = tempfile.mkdtemp(prefix="pyrate_sess_gate_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        ddl = "url string, warc_ts timestamp, value double"
        s = _events(spark, sf)
        s.coalesce(1).write.mode("overwrite").parquet(src)
        mx = s.agg(F.max("warc_ts")).first()[0]

        def one_pass():
            stream = spark.readStream.schema(ddl).parquet(src)
            job = (streaming_sessionize(stream, "30 minutes",
                                        watermark="0 seconds")
                   .writeStream.format("parquet").option("path", out)
                   .option("checkpointLocation", ckpt)
                   .outputMode("append")
                   .trigger(availableNow=True).start())
            job.awaitTermination(300)

        one_pass()
        for days in (40, 80):
            flush = spark.createDataFrame(
                [("__flush__", mx + datetime.timedelta(days=days),
                  None)], ddl)
            flush.write.mode("append").parquet(src)
            one_pass()
        t = (spark.read.parquet(out)
             .where(F.col("url") != "__flush__"))
        return t.select("url",
                        _u("session_start").alias("session_start_unix"),
                        _u("session_end").alias("session_end_unix"),
                        F.col("n_events").cast("long").alias("n_events"),
                        F.round("value_avg", 5).alias("value_avg"),
                        _u("first_ts").alias("first_unix"),
                        _u("last_ts").alias("last_unix"))
    q["streaming_sessionize_30m"] = q_streaming_sessionize_30m

    # ---------------- stateful streaming twins (§2.9, tail) ----------
    def q_streaming_gapfill_locf(spark, sf):
        """Stateful LOCF gap-filler (applyInPandasWithState), one
        availableNow batch == the batch gapfill oracle row-for-row."""
        from pyrate_spark.streaming.gapfill import streaming_gapfill_locf
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .select("url", "bucket_start", "value_avg"))
        out = _run_stateful_once(
            spark, t, lambda s: streaming_gapfill_locf(s, 3600),
            "url string, bucket_start timestamp, value_avg double")
        return out.select("url", _u("bucket_start").alias("bucket_unix"),
                          _nn(F.round("value_filled", 5))
                          .alias("value_filled"))
    q["streaming_gapfill_locf"] = q_streaming_gapfill_locf

    def q_streaming_cumsum(spark, sf):
        """Stateful running total (A6 twin) over the non-null hourly
        tier, one availableNow batch == the batch cumulative oracle."""
        from pyrate_spark.streaming.corrections import streaming_cumsum
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .where(F.col("value_avg").isNotNull())
             .select("url", "bucket_start", "value_avg"))
        out = _run_stateful_once(
            spark, t, streaming_cumsum,
            "url string, bucket_start timestamp, value_avg double")
        return out.select("url", _u("bucket_start").alias("bucket_unix"),
                          F.round("value_cuml", 5).alias("value_cuml"))
    q["streaming_cumsum"] = q_streaming_cumsum

    def q_streaming_cusum(spark, sf):
        """Stateful CUSUM twin (fixed reference mean=60 sigma=30):
        one availableNow batch == the batch target-mode operator ==
        the DuckDB prefix replay, bit-for-bit."""
        from pyrate_spark.streaming.corrections import streaming_cusum
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5))
             .where(F.col("value_avg").isNotNull())
             .select("url", "bucket_start", "value_avg"))
        out = _run_stateful_once(
            spark, t,
            lambda s: streaming_cusum(s, mean=60.0, sigma=30.0,
                                      k=0.5, h=4.0),
            "url string, bucket_start timestamp, value_avg double")
        return out.select("url", _u("bucket_start").alias("bucket_unix"),
                          F.col("value_avg"),
                          F.round("cusum_hi", 6).alias("cusum_hi"),
                          F.round("cusum_lo", 6).alias("cusum_lo"),
                          F.col("is_change"))
    q["streaming_cusum"] = q_streaming_cusum

    def q_streaming_zscore(spark, sf):
        """Stateful trailing-window z-score twin (new r6): per-url
        history state, one availableNow batch == the batch
        anomaly_zscore operator == the DuckDB fold oracle,
        bit-for-bit (same left-fold order over the same history)."""
        from pyrate_spark.streaming.corrections import streaming_zscore
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5))
             .where(F.col("value_avg").isNotNull())
             .select("url", "bucket_start", "value_avg"))
        out = _run_stateful_once(
            spark, t,
            lambda s: streaming_zscore(s, window=24, nsig=2.0,
                                       min_obs=6),
            "url string, bucket_start timestamp, value_avg double")
        return out.select("url", _u("bucket_start").alias("bucket_unix"),
                          F.col("value_avg"),
                          F.col("n_window").cast("long")
                          .alias("n_window"),
                          F.round("zscore", 6).alias("zscore"),
                          F.col("is_anomaly"))
    q["streaming_zscore"] = q_streaming_zscore

    def q_streaming_holt(spark, sf):
        """Stateful Holt twin (new r6): per-url (level, trend) state,
        one availableNow batch == the batch holt_forecast fold == the
        DuckDB recursive replay, bit-for-bit; identical-arithmetic
        rounding (floor(x*1e6+0.5)/1e6) on both sides."""
        from pyrate_spark.streaming.corrections import streaming_holt
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5))
             .where(F.col("value_avg").isNotNull())
             .select("url", "bucket_start", "value_avg"))
        out = _run_stateful_once(
            spark, t,
            lambda s: streaming_holt(s, alpha=0.5, beta=0.3),
            "url string, bucket_start timestamp, value_avg double")

        def r6(c):
            return F.floor(F.col(c) * 1e6 + F.lit(0.5)) / 1e6
        return out.select("url", _u("bucket_start").alias("bucket_unix"),
                          F.col("value_avg"),
                          r6("level").alias("level"),
                          r6("trend").alias("trend"),
                          r6("forecast").alias("forecast"),
                          r6("forecast_error").alias("forecast_error"))
    q["streaming_holt"] = q_streaming_holt

    def q_time_weighted_hourly(spark, sf):
        """TimescaleDB time_weight('LOCF') over the raw event series
        (new r6, tail): segment integrals split exactly at hour
        boundaries, averaged over COVERED seconds; hold capped at one
        day (bounds the boundary-split fan-out). The operator is fed
        INTEGER-scaled values (floor(v*1e5 + 0.5), identical
        arithmetic both sides): every v*dt term and both sums are
        then exact integers (< 2^53), so the integral is
        order-independent and the final divisions are the same two
        doubles in both engines — the gate is EXACT with no output
        rounding (plain 5-dp values sit exactly ON decimal half
        boundaries here — integer dt times 5-decimal v over 3600 —
        where Spark's and DuckDB's round() legitimately disagree)."""
        from pyrate_spark.operators.metrics import time_weighted_avg
        e = (_events(spark, sf)
             .withColumn("value",
                         F.floor(F.round("value", 5) * 1e5 + F.lit(0.5))
                         .cast("double")))
        out = time_weighted_avg(e, 3600, method="locf",
                                max_gap_sec=86400)
        return out.select("url", "bucket_start",
                          (F.col("value_twa") / 1e5).alias("value_twa"),
                          F.col("covered_sec"))
    q["time_weighted_hourly"] = q_time_weighted_hourly

    def q_deriv_hourly(spark, sf):
        """PromQL deriv(): per-(url, hour) least-squares slope of
        value vs in-bucket seconds (new r6, tail). Time is centred on
        the bucket start; < 2 samples or zero time-variance yields
        NULL. Regression sums are order-dependent -> rounded 6."""
        from pyrate_spark.operators.metrics import regression_slope
        e = (_events(spark, sf)
             .withColumn("value", F.round("value", 5)))
        out = regression_slope(e, 3600)
        return out.select("url", "bucket_start",
                          F.col("n_samples").cast("long")
                          .alias("n_samples"),
                          F.round("slope_per_sec", 6)
                          .alias("slope_per_sec"))
    q["deriv_hourly"] = q_deriv_hourly

    def q_irate_hourly(spark, sf):
        """PromQL irate(): delta of the LAST TWO samples in each
        (url, hour) over their gap, with counter-reset semantics (new
        r6, tail). No sums anywhere — both engines divide the same
        two doubles, so the gate is exact with NO rounding."""
        from pyrate_spark.operators.metrics import irate
        e = (_events(spark, sf)
             .withColumn("value", F.round("value", 5)))
        out = irate(e, 3600, counter=True)
        return out.select("url", "bucket_start",
                          F.col("n_samples"),
                          F.col("irate_per_sec"))
    q["irate_hourly"] = q_irate_hourly

    def q_histogram_q95(spark, sf):
        """PromQL histogram_quantile(0.95): cumulative le-bucket
        histograms built per (url, hour) from the event values
        (fixed le ladder 20..100, +Inf), then the Prometheus
        interpolation (new r6, tail). Counts are exact integers;
        only the final interpolation divides -> rounded 6."""
        from pyrate_spark.operators.metrics import histogram_quantile
        les = [20.0, 40.0, 60.0, 80.0, 100.0, float("inf")]
        e = (_events(spark, sf).where(F.col("value").isNotNull())
             .select("url",
                     (F.floor(F.unix_timestamp("warc_ts") / 3600)
                      .cast("long") * 3600).alias("bucket_start"),
                     F.round("value", 5).alias("value")))
        h = (e.withColumn("le", F.explode(F.array(
                 *[F.lit(x) for x in les])))
             .groupBy("url", "bucket_start", "le")
             .agg(F.sum(F.when(F.col("value") <= F.col("le"), 1)
                        .otherwise(0)).alias("cum_count")))
        out = histogram_quantile(h, 0.95)
        return out.select("url", "bucket_start", "total_count",
                          F.round("q95", 6).alias("q95"))
    q["histogram_q95"] = q_histogram_q95

    def q_streaming_seasonal(spark, sf):
        """Stream-static seasonal residual twin (new r6, tail): tier
        rows scored against the batch-derived (url, hod) profile via
        a native stream-static join, one availableNow pass == the
        batch seasonal_baseline == the DuckDB oracle (rounded-
        baseline residual policy identical to seasonal_residual)."""
        from pyrate_spark.operators.anomaly import seasonal_profile
        from pyrate_spark.streaming.corrections import (
            streaming_seasonal)
        t = (tier_rollup(_events(spark, sf), "1 hour", thresh=0.5)
             .withColumn("value_avg", F.round("value_avg", 5))
             .withColumn("bucket_start", _u("bucket_start"))
             .select("url", "bucket_start", "value_avg"))
        profile = seasonal_profile(t, ts_col="bucket_start")
        out = _run_stateful_once(
            spark, t, lambda s: streaming_seasonal(s, profile),
            "url string, bucket_start long, value_avg double")
        return out.select("url",
                          F.col("bucket_start").alias("bucket_unix"),
                          "value_avg",
                          F.col("hod").cast("int").alias("hod"),
                          F.round("baseline", 5).alias("baseline"),
                          F.round(F.col("value_avg")
                                  - F.round("baseline", 5), 5)
                          .alias("residual"),
                          F.col("n_profile"))
    q["streaming_seasonal"] = q_streaming_seasonal

    # ------- composite streaming gates (r7, VERDICT r6 ask #7) -------
    # The driver's 50-entry window can't afford one slot per stateful
    # streaming twin, so the twins are hard-gated as UNIONS: each leg
    # runs its own full streaming pass (availableNow / stateful /
    # stream-static — the same machinery as its individual tail gate),
    # projected into a shared column layout and unioned; the oracle is
    # the identical union of the legs' oracles. A value mismatch in ANY
    # leg fails the composite, so one green row == all legs green.
    # (the null-literal columns are built lazily — F.lit needs an
    # active SparkContext, and queries() is importable without one)
    def _dnull():
        return F.lit(None).cast("double")

    def _bnull():
        return F.lit(None).cast("bigint")

    def q_streaming_alert_suite(spark, sf):
        """Stateful alerting trio under one hard gate: trailing-window
        z-score + Holt level/trend forecaster + fixed-reference CUSUM,
        each an applyInPandasWithState pass over the hourly tier,
        bit-equal to its batch operator (the individual tail gates
        stay; this row is the driver-window signal for all three)."""
        z = q_streaming_zscore(spark, sf).select(
            F.lit("zscore").alias("detector"), "url", "bucket_unix",
            "value_avg",
            F.col("zscore").alias("m1"),
            F.col("n_window").cast("double").alias("m2"),
            _dnull().alias("m3"), _dnull().alias("m4"),
            F.col("is_anomaly").alias("flag"))
        h = q_streaming_holt(spark, sf).select(
            F.lit("holt").alias("detector"), "url", "bucket_unix",
            "value_avg",
            F.col("level").alias("m1"), F.col("trend").alias("m2"),
            F.col("forecast").alias("m3"),
            F.col("forecast_error").alias("m4"),
            # constant FALSE, not NULL: a nullable boolean round-trips
            # as None on the Spark side but NaN through DuckDB->pandas,
            # and the driver's value-hash sees those as different
            F.lit(False).alias("flag"))
        c = q_streaming_cusum(spark, sf).select(
            F.lit("cusum").alias("detector"), "url", "bucket_unix",
            "value_avg",
            F.col("cusum_hi").alias("m1"), F.col("cusum_lo").alias("m2"),
            _dnull().alias("m3"), _dnull().alias("m4"),
            F.col("is_change").alias("flag"))
        return z.unionByName(h).unionByName(c)
    q["streaming_alert_suite"] = q_streaming_alert_suite

    def q_streaming_tier_suite(spark, sf):
        """Stateful tier-maintenance quartet under one hard gate:
        LOCF gap-fill + running cumulative (applyInPandasWithState),
        the stream-static seasonal-residual join, and sentinel-flushed
        session windows — every leg a full streaming pass equal to its
        batch oracle; unioned into a shared layout (k* = unix keys,
        v* = values, n = counts)."""
        g = q_streaming_gapfill_locf(spark, sf).select(
            F.lit("gapfill").alias("leg"), "url",
            F.col("bucket_unix").alias("k1"), _bnull().alias("k2"),
            _bnull().alias("k3"), _bnull().alias("k4"),
            F.col("value_filled").alias("v1"), _dnull().alias("v2"),
            _dnull().alias("v3"), _bnull().alias("n"))
        cu = q_streaming_cumsum(spark, sf).select(
            F.lit("cumsum").alias("leg"), "url",
            F.col("bucket_unix").alias("k1"), _bnull().alias("k2"),
            _bnull().alias("k3"), _bnull().alias("k4"),
            F.col("value_cuml").alias("v1"), _dnull().alias("v2"),
            _dnull().alias("v3"), _bnull().alias("n"))
        se = q_streaming_seasonal(spark, sf).select(
            F.lit("seasonal").alias("leg"), "url",
            F.col("bucket_unix").alias("k1"),
            F.col("hod").cast("bigint").alias("k2"),
            _bnull().alias("k3"), _bnull().alias("k4"),
            F.col("value_avg").alias("v1"),
            F.col("baseline").alias("v2"),
            F.col("residual").alias("v3"),
            F.col("n_profile").cast("bigint").alias("n"))
        ss = q_streaming_sessionize_30m(spark, sf).select(
            F.lit("session").alias("leg"), "url",
            F.col("session_start_unix").alias("k1"),
            F.col("session_end_unix").alias("k2"),
            F.col("first_unix").alias("k3"),
            F.col("last_unix").alias("k4"),
            F.col("value_avg").alias("v1"), _dnull().alias("v2"),
            _dnull().alias("v3"),
            F.col("n_events").cast("bigint").alias("n"))
        return g.unionByName(cu).unionByName(se).unionByName(ss)
    q["streaming_tier_suite"] = q_streaming_tier_suite

    def q_heartbeat_uptime(spark, sf):
        """TimescaleDB heartbeat_agg uptime per (url, hour): each
        sample asserts 6 h of liveness, truncated at the next sample,
        clipped at hour boundaries (new r6, tail). Pure integer
        interval algebra -> the gate is exact with no rounding."""
        from pyrate_spark.operators.metrics import heartbeat_uptime
        return heartbeat_uptime(_events(spark, sf), 3600, 21600)
    q["heartbeat_uptime"] = q_heartbeat_uptime

    def q_gap_detect(spark, sf):
        """Dead-time gaps per url under the 6 h liveness rule (new
        r6, tail) — the complement of heartbeat_uptime. Exact integer
        interval algebra, no rounding."""
        from pyrate_spark.operators.metrics import gap_detect
        return gap_detect(_events(spark, sf), 21600)
    q["gap_detect"] = q_gap_detect

    def q_lttb_downsample(spark, sf):
        """LTTB perceptual downsample to 20 points per url (new r6,
        tail): canonical Steinarsson buckets, next-anchor averages as
        exact ordered folds, argmax triangle area with earliest-wins
        ties — the whole selection is a deterministic recurrence, so
        the DuckDB recursive-CTE replay (holt pattern) matches
        bit-for-bit with NO output rounding."""
        from pyrate_spark.operators.downsample import lttb_downsample
        e = (_events(spark, sf)
             .withColumn("value", F.round("value", 5)))
        return lttb_downsample(e, 20).select(
            "url", F.col("t").alias("t_unix"), F.col("v"),
            F.col("n_in"))
    q["lttb_downsample"] = q_lttb_downsample

    def q_swinging_door(spark, sf):
        """Swinging-door (SDT) compression per url, tolerance 5.0
        (new r6, tail): deterministic door recurrence, replayed
        step-for-step by a DuckDB recursive CTE — bit-exact, no
        rounding (same gate construction as lttb_downsample)."""
        from pyrate_spark.operators.downsample import swinging_door
        e = (_events(spark, sf)
             .withColumn("value", F.round("value", 5)))
        return swinging_door(e, 5.0).select(
            "url", F.col("t").alias("t_unix"), F.col("v"),
            F.col("n_in"))
    q["swinging_door"] = q_swinging_door

    def q_m4_downsample(spark, sf):
        """M4 per-bucket first/last/min/max downsample (new r7): the
        partial-aggregable member of the downsample family — one hash
        agg on (url, bucket), no per-key array. Extremes picked as
        lexicographic struct min/max so ties replay exactly in SQL
        (first/last = min/max(t, v); vmin/vmax = min/max(v, t))."""
        from pyrate_spark.operators.downsample import m4_downsample
        e = (_events(spark, sf)
             .withColumn("value", F.round("value", 5)))
        return m4_downsample(e, 6 * 3600).select(
            "url", "bucket", F.col("t").alias("t_unix"), F.col("v"),
            F.col("n_in"))
    q["m4_downsample"] = q_m4_downsample

    def q_quicklook_classmap(spark, sf):
        """S9 quicklook colour maths (merge.py:195-231): per-url mean
        rate, symmetric blue-white-red 255-entry relief, nearest-entry
        class via floor(x+0.5). The PNG/colourmap/KML emission itself
        is pytest-gated (tests/test_quicklook.py, golden hash); this
        gates the distributed class+colour assignment. Rates are
        f32-quantized on both sides so the symmetric range M (a
        driver-side scalar) is bit-identical to the oracle's."""
        from pyrate_spark.operators.quicklook import class_index_col
        per = (_events(spark, sf).groupBy("url")
               .agg(F.avg("value").cast("float").cast("double")
                    .alias("rate")))
        m = per.agg(F.greatest(F.abs(F.min("rate")),
                               F.abs(F.max("rate"))).alias("m")).first()["m"]
        # degenerate inputs (all-NULL rates -> m None; all-zero rates
        # -> m 0): class_index_col's span<=0 branch emits class 0 for
        # valid rates, and the oracle's mm-guard CASE mirrors it
        m = float(m) if m is not None else 0.0
        cls = class_index_col("rate", -m, m).alias("cls")
        c = per.select("url", F.round("rate", 5).alias("rate"), cls)
        i = F.col("cls").cast("double")
        return c.select(
            "url", "rate", "cls",
            F.round(F.lit(255.0) * F.least(F.lit(1.0),
                    (F.lit(254.0) - i) / F.lit(127.0)), 4).alias("r"),
            F.round(F.lit(255.0) * F.least(F.lit(1.0),
                    F.least(i, F.lit(254.0) - i) / F.lit(127.0)), 4)
            .alias("g"),
            F.round(F.lit(255.0) * F.least(F.lit(1.0),
                    i / F.lit(127.0)), 4).alias("b"))
    q["quicklook_classmap"] = q_quicklook_classmap

    def q_fused_rates(spark, sf):
        """Fused pairs->rates operator (one grouped-map; r4), gated the
        way the ANN recall gates are: the query executes BOTH the fused
        and the two-stage (in-window-gated) chains and emits a per-url
        bitwise-equality verdict; the oracle is the all-true url table.
        (A value-level SQL twin is out of reach here: the kernel's
        float32 cumulative series carries ~1e-7 solver noise that an
        exact integer oracle can't reproduce — the two stages' VALUES
        are gated in-window by timeseries_chain / linear_rate_kernel,
        and fusion bit-exactness is additionally pytest-asserted in
        tests/test_fused_rates.py.) Spark equality treats NaN == NaN
        as true, so all-NaN urls compare equal too."""
        from pyrate_spark.operators.grouped import linear_rate_from_pairs
        s = _events(spark, sf, nulls=False, floor_value=True)
        p = sequential_pairs(s)
        cfg = EngineConfig(ts_method=2, ts_pthr=0, velerror_nsig=1,
                           salt_buckets=16)
        two = linear_rate_per_url(
            timeseries_per_url(p, cfg, use_mst=False), cfg)
        fus = linear_rate_from_pairs(p, cfg, use_mst=False)
        cols = ["rate", "intercept", "rsquared", "error", "samples"]
        f = fus.select("url", *[F.col(c).alias(f"f_{c}") for c in cols])
        t = two.select("url", *[F.col(c).alias(f"t_{c}") for c in cols])
        ok = F.lit(True)
        for c in cols:
            # null-safe: degenerate urls carry NULL on BOTH paths
            ok = ok & F.col(f"f_{c}").eqNullSafe(F.col(f"t_{c}"))
        return (f.join(t, "url", "full")
                .select("url", ok.alias("fused_ok")))
    q["fused_rates"] = q_fused_rates

    def q_streaming_cascade_daily(spark, sf):
        """Streaming continuous-aggregate cascade (hourly tier table
        -> daily), the streaming twin of rollup_daily_cascade with the
        same weighted math — flushed with the same two-sentinel
        protocol as streaming_rollup_hourly (single-file source =
        provably single first micro-batch) and gated against the SAME
        batch-cascade oracle."""
        import datetime
        import tempfile
        from pyrate_spark.streaming.tiers import streaming_cascade_rollup
        tmp = tempfile.mkdtemp(prefix="pyrate_cascade_gate_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        ddl = ("url string, bucket_start timestamp, value_avg double, "
               "null_fraction double, n_obs long")
        h = tier_rollup(_events(spark, sf), "1 hour", thresh=0.99)
        h.coalesce(1).write.mode("overwrite").parquet(src)
        mx = h.agg(F.max("bucket_start")).first()[0]

        def one_pass():
            stream = spark.readStream.schema(ddl).parquet(src)
            job = (streaming_cascade_rollup(stream, "1 day", thresh=0.5,
                                            watermark="0 seconds")
                   .writeStream.format("parquet").option("path", out)
                   .option("checkpointLocation", ckpt)
                   .outputMode("append")
                   .trigger(availableNow=True).start())
            job.awaitTermination(300)

        one_pass()
        for days in (40, 80):
            flush = spark.createDataFrame(
                [("__flush__", mx + datetime.timedelta(days=days),
                  None, 0.0, 1)], ddl)
            flush.write.mode("append").parquet(src)
            one_pass()
        d = (spark.read.parquet(out)
             .where(F.col("url") != "__flush__"))
        return d.select("url", _u("bucket_start").alias("bucket_unix"),
                        F.round(F.col("value_avg").cast("float")
                                .cast("double"), 3).alias("value_avg"),
                        F.round("null_fraction", 6).alias("null_fraction"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["streaming_cascade_daily"] = q_streaming_cascade_daily

    def q_rollup_stats(spark, sf):
        """Order-statistics continuous aggregate (r5,
        rollup.tier_rollup_stats): exact per-bucket min/max plus
        lower-discrete p50/p95 selected from the sorted valid values —
        element selection is bit-reproducible, so the oracle replays
        it with list indexing and no rounding is needed."""
        from pyrate_spark.operators.rollup import tier_rollup_stats
        t = tier_rollup_stats(_events(spark, sf), "1 hour")
        return t.select("url", _u("bucket_start").alias("bucket_unix"),
                        "vmin", "vmax", "p50", "p95",
                        F.col("n_valid").cast("long").alias("n_valid"),
                        F.col("n_obs").cast("long").alias("n_obs"))
    q["rollup_stats"] = q_rollup_stats

    # The driver's correctness gate runs the FIRST 50 dict entries only.
    # The window holds the primary gate of every CORE operator; the
    # tail holds (a) redundant exact-baseline variants whose operators
    # are already gated by an in-window sibling, and (b) r4 additions
    # whose component maths IS in-window gated and whose own gates run
    # in every local check_oracles pass (all three scale factors) plus
    # pytest — noted per entry:
    #   dedup_jaccard   — uncapped quadratic baseline (capped variant
    #                     gates the operator, and is the scale path)
    #   dedup_cosine    — brute all-pairs baseline (dedup_cosine_lsh
    #                     gates the scale path AND recomputes this
    #                     baseline's pair count in its oracle)
    #   knn_bruteforce  — brute top-k, re-executed inside the
    #                     knn_ivf / knn_lsh recall gates every round
    #   linear_rate_sql — same oracle as linear_rate_kernel (T7/T8)
    #   rollup_weekly   — third tier variant; hourly + daily cascade
    #                     gate D1
    #   refpixel_argmin — O1 argmin, also exercised by refpixel_grid
    #                     and inside the T9 stack kernel
    #   streaming_gapfill_locf / streaming_cumsum — secondary §2.9
    #                     twins (streaming_rollup_hourly is the
    #                     in-window streaming gate; their batch twins
    #                     gapfill_locf / cumulative_hourly are
    #                     in-window, and batch-equivalence is also
    #                     pytest-asserted across micro-batch splits)
    #   frame_sample    — (moved to tail in r4) a `sequence`+`explode`
    #                     geometry op; its sibling multimodal gates
    #                     (features, resize) stay in-window and it
    #                     remains pytest-covered
    #   nn_downsample   — (moved to tail in r4) `last()` per bucket,
    #                     shadowed by the in-window D1 rollup gates
    # r4 swap (VERDICT r3 item 3): checkpoint_roundtrip (the
    # BASELINE.json resumability rule) and retention_policy (the
    # retention leg of the engine) moved INTO the window in place of
    # the two thin gates above, so the driver's hard signal covers
    # both BASELINE-level capabilities.
    # r5 swap (VERDICT r4 item 1): the three r4 additions move INTO
    # the window — the driver's hard signal now gates the path
    # bench.py actually ships (fused_rates = the headline inversion),
    # the S9 colour maths (quicklook_classmap), and the streaming
    # cascade (streaming_cascade_daily). Moved out in their place,
    # each with an in-window sibling that executes its machinery:
    #   multimodal_resize — (tail since r5) the mapInPandas decode
    #                     plumbing is gated in-window by
    #                     multimodal_features; the resize geometry is
    #                     pure column algebra, pytest-gated
    #                     (test_resize_geometry_aspect_preserving)
    #   aux_tile_average — (tail since r5) A10 tile averaging; the
    #                     same bperp tile-average path runs inside the
    #                     in-window dem_error gate
    #   closure_triangles — (tail since r5) G3/A12 loop enumeration;
    #                     the in-window closure_fixpoint gate re-runs
    #                     the triangle enumeration + signed sums every
    #                     iteration (G6 wraps G3-G5), and loop order/
    #                     signing stay pytest-gated vs the reference
    #   rollup_stats    — (new in r5, registered straight to tail so
    #                     the 50-entry window membership is unchanged)
    #                     order-statistics tier variant; D1's mean
    #                     tier gates stay in-window, and this gate
    #                     runs in every local check_oracles pass
    # r5b swap: three NEW operators move INTO the window —
    # asof_tier_join (the as-of join vs DuckDB's native ASOF LEFT
    # JOIN), gapfill_interp (T17 linear interpolation), and
    # snapshot_time_travel (the Iceberg-contract snapshot store:
    # a v2 reader must not see the later overwrite). Moved out in
    # their place, each with an in-window sibling:
    #   knn_lsh         — (tail since r5) the kNN row stays gated
    #                     in-window by knn_ivf (same recall-floor
    #                     gate construction, same brute re-execution)
    #   fingerprint     — (tail since r5) the text row keeps three
    #                     in-window legs (token_count, text_quality,
    #                     lang_id) and the stronger rolling-hash
    #                     fingerprint stays oracle-gated in the tail
    #   pricing_summary — (tail since r5) the TPC-H-style relational
    #                     anchor, not a SURVEY §2 operator; plain
    #                     groupBy/agg that every other gate exercises
    #   snapshot_merge_upsert — (new in r5, registered straight to
    #                     tail) the MERGE INTO update leg; the store's
    #                     commit/read machinery is gated in-window by
    #                     snapshot_time_travel, the insert leg and CAS
    #                     race are pytest-gated
    #   counter_rate_hourly / ewma_hourly — (new in r5, registered
    #                     straight to tail) PromQL counter semantics
    #                     and the exact-fold EWMA; both pure column
    #                     algebra over the in-window hourly tier
    #   anomaly_zscore_hourly / seasonal_residual / cusum_changepoint
    #                     — (new in r5, registered straight to tail)
    #                     trailing z-score flags (exact-fold frame
    #                     stats), the hour-of-day seasonal profile,
    #                     the Page CUSUM level-shift detector, and
    #                     Holt linear-trend forecasting; all pure
    #                     window/fold algebra over the in-window
    #                     hourly tier
    #   slo_burn_rate   — (new in r5, registered straight to tail)
    #                     SRE multi-window burn-rate alerting; exact
    #                     integer-ratio window algebra
    #   streaming_cusum — (new in r5, registered straight to tail)
    #                     stateful one-pass CUSUM twin with a fixed
    #                     (mean, sigma) reference; two-double per-url
    #                     state, bit-equal to batch target mode
    # r6 swap (VERDICT r5 item 1): six of the round-5 additions move
    # INTO the window so the driver hard-gates the anomaly/windowing
    # family — sessionize_30m, topk_hourly, counter_rate_hourly,
    # ewma_hourly, anomaly_zscore_hourly, cusum_changepoint. Moved out
    # in their place, each double-gated by an in-window sibling:
    #   rollup_daily_cascade — (tail since r6) the same hourly→daily
    #                     cascade maths is hard-gated in-window by
    #                     streaming_cascade_daily, whose oracle IS the
    #                     batch cascade replayed in DuckDB; rollup_hourly
    #                     (first tier) stays in-window
    #   timeseries_laplacian — (tail since r6) the inversion path is
    #                     triple-gated in-window by timeseries_chain
    #                     (SVD) + fused_rates (the shipped fused
    #                     kernel); the Laplacian-smoothed variant stays
    #                     oracle-gated in the tail + reference-value
    #                     pytest (test_timeseries.py)
    #   dedup_simhash   — (tail since r6) the near-dup row keeps two
    #                     in-window legs (dedup_minhash_lsh,
    #                     dedup_jaccard_capped); the pigeonhole-complete
    #                     simhash gate stays in the tail + pytest
    #   epoch_histogram / nan_fraction — (tail since r6) trivial
    #                     groupBy aggs (A1/A2) whose machinery every
    #                     in-window tier gate exercises
    #   gapfill_locf    — (tail since r6) T17's gap-fill machinery is
    #                     gated in-window by gapfill_interp (same
    #                     module path, rollup.py gap-fill core); LOCF
    #                     keeps its tail oracle, streaming twin, and
    #                     micro-batch-split pytest
    # r7 rotation (VERDICT r6 asks #1 and #7): the LAST 16 queries that
    # never had a driver CORRECTNESS row move under the hard gate —
    # the 9 batch tails (heartbeat_uptime, gap_detect, deriv_hourly,
    # histogram_q95, rollup_stats, snapshot_merge_upsert, holt_forecast,
    # slo_burn_rate, seasonal_residual) enter the window directly, and
    # the 7 stateful streaming twins enter via the two COMPOSITE gates
    # (streaming_alert_suite = zscore+holt+cusum; streaming_tier_suite
    # = gapfill_locf+cumsum+seasonal+sessionize), each leg a full
    # streaming pass whose values the union oracle recomputes. The new
    # r7 pixel_geometry gate also enters. Retired to the tail in their
    # place, each with an in-window sibling or a stability record:
    #   rollup_hourly     — identical oracle re-gated in-window by
    #                       streaming_rollup_hourly
    #   cumulative_hourly — identical oracle re-gated by the cumsum leg
    #                       of streaming_tier_suite; ewma fold family
    #                       stays in-window (ewma_hourly)
    #   refpixel_grid / los_projection — stable green since r2 (verdict
    #                       r6 explicitly sanctioned retiring); the O1
    #                       argmin also runs inside in-window T9
    #   coh_stats         — plain groupBy agg; machinery in every tier
    #                       gate
    #   retention_intersection — D2 re-gated in-window by
    #                       retention_policy
    #   token_count / text_quality — trivial column algebra; the text
    #                       row keeps lang_id + fingerprint_rolling
    #                       in-window
    #   mask_rate         — same T9 stack kernel as in-window
    #                       stack_rate_noiter (maxsig mask leg)
    #   temporal_highpass — T11 stays pytest-pinned vs reference values
    #                       (test_pairs_grouped, test_property); the
    #                       grouped-map machinery is gated in-window by
    #                       fused_rates
    #   counter_rate_hourly — PromQL counter family re-gated in-window
    #                       by irate_hourly (same module, same algebra)
    #   topk_hourly       — plain rank window over the in-window hourly
    #                       tier; windows.py sibling sessionize_30m
    #                       stays in-window
    # dem_error_derived (new r7) registers straight to tail: its
    # geometry machinery is gated in-window by pixel_geometry and its
    # regression machinery by the in-window dem_error gate.
    tail = ["frame_sample", "nn_downsample",
            "streaming_gapfill_locf", "streaming_cumsum",
            "dedup_jaccard", "dedup_cosine", "knn_bruteforce",
            "linear_rate_sql", "rollup_weekly", "refpixel_argmin",
            "multimodal_resize", "aux_tile_average",
            "closure_triangles",
            "knn_lsh", "fingerprint", "pricing_summary",
            "rollup_daily_cascade", "timeseries_laplacian",
            "dedup_simhash", "epoch_histogram", "nan_fraction",
            "gapfill_locf",
            "streaming_sessionize_30m", "streaming_cusum",
            "streaming_zscore", "streaming_holt", "streaming_seasonal",
            "sequential_pairs", "ref_median", "timeseries_chain",
            "dedup_exact",
            # r7 retirees (rationale above)
            "rollup_hourly", "cumulative_hourly", "refpixel_grid",
            "los_projection", "coh_stats", "retention_intersection",
            "token_count", "text_quality", "mask_rate",
            "temporal_highpass", "counter_rate_hourly", "topk_hourly",
            "dem_error_derived",
            # r7 second pass: the first rotation left the intended
            # window at 53 entries, so positions 51-53 (fused_rates,
            # streaming_cascade_daily, rollup_stats) silently fell
            # outside the driver's 50-row gate — and rollup_stats is
            # one of the never-driver-checked nine the rotation was FOR.
            # Retire three green-in-r6, unchanged-machinery entries:
            #   epoch_ids        — green r1-r6; S3/P9/J1 machinery also
            #                      runs inside in-window network_pairs
            #   fused_rates      — green r6; grouped-map kernel path
            #                      re-gated in-window by
            #                      linear_rate_kernel + stack_rate_noiter
            #   streaming_cascade_daily — green r6; cascade machinery
            #                      re-gated in-window by
            #                      streaming_rollup_hourly +
            #                      streaming_tier_suite
            "epoch_ids", "fused_rates", "streaming_cascade_daily",
            # r7 third pass: the OHLC + histogram-tier additions (4
            # in-window registrations) pushed the non-tail set back to
            # 54, silently dropping positions 50-53 (swinging_door,
            # m4_downsample, quicklook_classmap, rollup_stats) out of
            # the gate — rollup_stats AGAIN being one of the
            # never-driver-checked nine. Retire four green-in-r6,
            # unchanged-machinery entries:
            #   anomaly_zscore_hourly — green r6; z-score fold re-gated
            #                      in-window by streaming_alert_suite's
            #                      bit-equal streaming twin
            #   cusum_changepoint — green r6; CUSUM fold re-gated the
            #                      same way (streaming_alert_suite)
            #   ewma_hourly       — green r6; the exact-fold recurrence
            #                      family is re-gated in-window by
            #                      holt_forecast (its trend-aware form)
            #   snapshot_time_travel — green r6; the snapshot store is
            #                      re-gated in-window by
            #                      snapshot_merge_upsert (never-checked,
            #                      same commit/manifest machinery + MERGE)
            "anomaly_zscore_hourly", "cusum_changepoint",
            "ewma_hourly", "snapshot_time_travel",
            # new r7 tail registrations (window frozen at 50 for the
            # round; rotate in a future round)
            "dedup_clusters", "html_text_invariant",
            # r7 late additions (correlate/sampling/profile families):
            # tail for the same reason — locally gated via
            # check_oracles at sf0.001 + sf0.01 this round
            "corr_leadlag", "hash_split_assign", "stratified_sample",
            "profile_documents",
            # r7 final additions (webtext canonicalisation + Gopher
            # repetition filters): tail — locally gated via
            # check_oracles at sf0.001 + sf0.01 this round
            "domain_extract", "gopher_repetition", "strip_boilerplate",
            "decontaminate", "pii_scrub", "histogram_quantile_tier",
            "distinct_tier_daily"]
    ordered = {k: v for k, v in q.items() if k not in tail}
    ordered.update({k: q[k] for k in tail if k in q})
    assert len(ordered) == len(q)
    return ordered


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    ev = _events_sql()
    ev_chain = _events_sql(nulls=False, floor_value=True)
    o: dict[str, str] = {}

    o["epoch_ids"] = f"""
        SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_unix,
               dense_rank() OVER (PARTITION BY url ORDER BY warc_ts) - 1
                   AS epoch_id,
               round((epoch(warc_ts)
                      - min(epoch(warc_ts)) OVER (PARTITION BY url))
                     / {YEAR_SECONDS}, 9) AS span_years
        FROM ({ev})
    """

    o["sequential_pairs"] = f"""
        WITH s AS (
          SELECT url, warc_ts, value,
                 lag(warc_ts) OVER w AS pts, lag(value) OVER w AS pv
          FROM ({ev}) WINDOW w AS (PARTITION BY url ORDER BY warc_ts))
        SELECT url, CAST(epoch(pts) AS BIGINT) AS first_unix,
               CAST(epoch(warc_ts) AS BIGINT) AS second_unix,
               round(value - pv, 5) AS delta_value,
               round((epoch(warc_ts) - epoch(pts)) / {YEAR_SECONDS}, 9)
                   AS time_span
        FROM s WHERE pts IS NOT NULL
    """

    o["network_pairs"] = f"""
        WITH base AS (
          SELECT url, warc_ts, value,
                 avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END)
                     OVER (PARTITION BY url) AS nan_fraction
          FROM ({ev})),
        j AS (
          SELECT a.url, a.warc_ts AS ts1, b.warc_ts AS ts2,
                 b.value - a.value AS dv, a.nan_fraction,
                 row_number() OVER (PARTITION BY a.url, a.warc_ts
                                    ORDER BY b.warc_ts) AS rk
          FROM base a JOIN base b
            ON a.url = b.url AND b.warc_ts > a.warc_ts
           AND b.warc_ts <= a.warc_ts + INTERVAL 2 DAY)
        SELECT url, CAST(epoch(ts1) AS BIGINT) AS first_unix,
               CAST(epoch(ts2) AS BIGINT) AS second_unix,
               round(dv, 5) AS delta_value,
               round((epoch(ts2) - epoch(ts1)) / {YEAR_SECONDS}, 9)
                   AS time_span,
               round(nan_fraction, 6) AS nan_fraction
        FROM j WHERE rk <= 3
    """

    _thr = ("CASE WHEN null_fraction < {t} OR (null_fraction = 0 AND {t} = 0)"
            " THEN raw_avg ELSE NULL END")

    o["rollup_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL})
        SELECT url, bucket_unix,
               round({_thr.format(t=0.5)}, 5) AS value_avg,
               round(null_fraction, 6) AS null_fraction, n_obs
        FROM h
    """

    # the fully-flushed streaming tier equals the batch hourly tier
    o["streaming_rollup_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL})
        SELECT url, bucket_unix,
               round({_thr.format(t=0.5)}, 5) AS value_avg,
               round(null_fraction, 6) AS null_fraction, n_obs
        FROM h
    """

    o["rollup_daily_cascade"] = f"""
        WITH d AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     // 86400 * 86400 AS bucket_unix,
                 avg(value) AS raw_avg,
                 avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END)
                     AS null_fraction,
                 count(*) AS n_obs
          FROM ({ev}) GROUP BY 1, 2)
        SELECT url, bucket_unix,
               round(CAST(CAST({_thr.format(t=0.5)} AS FLOAT) AS DOUBLE), 3)
               AS value_avg,
               round(null_fraction, 6) AS null_fraction, n_obs
        FROM d
    """

    o["rollup_weekly"] = f"""
        WITH w AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     // 604800 * 604800 AS bucket_unix,
                 avg(value) AS raw_avg,
                 avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END)
                     AS null_fraction,
                 count(*) AS n_obs
          FROM ({ev}) GROUP BY 1, 2)
        SELECT url, bucket_unix,
               round(CAST(CAST({_thr.format(t=0.5)} AS FLOAT) AS DOUBLE), 2)
               AS value_avg, n_obs
        FROM w
    """

    o["nn_downsample"] = f"""
        WITH b AS (
          SELECT url,
                 CAST(epoch(warc_ts) AS BIGINT) // 3600 * 3600 AS bucket_unix,
                 warc_ts, value,
                 row_number() OVER (
                     PARTITION BY url,
                                  CAST(epoch(warc_ts) AS BIGINT) // 3600
                     ORDER BY warc_ts DESC, value DESC NULLS LAST) AS rk,
                 count(*) OVER (
                     PARTITION BY url,
                                  CAST(epoch(warc_ts) AS BIGINT) // 3600)
                     AS n_obs
          FROM ({ev}))
        SELECT url, bucket_unix, round(value, 5) AS value_last,
               CAST(epoch(warc_ts) AS BIGINT) AS last_unix, n_obs
        FROM b WHERE rk = 1
    """

    o["retention_intersection"] = f"""
        WITH ext AS (SELECT url, min(warc_ts) mn, max(warc_ts) mx
                     FROM ({ev}) GROUP BY url),
             b AS (SELECT max(mn) lo, min(mx) hi FROM ext)
        SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_unix,
               round(value, 5) AS value
        FROM ({ev}), b WHERE warc_ts >= b.lo AND warc_ts <= b.hi
    """

    o["cumulative_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     {_thr.format(t=0.5)} AS value_avg FROM h)
        SELECT url, bucket_unix,
               round(sum(value_avg) OVER (PARTITION BY url ORDER BY
                     bucket_unix ROWS UNBOUNDED PRECEDING), 5) AS value_cuml
        FROM v WHERE value_avg IS NOT NULL
    """

    o["gapfill_locf"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     {_thr.format(t=0.5)} AS value_avg FROM h),
        ext AS (SELECT url, min(bucket_unix) mn, max(bucket_unix) mx
                FROM v GROUP BY url),
        grid AS (SELECT url, unnest(generate_series(mn, mx, 3600))
                     AS bucket_unix FROM ext)
        SELECT g.url, g.bucket_unix,
               round(last_value(v.value_avg IGNORE NULLS) OVER (
                   PARTITION BY g.url ORDER BY g.bucket_unix), 5)
                   AS value_filled
        FROM grid g LEFT JOIN v
          ON g.url = v.url AND g.bucket_unix = v.bucket_unix
    """

    o["gapfill_interp"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        ext AS (SELECT url, min(bucket_unix) mn, max(bucket_unix) mx
                FROM v GROUP BY url),
        grid AS (SELECT url, unnest(generate_series(mn, mx, 3600))
                     AS bucket_unix FROM ext),
        j AS (SELECT g.url, g.bucket_unix, v.value_avg
              FROM grid g LEFT JOIN v
                ON g.url = v.url AND g.bucket_unix = v.bucket_unix),
        br AS (SELECT url, bucket_unix, value_avg,
               last_value(CASE WHEN value_avg IS NOT NULL
                          THEN bucket_unix END IGNORE NULLS) OVER wp AS pt,
               last_value(value_avg IGNORE NULLS) OVER wp AS pv,
               first_value(CASE WHEN value_avg IS NOT NULL
                           THEN bucket_unix END IGNORE NULLS) OVER wn AS nt,
               first_value(value_avg IGNORE NULLS) OVER wn AS nv
               FROM j
               WINDOW wp AS (PARTITION BY url ORDER BY bucket_unix
                             ROWS UNBOUNDED PRECEDING),
                      wn AS (PARTITION BY url ORDER BY bucket_unix
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING))
        SELECT url, bucket_unix,
               CASE WHEN value_avg IS NOT NULL THEN value_avg
                    WHEN pt IS NOT NULL AND nt IS NOT NULL
                    THEN pv + (nv - pv) * (bucket_unix - pt) / (nt - pt)
                    END AS value_filled
        FROM br
    """

    o["asof_tier_join"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     {_thr.format(t=0.5)} AS value_avg FROM h),
        obs AS (SELECT url, bucket_unix, value_avg FROM v
                WHERE value_avg IS NOT NULL),
        l AS (SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_unix,
                     value FROM ({ev})),
        m AS (SELECT l.url, l.ts_unix, l.value,
                     obs.bucket_unix, obs.value_avg
              FROM l ASOF LEFT JOIN obs
                ON l.url = obs.url AND l.ts_unix >= obs.bucket_unix)
        SELECT url, ts_unix, round(value, 5) AS value,
               CASE WHEN ts_unix - bucket_unix <= 7200
                    THEN bucket_unix END AS asof_unix,
               round(CASE WHEN ts_unix - bucket_unix <= 7200
                     THEN value_avg END, 5) AS asof_avg
        FROM m
    """

    # snapshot time travel: a v2 reader sees exactly the direct rollup
    # (the later overwrite must be invisible)
    o["snapshot_time_travel"] = o["rollup_hourly"]

    # counter semantics: lag-based delta with reset detection; inputs
    # pinned to round-5 on both sides, outputs unrounded (bit-equal
    # given pinned inputs — same policy as gapfill_interp)
    o["counter_rate_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        lagged AS (SELECT url, bucket_unix, value_avg,
               lag(value_avg) OVER w AS prev,
               lag(bucket_unix) OVER w AS prev_bu
               FROM v WINDOW w AS (PARTITION BY url ORDER BY bucket_unix)),
        d AS (SELECT url, bucket_unix, value_avg, prev_bu,
               CASE WHEN prev IS NULL OR value_avg IS NULL THEN NULL
                    WHEN value_avg < prev THEN value_avg
                    ELSE value_avg - prev END AS delta
              FROM lagged)
        SELECT url, bucket_unix, value_avg, delta,
               delta / (bucket_unix - prev_bu) AS rate_per_sec
        FROM d
    """

    # EWMA: DuckDB list_reduce over each sorted prefix replays the
    # exact fold the Spark aggregate() runs — bit-equal, any alpha
    o["ewma_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT * FROM (
                  SELECT url, bucket_unix,
                         round({_thr.format(t=0.5)}, 5) AS value_avg
                  FROM h) WHERE value_avg IS NOT NULL),
        s AS (SELECT url,
                     list(bucket_unix ORDER BY bucket_unix) AS ts,
                     list(value_avg ORDER BY bucket_unix) AS vs
              FROM v GROUP BY url)
        SELECT url, unnest(ts) AS bucket_unix,
               unnest(vs) AS value_avg,
               unnest(list_transform(range(1, len(vs) + 1),
                   i -> list_reduce(vs[1:i],
                        (acc, x) -> acc * 0.7 + x * 0.3)))
                   AS value_ewma
        FROM s
    """

    # trailing z-score: the frame list over ROWS BETWEEN 24 PRECEDING
    # AND 1 PRECEDING is folded with an explicit 0.0 initial value
    # (list_prepend) so sum and sum-of-squares replay Spark's
    # aggregate() fold order bit-for-bit; mean/var/std/z then agree
    # exactly and the flag needs no tolerance
    o["anomaly_zscore_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT * FROM v WHERE value_avg IS NOT NULL),
        s AS (SELECT url, bucket_unix, value_avg,
                     COALESCE(list(value_avg) OVER (PARTITION BY url
                         ORDER BY bucket_unix
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
                         CAST([] AS DOUBLE[])) AS hist
              FROM nn),
        c AS (SELECT url, bucket_unix, value_avg,
                     len(hist) AS n_window,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE), hist),
                                 (a, x) -> a + x) AS s1,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                     list_transform(hist, x -> x * x)),
                                 (a, x) -> a + x) AS s2
              FROM s),
        m AS (SELECT url, bucket_unix, value_avg, n_window,
                     CASE WHEN n_window > 0 THEN s1 / n_window END AS mean,
                     s2 FROM c),
        d AS (SELECT url, bucket_unix, value_avg, n_window, mean,
                     CASE WHEN n_window > 1
                          THEN (s2 - n_window * mean * mean)
                               / (n_window - 1) END AS var FROM m),
        e AS (SELECT url, bucket_unix, value_avg, n_window, mean,
                     CASE WHEN var > 0 THEN sqrt(var) END AS std FROM d),
        z AS (SELECT url, bucket_unix, value_avg, n_window,
                     CASE WHEN std IS NOT NULL
                          THEN (value_avg - mean) / std END AS zraw
              FROM e)
        SELECT url, bucket_unix, value_avg, n_window,
               round(zraw, 6) AS zscore,
               CASE WHEN zraw IS NOT NULL AND n_window >= 6
                         AND abs(zraw) > 2.0
                    THEN TRUE ELSE FALSE END AS is_anomaly
        FROM z
    """

    # seasonal profile: integer hour-of-day from the epoch bucket on
    # both sides (timezone-free), plain windowed avg rounded like
    # every other groupBy-avg gate
    o["seasonal_residual"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT url, bucket_unix, value_avg,
                      CAST((bucket_unix % 86400) // 3600 AS INTEGER)
                          AS hod
               FROM v WHERE value_avg IS NOT NULL),
        p AS (SELECT url, hod,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list(value_avg ORDER BY bucket_unix)),
                         (a, x) -> a + x) / count(*) AS baseline,
                     count(*) AS n_profile
              FROM nn GROUP BY url, hod)
        SELECT nn.url, nn.bucket_unix, nn.value_avg, nn.hod,
               round(p.baseline, 5) AS baseline,
               round(nn.value_avg - round(p.baseline, 5), 5)
                   AS residual,
               p.n_profile
        FROM nn JOIN p ON nn.url = p.url AND nn.hod = p.hod
    """

    # CUSUM: mean/sigma via the exact list_prepend fold, z = 0.0 for
    # sigma-less urls (outputs nulled), then the Page recurrence
    # replayed per prefix; element init greatest(0, 0+z-k) equals
    # Spark's first fold step bit-for-bit, combine keeps the same
    # (acc + z) - k grouping
    o["cusum_changepoint"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT * FROM v WHERE value_avg IS NOT NULL),
        g AS (SELECT url,
                     list(value_avg ORDER BY bucket_unix) AS vs,
                     list(bucket_unix ORDER BY bucket_unix) AS ts
              FROM nn GROUP BY url),
        st AS (SELECT url, vs, ts, len(vs) AS n,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vs),
                                  (a, x) -> a + x) AS s1,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list_transform(vs, x -> x * x)),
                                  (a, x) -> a + x) AS s2
               FROM g),
        m AS (SELECT url, vs, ts, n, s1 / n AS mean, s2 FROM st),
        d AS (SELECT url, vs, ts, n, mean,
                     CASE WHEN n > 1
                          THEN (s2 - n * mean * mean) / (n - 1)
                          END AS var FROM m),
        e AS (SELECT url, vs, ts, mean,
                     CASE WHEN var > 0 THEN sqrt(var) END AS sigma
              FROM d),
        z AS (SELECT url, vs, ts, sigma,
                     list_transform(vs, x ->
                         CASE WHEN sigma IS NULL THEN CAST(0.0 AS DOUBLE)
                              ELSE (x - mean) / sigma END) AS zs
              FROM e),
        r AS (SELECT url, vs, ts, sigma,
                     list_transform(range(1, len(zs) + 1), i ->
                         struct_extract(list_reduce(
                             list_transform(zs[1:i], zz -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) + zz - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) - zz - 0.5),
                                 'z': zz}}),
                             (a, b) -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          a.hi + b.z - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          a.lo - b.z - 0.5),
                                 'z': b.z}}), 'hi')) AS his,
                     list_transform(range(1, len(zs) + 1), i ->
                         struct_extract(list_reduce(
                             list_transform(zs[1:i], zz -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) + zz - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) - zz - 0.5),
                                 'z': zz}}),
                             (a, b) -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          a.hi + b.z - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          a.lo - b.z - 0.5),
                                 'z': b.z}}), 'lo')) AS los
              FROM z),
        u AS (SELECT url, sigma,
                     unnest(ts) AS bucket_unix,
                     unnest(vs) AS value_avg,
                     unnest(his) AS hi,
                     unnest(los) AS lo
              FROM r)
        SELECT url, bucket_unix, value_avg,
               CASE WHEN sigma IS NULL THEN NULL
                    ELSE round(hi, 6) END AS cusum_hi,
               CASE WHEN sigma IS NULL THEN NULL
                    ELSE round(lo, 6) END AS cusum_lo,
               CASE WHEN sigma IS NOT NULL AND (hi > 4.0 OR lo > 4.0)
                    THEN TRUE ELSE FALSE END AS is_change
        FROM u
    """

    # streaming CUSUM: fixed-reference replay (mean=60 sigma=30, so
    # no estimation CTEs); field order keeps every accumulator read
    # ahead of its overwrite (see the batch cusum note)
    o["streaming_cusum"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT * FROM v WHERE value_avg IS NOT NULL),
        g AS (SELECT url,
                     list(value_avg ORDER BY bucket_unix) AS vs,
                     list(bucket_unix ORDER BY bucket_unix) AS ts
              FROM nn GROUP BY url),
        z AS (SELECT url, vs, ts,
                     list_transform(vs, x -> (x - 60.0) / 30.0) AS zs
              FROM g),
        r AS (SELECT url, vs, ts,
                     list_transform(range(1, len(zs) + 1), i ->
                         struct_extract(list_reduce(
                             list_transform(zs[1:i], zz -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) + zz - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) - zz - 0.5),
                                 'z': zz}}),
                             (a, b) -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          a.hi + b.z - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          a.lo - b.z - 0.5),
                                 'z': b.z}}), 'hi')) AS his,
                     list_transform(range(1, len(zs) + 1), i ->
                         struct_extract(list_reduce(
                             list_transform(zs[1:i], zz -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) + zz - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          CAST(0.0 AS DOUBLE) - zz - 0.5),
                                 'z': zz}}),
                             (a, b) -> {{'hi':
                                 greatest(CAST(0.0 AS DOUBLE),
                                          a.hi + b.z - 0.5),
                                 'lo': greatest(CAST(0.0 AS DOUBLE),
                                          a.lo - b.z - 0.5),
                                 'z': b.z}}), 'lo')) AS los
              FROM z),
        u AS (SELECT url,
                     unnest(ts) AS bucket_unix,
                     unnest(vs) AS value_avg,
                     unnest(his) AS hi,
                     unnest(los) AS lo
              FROM r)
        SELECT url, bucket_unix, value_avg,
               round(hi, 6) AS cusum_hi,
               round(lo, 6) AS cusum_lo,
               CASE WHEN hi > 4.0 OR lo > 4.0
                    THEN TRUE ELSE FALSE END AS is_change
        FROM u
    """

    # burn rate: integer violation counts over two trailing frames,
    # divided once — exact, no fold or rounding machinery
    o["slo_burn_rate"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT url, bucket_unix, value_avg,
                      CASE WHEN value_avg > 80.0 THEN 1 ELSE 0 END
                          AS viol
               FROM v WHERE value_avg IS NOT NULL),
        w AS (SELECT url, bucket_unix, value_avg, viol,
                     CAST(sum(viol) OVER ws AS DOUBLE)
                         / count(*) OVER ws AS short_rate,
                     CAST(sum(viol) OVER wl AS DOUBLE)
                         / count(*) OVER wl AS long_rate
              FROM nn
              WINDOW ws AS (PARTITION BY url ORDER BY bucket_unix
                            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
                     wl AS (PARTITION BY url ORDER BY bucket_unix
                            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        SELECT url, bucket_unix, value_avg,
               viol = 1 AS violation, short_rate, long_rate,
               short_rate > 0.5 AND long_rate > 0.5 AS is_burning
        FROM w
    """

    # Holt: recursive-CTE replay of the level/trend recurrence, one
    # recursion step per bucket rank. NOT list_reduce: DuckDB's
    # struct-accumulator lambda updates fields in declaration order,
    # so a later field reading a same-named accumulator field sees
    # the NEW value (verified on a toy series) — the recursive join
    # has standard previous-row semantics instead. Expression
    # grouping mirrors Spark's fold verbatim, so values are bit-equal
    o["holt_forecast"] = f"""
        WITH RECURSIVE h AS ({_HOURLY_SQL}),
        v AS (SELECT url, bucket_unix,
                     round({_thr.format(t=0.5)}, 5) AS value_avg FROM h),
        nn AS (SELECT url, bucket_unix, value_avg,
                      row_number() OVER (PARTITION BY url
                                         ORDER BY bucket_unix) AS rn
               FROM v WHERE value_avg IS NOT NULL),
        seq AS (
            SELECT url, rn, bucket_unix, value_avg,
                   value_avg AS l, CAST(0.0 AS DOUBLE) AS b,
                   CAST(NULL AS DOUBLE) AS f
            FROM nn WHERE rn = 1
            UNION ALL
            SELECT n.url, n.rn, n.bucket_unix, n.value_avg,
                   0.5 * n.value_avg + 0.5 * (s.l + s.b) AS l,
                   0.3 * ((0.5 * n.value_avg + 0.5 * (s.l + s.b))
                          - s.l) + 0.7 * s.b AS b,
                   s.l + s.b AS f
            FROM seq s JOIN nn n
              ON n.url = s.url AND n.rn = s.rn + 1)
        SELECT url, bucket_unix, value_avg,
               floor(l * 1000000.0 + 0.5) / 1000000.0 AS level,
               floor(b * 1000000.0 + 0.5) / 1000000.0 AS trend,
               floor(f * 1000000.0 + 0.5) / 1000000.0 AS forecast,
               floor((value_avg - f) * 1000000.0 + 0.5) / 1000000.0
                   AS forecast_error
        FROM seq
    """

    # sessionization: gaps-and-islands replay of session_window —
    # same-session iff ts - prev <= 1800 (Spark merges sessions whose
    # [start, last+gap] windows touch, so an event at exactly
    # prev+gap JOINS the session — pinned by
    # test_sessionize_gap_semantics); session_end = last event + gap
    o["sessionize_30m"] = f"""
        WITH e AS (SELECT url,
                          CAST(epoch(warc_ts) AS BIGINT) AS ts,
                          value FROM ({ev})),
        o AS (SELECT url, ts, value,
              CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > 1800
                   THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY url ORDER BY ts)),
        s AS (SELECT url, ts, value,
              sum(brk) OVER (PARTITION BY url ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
        SELECT url,
               min(ts) AS session_start_unix,
               max(ts) + 1800 AS session_end_unix,
               count(*) AS n_events,
               round(avg(value), 5) AS value_avg,
               min(ts) AS first_unix,
               max(ts) AS last_unix
        FROM s GROUP BY url, sid
    """

    # heavy hitters: row_number inside the bucket on round-5-pinned
    # values, ties on url ascending (both sides)
    o["topk_hourly"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        v AS (SELECT * FROM (
                  SELECT url, bucket_unix,
                         round({_thr.format(t=0.5)}, 5) AS value_avg
                  FROM h) WHERE value_avg IS NOT NULL),
        r AS (SELECT url, bucket_unix, value_avg,
              row_number() OVER (PARTITION BY bucket_unix
                                 ORDER BY value_avg DESC, url ASC)
                  AS rank
              FROM v)
        SELECT url, bucket_unix, value_avg, rank
        FROM r WHERE rank <= 3
    """

    # MERGE INTO: post-upsert state == direct rollup with the delta's
    # transform applied to the matched keys (x0.5 is exponent-only, so
    # round-5 behaves identically to the plain rollup_hourly gate)
    o["snapshot_merge_upsert"] = f"""
        WITH h AS ({_HOURLY_SQL})
        SELECT url, bucket_unix,
               round(CASE WHEN bucket_unix % 7200 = 0
                     THEN ({_thr.format(t=0.5)}) * 0.5
                     ELSE {_thr.format(t=0.5)} END, 5) AS value_avg,
               round(null_fraction, 6) AS null_fraction, n_obs
        FROM h
    """

    # stateful streaming twins replay the SAME batch oracles
    o["streaming_sessionize_30m"] = o["sessionize_30m"]
    o["streaming_gapfill_locf"] = o["gapfill_locf"]
    o["streaming_cumsum"] = o["cumulative_hourly"]
    # streaming continuous-aggregate cascade == the batch cascade
    o["streaming_cascade_daily"] = o["rollup_daily_cascade"]
    # persistence round-trip: checkpointed store == direct rollup
    o["checkpoint_roundtrip"] = o["rollup_hourly"]

    # retention policy: day-aligned cutoff = day(max) - (keep-1) days;
    # hourly buckets are day-prefix-aligned so the bucket_unix >=
    # cutoff comparison equals the date_trunc predicate
    o["retention_policy"] = f"""
        WITH e AS ({ev}),
        mx AS (SELECT date_trunc('day', max(warc_ts)) AS d0 FROM e),
        h AS ({_HOURLY_SQL}),
        d AS (SELECT url, bucket_unix // 86400 * 86400 AS db
              FROM h GROUP BY 1, 2)
        SELECT 'raw' AS tier,
               (SELECT CAST(epoch(d0 - INTERVAL 13 DAY) AS BIGINT)
                FROM mx) AS cutoff_unix,
               (SELECT count(*) FROM e, mx
                WHERE e.warc_ts >= mx.d0 - INTERVAL 13 DAY) AS n_rows
        UNION ALL
        SELECT 'hourly',
               (SELECT CAST(epoch(d0 - INTERVAL 20 DAY) AS BIGINT)
                FROM mx),
               (SELECT count(*) FROM h, mx
                WHERE h.bucket_unix >=
                      CAST(epoch(mx.d0 - INTERVAL 20 DAY) AS BIGINT))
        UNION ALL
        SELECT 'daily', NULL, (SELECT count(*) FROM d)
    """

    o["nan_fraction"] = f"""
        SELECT url,
               round(avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6)
                   AS nan_fraction,
               count(*) AS n
        FROM ({ev}) GROUP BY url
    """

    o["epoch_histogram"] = f"""
        SELECT CAST(epoch(warc_ts) AS BIGINT) AS ts_unix,
               count(*) AS n_repeat FROM ({ev}) GROUP BY 1
    """

    o["ref_median"] = f"""
        WITH m AS (SELECT url, median(value) med FROM ({ev}) GROUP BY url)
        SELECT e.url, CAST(epoch(e.warc_ts) AS BIGINT) AS ts_unix,
               round(e.value - m.med, 5) AS value_centred
        FROM ({ev}) e JOIN m ON e.url = m.url
    """

    o["refpixel_argmin"] = f"""
        SELECT url, round(sd, 6) AS sd, nvalid FROM (
          SELECT url, stddev_samp(value) sd, count(value) nvalid
          FROM ({ev}) GROUP BY url) t
        WHERE nvalid >= 10
        ORDER BY sd ASC NULLS LAST, url ASC LIMIT 1
    """

    o["refpixel_grid"] = f"""
        WITH s AS (SELECT substr(url, 1, 1) AS cohort,
                          CAST(epoch(date_trunc('second', warc_ts))
                               AS BIGINT) // 86400 AS d, value
                   FROM ({ev})),
        L AS (SELECT count(DISTINCT d) AS n_layers FROM s),
        per AS (SELECT cohort, d, stddev_pop(value) sd, count(value) nv
                FROM s GROUP BY 1, 2),
        cand AS (SELECT cohort, count(*) n_present,
                        min(CASE WHEN nv > 2 THEN 1 ELSE 0 END) ok,
                        avg(sd) mean_sd
                 FROM per GROUP BY cohort)
        SELECT cohort, round(mean_sd, 5) AS mean_sd, n_layers
        FROM cand, L
        WHERE ok = 1 AND n_present = n_layers
        ORDER BY mean_sd ASC NULLS LAST, cohort ASC LIMIT 1
    """

    o["los_projection"] = f"""
        SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_unix,
               round(value / cos(0.3 + 0.5 *
                     (CAST(epoch(warc_ts) AS BIGINT) % 100) / 100.0), 5)
                   AS value_vert
        FROM ({ev})
    """

    # T4 twin: the 4-epoch method-1 system has 3 unknowns; its smoothed
    # normal equations solve by 3x3 Cramer. A rows: diag(s) data rows,
    # f*[1,-2,1] (2nd-order Laplacian), [1,-1/2,-1/2], [-1/2,-1/2,1]
    # (edge constraints, unscaled — reference timeseries.py:249-253).
    _f = repr(10.0 ** -0.25)
    o["timeseries_laplacian"] = f"""
        WITH s AS (SELECT url, warc_ts, value,
                          row_number() OVER (PARTITION BY url
                                             ORDER BY warc_ts) rn
                   FROM ({_events_sql(nulls=False)})),
        s4 AS (SELECT * FROM s WHERE rn IN (1, 21, 41, 61)),
        ok AS (SELECT url FROM s4 GROUP BY url HAVING count(*) = 4),
        p AS (SELECT s4.url,
                max(CASE WHEN rn = 1 THEN epoch(warc_ts) END) t0,
                max(CASE WHEN rn = 21 THEN epoch(warc_ts) END) t1,
                max(CASE WHEN rn = 41 THEN epoch(warc_ts) END) t2,
                max(CASE WHEN rn = 61 THEN epoch(warc_ts) END) t3,
                max(CASE WHEN rn = 1 THEN value END) v0,
                max(CASE WHEN rn = 21 THEN value END) v1,
                max(CASE WHEN rn = 41 THEN value END) v2,
                max(CASE WHEN rn = 61 THEN value END) v3
              FROM s4 JOIN ok USING (url) GROUP BY s4.url),
        m AS (SELECT url, t0, t1, t2, t3,
                (t1 - t0) / {YEAR_SECONDS} AS s1,
                (t2 - t1) / {YEAR_SECONDS} AS s2,
                (t3 - t2) / {YEAR_SECONDS} AS s3,
                v1 - v0 AS d1, v2 - v1 AS d2, v3 - v2 AS d3,
                CAST({_f} AS DOUBLE) * CAST({_f} AS DOUBLE) AS ff
              FROM p),
        nn AS (SELECT url, t0, t1, t2, t3, s1, s2, s3,
                s1*s1 + ff + 1.25 AS a11,
                -2*ff - 0.25      AS a12,
                ff - 1            AS a13,
                s2*s2 + 4*ff + 0.5 AS a22,
                -2*ff - 0.25      AS a23,
                s3*s3 + ff + 1.25 AS a33,
                s1 * d1 AS c1, s2 * d2 AS c2, s3 * d3 AS c3
              FROM m),
        sol AS (SELECT url, t0, t1, t2, t3, s1, s2, s3,
                 (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3)
                  + a13*(c2*a23 - a22*c3)) / det AS v1,
                 (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13)
                  + a13*(a12*c3 - c2*a13)) / det AS v2,
                 (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13)
                  + c1*(a12*a23 - a22*a13)) / det AS v3
                FROM (SELECT *,
                        a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
                        + a13*(a12*a23 - a22*a13) AS det
                      FROM nn)),
        f32 AS (SELECT url, t0, t1, t2, t3, s1, s2, s3,
                 CASE WHEN CAST(v1 AS FLOAT) = 0 THEN NULL
                      ELSE CAST(v1 AS FLOAT) END AS v1f,
                 CASE WHEN CAST(v2 AS FLOAT) = 0 THEN NULL
                      ELSE CAST(v2 AS FLOAT) END AS v2f,
                 CASE WHEN CAST(v3 AS FLOAT) = 0 THEN NULL
                      ELSE CAST(v3 AS FLOAT) END AS v3f
                FROM sol),
        cum AS (SELECT url, t0, t1, t2, t3,
                 CAST(CAST(v1f AS DOUBLE) * s1 AS FLOAT) AS i1,
                 CAST(CAST(v2f AS DOUBLE) * s2 AS FLOAT) AS i2,
                 CAST(CAST(v3f AS DOUBLE) * s3 AS FLOAT) AS i3
                FROM f32),
        cml AS (SELECT url, t0, t1, t2, t3, i1 AS u1,
                 CAST(CAST(i1 AS DOUBLE) + CAST(i2 AS DOUBLE) AS FLOAT)
                     AS u2
                FROM cum),
        cml2 AS (SELECT c.*, m2.i3,
                  CAST(CAST(u2 AS DOUBLE) + CAST(m2.i3 AS DOUBLE)
                       AS FLOAT) AS u3
                 FROM cml c JOIN cum m2 USING (url, t0, t1, t2, t3))
        SELECT url, CAST(t0 AS BIGINT) AS epoch_unix, 0.0 AS tscuml
        FROM cml2
        UNION ALL SELECT url, CAST(t1 AS BIGINT),
                         round(CAST(u1 AS DOUBLE), 4) FROM cml2
        UNION ALL SELECT url, CAST(t2 AS BIGINT),
                         round(CAST(u2 AS DOUBLE), 4) FROM cml2
        UNION ALL SELECT url, CAST(t3 AS BIGINT),
                         round(CAST(u3 AS DOUBLE), 4) FROM cml2
    """

    o["coh_stats"] = f"""
        SELECT url,
               round(CAST(CAST(median(value) AS FLOAT) AS DOUBLE), 5)
                   AS med,
               round(CAST(CAST(avg(value) AS FLOAT) AS DOUBLE), 5)
                   AS mean,
               round(CAST(CAST(stddev_samp(value) AS FLOAT) AS DOUBLE), 5)
                   AS sd
        FROM ({ev}) GROUP BY url
    """

    _lr = f"""
        SELECT url, regr_slope(value, t) slope, regr_intercept(value, t) icept,
               regr_r2(value, t) r2, regr_count(value, t) n,
               regr_sxx(value, t) sxx, regr_syy(value, t) syy
        FROM (SELECT url, value,
                     (epoch(warc_ts)
                      - min(epoch(warc_ts)) OVER (PARTITION BY url))
                     / {YEAR_SECONDS} AS t
              FROM ({ev}) WHERE value IS NOT NULL)
        GROUP BY url HAVING regr_count(value, t) >= 2
    """
    _lr_sel = """
        SELECT url, round(slope, 3) AS rate, round(icept, 3) AS intercept,
               round(r2, 6) AS rsquared,
               round(sqrt((1 - r2) * syy / sxx / (n - 2)), 3) AS error,
               n AS samples
    """
    o["linear_rate_sql"] = f"{_lr_sel} FROM ({_lr})"
    o["linear_rate_kernel"] = f"{_lr_sel} FROM ({_lr})"

    # fused pairs->rates: equality-verdict gate (see q_fused_rates) —
    # the oracle is the all-true table over urls with >= 2 snapshots
    # (the set both chains produce rows for)
    o["fused_rates"] = f"""
        SELECT url, true AS fused_ok
        FROM ({ev_chain}) GROUP BY url HAVING count(*) >= 2
    """

    o["stack_rate_noiter"] = f"""
        WITH s AS (
          SELECT url, warc_ts, value, lag(warc_ts) OVER w AS pts,
                 lag(value) OVER w AS pv
          FROM ({ev}) WINDOW w AS (PARTITION BY url ORDER BY warc_ts)),
        p AS (SELECT url, value - pv AS dv,
                     (epoch(warc_ts) - epoch(pts)) / {YEAR_SECONDS} AS sp
              FROM s WHERE pts IS NOT NULL)
        SELECT url,
               round(sum(sp * dv) FILTER (dv IS NOT NULL)
                     / sum(sp * sp) FILTER (dv IS NOT NULL), 2) AS rate,
               round(sqrt(1.0 / sum(sp * sp) FILTER (dv IS NOT NULL)), 2)
                   AS error,
               count(dv) AS samples
        FROM p GROUP BY url
    """

    o["mask_rate"] = f"""
        WITH st AS ({o['stack_rate_noiter'].replace('round(', 'round(').strip()})
        SELECT url,
               CASE WHEN error > 500.0 THEN NULL ELSE rate END AS rate_masked,
               CASE WHEN error > 500.0 THEN NULL ELSE error END AS error_masked
        FROM st
    """

    # reference quirk preserved: tsvel == 0 -> NaN (timeseries.py:149),
    # and cumsum propagates it — so once any interval delta is exactly 0,
    # every later tscuml of that url is NULL
    o["timeseries_chain"] = f"""
        WITH s AS (SELECT url, warc_ts, value,
                          first_value(value) OVER w AS v0,
                          value - lag(value) OVER w AS delta
                   FROM ({ev_chain})
                   WINDOW w AS (PARTITION BY url ORDER BY warc_ts)),
        z AS (SELECT url, warc_ts, value, v0,
                     max(CASE WHEN delta = 0 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY url ORDER BY warc_ts
                               ROWS UNBOUNDED PRECEDING) AS zeroed
              FROM s)
        SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS epoch_unix,
               CASE WHEN zeroed = 1 THEN NULL
                    ELSE CAST(round(value - v0, 0) AS BIGINT) END AS tscuml
        FROM z
    """

    o["mst_edge_count"] = f"""
        WITH base AS (SELECT url, warc_ts FROM ({_events_sql(nulls=False)})),
        j AS (SELECT a.url, a.warc_ts ts1, b.warc_ts ts2,
                     row_number() OVER (PARTITION BY a.url, a.warc_ts
                                        ORDER BY b.warc_ts) rk
              FROM base a JOIN base b
                ON a.url = b.url AND b.warc_ts > a.warc_ts
               AND b.warc_ts <= a.warc_ts + INTERVAL 30 DAY),
        pairs AS (SELECT DISTINCT url, ts1, ts2 FROM j WHERE rk <= 2),
        nodes AS (SELECT url, count(DISTINCT ts) n_epochs FROM (
            SELECT url, ts1 AS ts FROM pairs
            UNION SELECT url, ts2 FROM pairs) GROUP BY url)
        SELECT p.url, n.n_epochs - 1 AS mst_edges, count(*) AS n_pairs
        FROM pairs p JOIN nodes n ON p.url = n.url
        GROUP BY p.url, n.n_epochs
    """

    o["orbital_detrend"] = f"""
        WITH s AS (SELECT url, warc_ts, value,
                          (epoch(warc_ts)
                           - min(epoch(warc_ts)) OVER (PARTITION BY url))
                          / {YEAR_SECONDS} AS t
                   FROM ({ev}) WHERE value IS NOT NULL),
        r AS (SELECT url, regr_slope(value, t) sl,
                     regr_intercept(value, t) ic
              FROM s GROUP BY url)
        SELECT s.url, CAST(epoch(s.warc_ts) AS BIGINT) AS ts_unix,
               round(s.value - (r.ic + r.sl * s.t), 4) AS value_detr
        FROM s JOIN r ON s.url = r.url
    """

    o["ref_phase_subtract"] = f"""
        WITH e AS (SELECT url, warc_ts, value,
                          CAST(epoch(warc_ts) AS BIGINT) // 86400 * 86400
                              AS d
                   FROM ({ev})),
        m AS (SELECT d, median(value) med FROM e GROUP BY d)
        SELECT e.url, CAST(epoch(e.warc_ts) AS BIGINT) AS ts_unix,
               round(e.value - coalesce(m.med, 0) - 1e-20, 5) + 0.0
                   AS value_centred
        FROM e JOIN m ON e.d = m.d
    """

    o["closure_triangles"] = f"""
        WITH base AS (SELECT url, warc_ts
                      FROM ({_events_sql(nulls=False)})),
        j AS (SELECT a.url, a.warc_ts ts1, b.warc_ts ts2,
                     row_number() OVER (PARTITION BY a.url, a.warc_ts
                                        ORDER BY b.warc_ts) rk
              FROM base a JOIN base b
                ON a.url = b.url AND b.warc_ts > a.warc_ts
               AND b.warc_ts <= a.warc_ts + INTERVAL 30 DAY),
        p AS (SELECT DISTINCT url, ts1, ts2 FROM j WHERE rk <= 2),
        tri AS (
          SELECT p1.url, count(*) AS n
          FROM p p1
          JOIN p p2 ON p2.url = p1.url AND p2.ts1 = p1.ts2
          JOIN p p3 ON p3.url = p1.url AND p3.ts1 = p1.ts1
                   AND p3.ts2 = p2.ts2
          GROUP BY p1.url),
        urls AS (SELECT DISTINCT url FROM p)
        SELECT u.url, coalesce(t.n, 0) AS n_loops
        FROM urls u LEFT JOIN tri t ON u.url = t.url
    """

    o["closure_sums_tri"] = f"""
        WITH base AS (SELECT url, warc_ts, value
                      FROM ({_events_sql(nulls=False)})),
        j AS (SELECT a.url, a.warc_ts ts1, b.warc_ts ts2,
                     b.value - a.value AS dv,
                     row_number() OVER (PARTITION BY a.url, a.warc_ts
                                        ORDER BY b.warc_ts) rk
              FROM base a JOIN base b
                ON a.url = b.url AND b.warc_ts > a.warc_ts
               AND b.warc_ts <= a.warc_ts + INTERVAL 30 DAY),
        p AS (SELECT url, ts1, ts2, dv FROM j WHERE rk <= 2),
        tri AS (
          SELECT p1.url,
                 CAST(epoch(p1.ts1) AS BIGINT) AS a,
                 CAST(epoch(p1.ts2) AS BIGINT) AS b,
                 CAST(epoch(p2.ts2) AS BIGINT) AS c,
                 p1.dv + p2.dv - p3.dv AS closure
          FROM p p1
          JOIN p p2 ON p2.url = p1.url AND p2.ts1 = p1.ts2
          JOIN p p3 ON p3.url = p1.url AND p3.ts1 = p1.ts1
                   AND p3.ts2 = p2.ts2)
        SELECT url,
               CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR) || '|'
                 || CAST(c AS VARCHAR) AS loop_key,
               CAST(3 AS BIGINT) AS n_edges,
               CAST(2 * (c - a) AS DOUBLE) AS loop_weight,
               round(closure, 5) AS closure
        FROM tri
    """

    o["closure_classmap"] = f"""
        WITH base AS (SELECT url, warc_ts, value
                      FROM ({_events_sql(nulls=False)})),
        j AS (SELECT a.url, a.warc_ts ts1, b.warc_ts ts2,
                     b.value - a.value AS dv,
                     row_number() OVER (PARTITION BY a.url, a.warc_ts
                                        ORDER BY b.warc_ts) rk
              FROM base a JOIN base b
                ON a.url = b.url AND b.warc_ts > a.warc_ts
               AND b.warc_ts <= a.warc_ts + INTERVAL 30 DAY),
        p AS (SELECT url, ts1, ts2, dv FROM j WHERE rk <= 2),
        tri AS (
          SELECT p1.url,
                 CAST(epoch(p1.ts1) AS BIGINT) AS a,
                 CAST(epoch(p1.ts2) AS BIGINT) AS b,
                 CAST(epoch(p2.ts2) AS BIGINT) AS c,
                 round(p1.dv + p2.dv - p3.dv, 5) AS closure
          FROM p p1
          JOIN p p2 ON p2.url = p1.url AND p2.ts1 = p1.ts2
          JOIN p p3 ON p3.url = p1.url AND p3.ts1 = p1.ts1
                   AND p3.ts2 = p2.ts2),
        m AS (SELECT 10.0 * pi() AS mm)
        SELECT url,
               CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR) || '|'
                 || CAST(c AS VARCHAR) AS loop_key,
               closure,
               least(254, greatest(0, CAST(floor(
                   (closure + mm) / (mm + mm) * 254.0 + 0.5) AS INT)))
                   AS cls
        FROM tri, m
    """

    o["orbital_network"] = f"""
        WITH s AS (SELECT url, warc_ts, value,
                          first_value(value) OVER w AS v0,
                          lag(warc_ts) OVER w AS pts
                   FROM ({ev_chain})
                   WINDOW w AS (PARTITION BY url ORDER BY warc_ts))
        SELECT url, CAST(epoch(pts) AS BIGINT) AS first_unix,
               CAST(epoch(warc_ts) AS BIGINT) AS second_unix,
               0.0 AS corrected,
               CAST(round(value - v0, 0) AS BIGINT) AS o_second
        FROM s WHERE pts IS NOT NULL
    """

    o["closure_fixpoint"] = f"""
        WITH base AS (SELECT url, warc_ts
                      FROM ({_events_sql(nulls=False)})),
        j AS (SELECT a.url, a.warc_ts ts1, b.warc_ts ts2,
                     row_number() OVER (PARTITION BY a.url, a.warc_ts
                                        ORDER BY b.warc_ts) rk
              FROM base a JOIN base b
                ON a.url = b.url AND b.warc_ts > a.warc_ts
               AND b.warc_ts <= a.warc_ts + INTERVAL 30 DAY),
        p AS (SELECT DISTINCT url, ts1, ts2 FROM j WHERE rk <= 2),
        adj AS (SELECT url, ts1 AS x, ts2 AS y FROM p
                UNION ALL SELECT url, ts2, ts1 FROM p),
        tri AS (SELECT DISTINCT e.url, e.ts1, e.ts2
                FROM p e
                JOIN adj a ON a.url = e.url AND a.x = e.ts1
                JOIN adj b ON b.url = e.url AND b.x = e.ts2
                          AND b.y = a.y),
        tot AS (SELECT url, count(*) AS tot FROM p GROUP BY url),
        nt AS (SELECT url, count(*) AS ntri FROM tri GROUP BY url)
        SELECT t.url,
               CAST(coalesce(n.ntri, t.tot) AS BIGINT) AS n_surviving,
               CAST(CASE WHEN n.ntri IS NOT NULL AND n.ntri < t.tot
                         THEN 2 ELSE 1 END AS BIGINT) AS n_iter
        FROM tot t LEFT JOIN nt n ON t.url = n.url
    """

    o["dem_error"] = f"""
        WITH s0 AS (
          SELECT CAST(user_id AS VARCHAR) AS url,
                 date_trunc('second', ts) AS warc_ts,
                 avg(CASE WHEN event_id % 10 = 0 THEN NULL
                          ELSE value END) AS y,
                 avg((length(props) + event_id % 97)::DOUBLE) AS x
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT url, y, x,
                 (epoch(warc_ts)
                  - min(epoch(warc_ts)) OVER (PARTITION BY url))
                 / {YEAR_SECONDS} AS t
          FROM s0 WHERE y IS NOT NULL),
        m AS (
          SELECT url, count(*) n, sum(t) st, sum(x) sx,
                 sum(t*t) stt, sum(t*x) stx, sum(x*x) sxx,
                 sum(y) sy, sum(t*y) sty, sum(x*y) sxy
          FROM s GROUP BY url HAVING count(*) >= 4)
        SELECT url,
               round(CAST(CAST(
                 (  n  * (stt*sxy - sty*stx)
                  - st * (st*sxy  - sty*sx)
                  + sy * (st*stx  - stt*sx))
                 /
                 (  n  * (stt*sxx - stx*stx)
                  - st * (st*sxx  - stx*sx)
                  + sx * (st*stx  - stt*sx)) AS FLOAT) AS DOUBLE), 5)
                 AS aux_coef
        FROM m
    """

    o["maxvar_full"] = f"""
        WITH v AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     // 86400 AS b,
                 avg(value) AS x
          FROM ({ev}) GROUP BY 1, 2),
        ext AS (SELECT url, min(b) b0, max(b) b1 FROM v GROUP BY url),
        g0 AS (SELECT url, b0, unnest(generate_series(b0, b1)) AS b
               FROM ext),
        grid AS (SELECT g0.url, g0.b - g0.b0 AS idx,
                        coalesce(v.x, 0.0) AS x
                 FROM g0 LEFT JOIN v ON v.url = g0.url AND v.b = g0.b),
        stats AS (SELECT url, count(*) AS n,
                         CAST(sum(CASE WHEN x <> 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS nzc
                  FROM grid GROUP BY url),
        lags AS (SELECT url, n, nzc, unnest(generate_series(0, n - 1)) AS k
                 FROM stats),
        acg AS (SELECT l.url, l.k, l.n, l.nzc,
                       sum(a.x * c.x) / l.nzc AS cv
                FROM lags l
                JOIN grid a ON a.url = l.url
                JOIN grid c ON c.url = l.url
                           AND c.idx = (a.idx + l.k) % l.n
                GROUP BY l.url, l.k, l.n, l.nzc)
        SELECT url,
               CASE WHEN n < 2 OR nzc = 0 THEN NULL
                    ELSE round(CAST(CAST(max(cv) AS FLOAT) AS DOUBLE), 4)
               END AS maxvar,
               n AS n_grid, nzc
        FROM acg GROUP BY url, n, nzc
    """

    o["aux_tile_average"] = f"""
        WITH s AS (SELECT CAST(user_id AS VARCHAR) AS url,
                          date_trunc('second', ts) AS warc_ts,
                          avg(length(props)::DOUBLE) AS aux
                   FROM events GROUP BY 1, 2),
        t AS (SELECT url,
                     CAST(epoch(warc_ts) AS BIGINT) // 86400 AS d,
                     avg(aux) AS a, count(aux) AS n
              FROM s GROUP BY 1, 2)
        SELECT s.url, CAST(epoch(s.warc_ts) AS BIGINT) AS ts_unix,
               round(t.a, 5) AS aux_tile_avg, t.n AS aux_tile_n
        FROM s JOIN t ON s.url = t.url
                     AND CAST(epoch(s.warc_ts) AS BIGINT) // 86400 = t.d
    """

    # S10 twin: centre starts xs = 2 + (3-1)/2 = 3 (odd factor),
    # ys = 1 + 2/2 - 1 = 1 (even factor); n_x = 18//3 = 6, n_y = 24//2 = 12
    o["lookup_join"] = f"""
        WITH e AS (SELECT warc_ts, value FROM ({ev})),
        b AS (SELECT min(CAST(epoch(warc_ts) AS BIGINT) // 86400) AS d0
              FROM e),
        cells AS (SELECT CAST(epoch(e.warc_ts) AS BIGINT) // 86400 - b.d0
                             AS y,
                         CAST(hour(e.warc_ts) AS BIGINT) AS x, e.value
                  FROM e, b),
        lt AS (SELECT y, x, avg(value) AS az, count(value) AS rg
               FROM cells GROUP BY 1, 2),
        sel AS (SELECT (x - 3) // 3 AS out_x, (y - 1) // 2 AS out_y,
                       az, rg
                FROM lt
                WHERE x >= 3 AND x < 20 AND (x - 3) % 3 = 0
                  AND y >= 1 AND y < 25 AND (y - 1) % 2 = 0
                  AND (x - 3) // 3 < 6 AND (y - 1) // 2 < 12),
        tiles AS (SELECT (y - 1) // 2 AS out_y, (x - 2) // 3 AS out_x,
                         avg(value) AS tile_avg, count(value) AS tile_n
                  FROM cells
                  WHERE x >= 2 AND x < 20 AND y >= 1 AND y < 25
                  GROUP BY 1, 2)
        SELECT t.out_y, t.out_x,
               round(CAST(CAST(t.tile_avg AS FLOAT) AS DOUBLE), 5) + 0.0
                   AS tile_avg,
               t.tile_n,
               round(CAST(CAST(s.az AS FLOAT) AS DOUBLE), 5) + 0.0 AS az,
               s.rg
        FROM tiles t LEFT JOIN sel s ON s.out_y = t.out_y
                                    AND s.out_x = t.out_x
    """

    # ---- derived pixel geometry (geometry.py:123-345 replay, r7) ----
    # Constants are embedded as repr'd Python doubles so BOTH sides run
    # byte-identical literals (the Spark operator folds the same Python
    # floats into its expression tree). Vincenty runs the SAME fixed 6
    # iterations as the operator; trig outputs are f32-quantized before
    # rounding (divergent-libm policy).
    import math as _math
    _ga, _gb, _gse = 6378137.0, 6356752.3141, 7071000.0
    _gf = (_ga - _gb) / _ga
    _gsat_azi = _math.radians(-12.5) + _math.radians(90.0)
    _gc = {
        "d2r": repr(_math.pi / 180.0),
        "aa": repr(_ga * _ga), "bb": repr(_gb * _gb),
        "a": repr(_ga), "b": repr(_gb),
        "se2": repr(_gse * _gse), "twose": repr(2 * _gse),
        "nr": repr(830000.0), "rps": repr(900.0),
        "pi": repr(_math.pi), "pio2": repr(_math.pi / 2),
        "negpio2": repr(-_math.pi / 2), "twopi": repr(2 * _math.pi),
        "sinazi": repr(_math.sin(_gsat_azi)),
        "halfazi": repr(_gsat_azi / 2),
        "f": repr(_gf), "f16": repr(_gf / 16), "onef": repr(1 - _gf),
        "bc": repr(120.0), "bn": repr(-40.0),
        "brc": repr(0.2), "brn": repr(-0.05),
        "mean_az": repr(1000 / 2 - 0.5), "prf": repr(1750.0 / 4),
    }
    _vin_iter = """
        SELECT y, x, rg, az, range_dist, look_angle, incidence_angle,
               u1, u2, omega,
               omega + (((1 - cc) * {f}) * sin(al))
                     * (sig + (cc * sin(sig))
                              * (c2sm + (cc * cos(sig))
                                        * (-1 + 2 * power(c2sm, 2))))
                   AS lam
        FROM (SELECT *,
                     cos(sig) - ((2 * sin(u1)) * sin(u2))
                              / power(cos(al), 2) AS c2sm,
                     ({f16} * power(cos(al), 2))
                       * (4 + {f} * (4 - 3 * power(cos(al), 2))) AS cc
              FROM (SELECT *, atan2(ss, cs) AS sig,
                           asin(((cos(u1) * cos(u2)) * sin(lam)) / ss)
                               AS al
                    FROM (SELECT *,
                                 sqrt(power(cos(u2) * sin(lam), 2)
                                      + power((cos(u1) * sin(u2))
                                              - ((sin(u1) * cos(u2))
                                                 * cos(lam)), 2)) AS ss,
                                 (sin(u1) * sin(u2))
                                   + ((cos(u1) * cos(u2)) * cos(lam))
                                     AS cs
                          FROM {{prev}}) _p) _q) _r
    """.format(**_gc)

    def _geometry_sql() -> str:
        its = ""
        for k in range(1, 7):
            prev = "vin0" if k == 1 else f"vin{k - 1}"
            its += f", vin{k} AS ({_vin_iter.format(prev=prev)})"
        return f"""
        WITH e AS (SELECT warc_ts, value FROM ({ev})),
        b AS (SELECT min(CAST(epoch(warc_ts) AS BIGINT) // 86400) AS d0
              FROM e),
        cells AS (SELECT CAST(epoch(e.warc_ts) AS BIGINT) // 86400 - b.d0
                             AS y,
                         CAST(hour(e.warc_ts) AS BIGINT) AS x, e.value
                  FROM e, b),
        grid AS (SELECT y, x,
                        CAST(count(value) % 97 AS DOUBLE) AS rg,
                        CAST((x + y * 24) % 1000 AS DOUBLE) AS az,
                        110.0 + x * 0.05 AS lon_deg,
                        -30.0 - y * 0.05 AS lat_deg,
                        y * 50.0 + x * 10.0 AS dem_height
                 FROM cells GROUP BY y, x),
        rad AS (SELECT *, lon_deg * {_gc['d2r']} AS lon,
                       lat_deg * {_gc['d2r']} AS lat
                FROM grid),
        re0 AS (SELECT *,
                       sqrt((({_gc['aa']} * cos(lat))
                               * ({_gc['aa']} * cos(lat))
                             + ({_gc['bb']} * sin(lat))
                               * ({_gc['bb']} * sin(lat)))
                            / (({_gc['a']} * cos(lat))
                                 * ({_gc['a']} * cos(lat))
                               + ({_gc['b']} * sin(lat))
                                 * ({_gc['b']} * sin(lat)))) AS re
                FROM rad),
        ang AS (SELECT *,
                       {_gc['nr']} + {_gc['rps']} * rg AS range_dist
                FROM re0),
        ang2 AS (SELECT *,
                        acos((({_gc['se2']} + range_dist * range_dist)
                              - re * re)
                             / ({_gc['twose']} * range_dist))
                            AS look_angle,
                        {_gc['pi']}
                          - acos(((range_dist * range_dist
                                   + (re + dem_height) * (re + dem_height))
                                  - {_gc['se2']})
                                 / ((2 * range_dist) * (re + dem_height)))
                            AS incidence_angle
                 FROM ang),
        sat AS (SELECT *, incidence_angle - look_angle AS eps FROM ang2),
        sat2 AS (SELECT *,
                        (asin(-(sin(eps) * {_gc['sinazi']})) / cos(lat))
                          + lon AS sat_lon
                 FROM sat),
        sat3 AS (SELECT *,
                        {_gc['negpio2']}
                          + 2 * atan((cos({_gc['halfazi']}
                                          + (sat_lon - lon) / 2)
                                      / cos({_gc['halfazi']}
                                            - (sat_lon - lon) / 2))
                                     * tan((({_gc['pio2']} + lat) - eps)
                                           / 2)) AS sat_lat
                 FROM sat2),
        vin0 AS (SELECT y, x, rg, az, range_dist, look_angle,
                        incidence_angle,
                        atan({_gc['onef']} * tan(lat)) AS u1,
                        atan({_gc['onef']} * tan(sat_lat)) AS u2,
                        sat_lon - lon AS omega,
                        sat_lon - lon AS lam
                 FROM sat3)
        {its},
        vin AS (SELECT *,
                       atan2(cos(u2) * sin(lam),
                             (cos(u1) * sin(u2))
                               - ((sin(u1) * cos(u2)) * cos(lam))) AS azi0
                FROM vin6),
        geom AS (SELECT y, x, rg, az, range_dist, look_angle,
                        incidence_angle,
                        round(CASE WHEN azi0 < 0
                                   THEN azi0 + {_gc['twopi']}
                                   ELSE azi0 END, 9) AS azimuth_angle,
                        ({_gc['bc']} + ({_gc['brc']} * (az - {_gc['mean_az']}))
                                       / {_gc['prf']}) * cos(look_angle)
                          - ({_gc['bn']} + ({_gc['brn']}
                                            * (az - {_gc['mean_az']}))
                                           / {_gc['prf']}) * sin(look_angle)
                            AS bperp
                 FROM vin)
        """

    _q5sql = "round(CAST(CAST({c} AS FLOAT) AS DOUBLE), 5) + 0.0 AS {c}"
    o["pixel_geometry"] = f"""
        {_geometry_sql()}
        SELECT y, x, round(range_dist, 5) AS range_dist,
               {_q5sql.format(c='look_angle')},
               {_q5sql.format(c='incidence_angle')},
               {_q5sql.format(c='azimuth_angle')},
               {_q5sql.format(c='bperp')}
        FROM geom
    """

    o["dem_error_derived"] = f"""
        {_geometry_sql()},
        b2 AS (SELECT min(CAST(epoch(warc_ts) AS BIGINT) // 86400) AS d0
               FROM ({ev})),
        s AS (SELECT e.url, e.value AS yv, g.bperp AS xv,
                     (epoch(e.warc_ts)
                      - min(epoch(e.warc_ts)) OVER (PARTITION BY e.url))
                     / {YEAR_SECONDS} AS t
              FROM ({ev}) e CROSS JOIN b2
              JOIN geom g
                ON g.y = CAST(epoch(e.warc_ts) AS BIGINT) // 86400 - b2.d0
               AND g.x = CAST(hour(e.warc_ts) AS BIGINT)
              WHERE e.value IS NOT NULL),
        m AS (SELECT url, count(*) n, sum(t) st, sum(xv) sx,
                     sum(t*t) stt, sum(t*xv) stx, sum(xv*xv) sxx,
                     sum(yv) sy, sum(t*yv) sty, sum(xv*yv) sxy
              FROM s GROUP BY url HAVING count(*) >= 4)
        SELECT url,
               round(CAST(CAST(
                 (  n  * (stt*sxy - sty*stx)
                  - st * (st*sxy  - sty*sx)
                  + sy * (st*stx  - stt*sx))
                 /
                 (  n  * (stt*sxx - stx*stx)
                  - st * (st*sxx  - stx*sx)
                  + sx * (st*stx  - stt*sx)) AS FLOAT) AS DOUBLE), 5)
                 AS aux_coef
        FROM m
    """

    o["gorilla_roundtrip"] = f"""
        WITH h AS ({_HOURLY_SQL})
        SELECT url, bucket_unix,
               round({_thr.format(t=0.5)}, 5) AS value_avg
        FROM h
    """

    # ---------------- documents ----------------
    o["dedup_exact"] = """
        SELECT doc_id, md5(text) AS content_hash,
               min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
               count(*) OVER (PARTITION BY md5(text)) AS dup_count
        FROM documents
    """

    o["dedup_jaccard"] = r"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(
              regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          FROM documents),
        sizes AS (SELECT doc_id, count(*) n FROM toks GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        FROM shared JOIN sizes sa ON doc_a = sa.doc_id
                    JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    """

    o["dedup_jaccard_capped"] = r"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(
              regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          FROM documents),
        keep AS (SELECT tok FROM toks GROUP BY tok
                 HAVING count(*) <= 100),
        kt AS (SELECT t.doc_id, t.tok FROM toks t JOIN keep USING (tok)),
        cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
                 FROM kt a JOIN kt b
                   ON a.tok = b.tok AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) n FROM toks GROUP BY doc_id),
        inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
                  FROM toks a JOIN toks b
                    ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT c.doc_a, c.doc_b,
               round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) AS jaccard
        FROM cand c
        JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) >= 0.5
    """

    o["dedup_clusters"] = r"""
        WITH RECURSIVE toks AS (
          SELECT DISTINCT doc_id, unnest(
              regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          FROM documents),
        keep AS (SELECT tok FROM toks GROUP BY tok
                 HAVING count(*) <= 100),
        kt AS (SELECT t.doc_id, t.tok FROM toks t JOIN keep USING (tok)),
        cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
                 FROM kt a JOIN kt b
                   ON a.tok = b.tok AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) n FROM toks GROUP BY doc_id),
        inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
                  FROM toks a JOIN toks b
                    ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c
          JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
          JOIN sizes sa ON c.doc_a = sa.doc_id
          JOIN sizes sb ON c.doc_b = sb.doc_id
          WHERE round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) >= 0.5),
        edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(s, t) AS (
          SELECT s, t FROM edges
          UNION
          SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        lab AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
                FROM reach GROUP BY s),
        cl AS (SELECT d.doc_id,
                      coalesce(l.cluster_id, d.doc_id) AS cluster_id
               FROM documents d LEFT JOIN lab l USING (doc_id)),
        szs AS (SELECT cluster_id, count(*) AS cluster_size
                FROM cl GROUP BY cluster_id)
        SELECT cl.doc_id, cl.cluster_id, szs.cluster_size,
               (cl.doc_id = cl.cluster_id) AS is_canonical
        FROM cl JOIN szs USING (cluster_id)
    """

    o["html_text_invariant"] = r"""
        WITH shell AS (
          SELECT doc_id, text,
                 regexp_extract(
                   '<html><body>' || text || '</body></html>',
                   '(?s)^<html><body>(.*)</body></html>$', 1) AS rec
          FROM documents)
        SELECT doc_id, rec = text AS ok, md5(rec) AS text_md5
        FROM shell
    """

    # --- correlate / sampling / profile (r7 late additions) ---
    from pyrate_spark.operators.sampling import hash_uniform_sql

    def _ohlc_sql(bucket_seconds: int) -> str:
        return f"""
        WITH s AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT) AS tu,
                 value
          FROM ({ev}))
        SELECT url, tu // {bucket_seconds} * {bucket_seconds} AS bucket_unix,
               arg_min(value, tu) FILTER (WHERE value IS NOT NULL) AS open,
               max(value) AS high, min(value) AS low,
               arg_max(value, tu) FILTER (WHERE value IS NOT NULL) AS close,
               min(tu) FILTER (WHERE value IS NOT NULL) AS open_ts_unix,
               max(tu) FILTER (WHERE value IS NOT NULL) AS close_ts_unix,
               count(value) AS n_valid
        FROM s GROUP BY 1, 2 HAVING count(value) > 0
    """

    o["ohlc_hourly"] = _ohlc_sql(3600)
    # the cascade's oracle is the DIRECT daily candle: green = cascade
    # is exactly the direct rollup (mergeability proof)
    o["ohlc_daily_cascade"] = _ohlc_sql(86400)

    def _hist_sql(bucket_seconds: int) -> str:
        # identical bin expression as the Spark side: width 16.0 is a
        # power of two so floor((v - 0)/16) agrees bit-for-bit
        return f"""
        WITH s AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT) AS tu,
                 value
          FROM ({ev})),
        b AS (
          SELECT url, tu // {bucket_seconds} * {bucket_seconds}
                     AS bucket_unix,
                 CASE WHEN value IS NULL THEN NULL
                      WHEN value < 0.0 THEN 0
                      WHEN value >= 256.0 THEN 17
                      ELSE CAST(floor((value - 0.0) / 16.0) AS INT) + 1
                 END AS bin
          FROM s)
        SELECT url, bucket_unix, CAST(bin AS BIGINT) AS bin,
               count(*) AS cnt
        FROM b WHERE bin IS NOT NULL GROUP BY 1, 2, 3
    """

    o["histogram_tier_hourly"] = _hist_sql(3600)
    # direct daily oracle proves the cascade exact (OHLC pattern)
    o["histogram_tier_cascade"] = _hist_sql(86400)

    # quantile-from-tier twin: the exploded (bin, cnt) rows make the
    # crossing-bin search a window cumsum; zero-count bins are absent
    # from the rows but can never BE the crossing bin (cum must
    # increase to cross the rank), so min-bin-with-cum>=rank equals
    # Spark's array_position, and cum - cnt is its cum_before.
    # Interpolation replays Spark's operand order exactly (round-6).
    o["histogram_quantile_tier"] = f"""
        WITH hb AS (SELECT * FROM ({_hist_sql(86400)})),
        inr AS (
          SELECT url, bucket_unix, bin, cnt,
                 sum(cnt) OVER (PARTITION BY url, bucket_unix
                                ORDER BY bin) AS cum
          FROM hb WHERE bin BETWEEN 1 AND 16),
        rk AS (
          SELECT url, bucket_unix, sum(cnt) AS n_in,
                 CAST(ceil(0.95 * sum(cnt)) AS BIGINT) AS rnk
          FROM inr GROUP BY 1, 2 HAVING sum(cnt) > 0),
        x AS (
          SELECT i.url, i.bucket_unix, i.bin, i.cnt, i.cum,
                 r.rnk, r.n_in,
                 row_number() OVER (PARTITION BY i.url, i.bucket_unix
                                    ORDER BY i.bin) AS rn
          FROM inr i JOIN rk r USING (url, bucket_unix)
          WHERE i.cum >= r.rnk)
        SELECT url, bucket_unix,
               round(least(greatest(
                   0.0 + (bin - 1) * 16.0
                   + 16.0 * (rnk - (cum - cnt)) / cnt, 0.0), 256.0), 6)
                   AS q_est,
               CAST(n_in AS BIGINT) AS n_in_range
        FROM x WHERE rn = 1
    """

    # distinct-tier twin: the exact COUNT(DISTINCT) — valid because
    # test-scale groups stay in the HLL sketch's exact coupon mode
    o["distinct_tier_daily"] = f"""
        WITH s AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     AS tu,
                 value
          FROM ({ev}) WHERE value IS NOT NULL)
        SELECT url, tu // 86400 * 86400 AS bucket_unix,
               CAST(count(DISTINCT value) AS BIGINT) AS n_distinct_est
        FROM s GROUP BY 1, 2
    """

    o["corr_leadlag"] = f"""
        WITH h AS ({_HOURLY_SQL}),
        f2 AS (SELECT url, bucket_unix, raw_avg AS v FROM h
               WHERE null_fraction < 0.5 AND raw_avg IS NOT NULL),
        cand AS (SELECT url FROM (
            SELECT url, row_number() OVER (ORDER BY count(*) DESC, url)
                   AS rk
            FROM f2 GROUP BY url) WHERE rk <= 12),
        base AS (SELECT * FROM f2 WHERE url IN (SELECT url FROM cand)),
        lag_set AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
        pairs AS (
          SELECT a.url AS url_a, b.url AS url_b, l.lag,
                 corr(a.v, b.v) AS r, count(*) AS n_overlap
          FROM base a CROSS JOIN lag_set l
          JOIN base b ON b.bucket_unix = a.bucket_unix + l.lag * 3600
                     AND a.url < b.url
          GROUP BY 1, 2, 3 HAVING count(*) >= 6),
        rounded AS (
          SELECT url_a, url_b, CAST(lag AS BIGINT) AS lag,
                 round(CAST(CAST(r AS FLOAT) AS DOUBLE), 5) AS r,
                 n_overlap
          FROM pairs),
        best AS (SELECT *, row_number() OVER (
                   PARTITION BY url_a, url_b
                   ORDER BY abs(r) DESC, lag) AS rk
                 FROM rounded)
        SELECT url_a, url_b, lag AS best_lag, r, n_overlap
        FROM best WHERE rk = 1
    """

    o["hash_split_assign"] = f"""
        SELECT doc_id, lang,
               CASE WHEN u < 0.8 THEN 'train'
                    WHEN u < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, lang,
                     {hash_uniform_sql('doc_id', 0)} AS u
              FROM documents)
    """

    o["stratified_sample"] = f"""
        SELECT doc_id, lang
        FROM (SELECT doc_id, lang,
                     {hash_uniform_sql('doc_id', 1)} AS u
              FROM documents)
        WHERE u < CASE lang WHEN 'de' THEN 0.5 WHEN 'en' THEN 0.25
                            WHEN 'es' THEN 0.75 WHEN 'fr' THEN 0.1
                            WHEN 'zh' THEN 1.0 ELSE 0.0 END
    """

    _prof_col = """
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               round((count(*) - count({c}))
                     / CAST(count(*) AS DOUBLE), 6) AS null_fraction,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM documents
    """
    o["profile_documents"] = " UNION ALL ".join(
        _prof_col.format(c=c)
        for c in ("doc_id", "text", "lang", "source", "n_chars"))

    # --- MinHash LSH twin (md5 hash mode, seeds 42..57, 4 bands x 4) ---
    _mh = "CAST('0x' || substr(md5(shingle || '#{s}'), 1, 15) AS BIGINT)"
    _mins = ", ".join(
        f"min({_mh.format(s=42 + i)}) AS h{i}" for i in range(16))
    _buckets = {
        b: " || ',' || ".join(f"CAST(h{4 * b + r} AS VARCHAR)"
                              for r in range(4))
        for b in range(4)}
    _bucket_case = ("CASE band " + " ".join(
        f"WHEN {b} THEN {expr}" for b, expr in _buckets.items()) + " END")
    _shingle_src = r"""
        toks AS (SELECT doc_id,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS tk
                 FROM documents),
        sh0 AS (SELECT doc_id, unnest(
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_transform(
                           generate_series(1, len(tk) - 2),
                           i -> array_to_string(tk[i:i+2], ' '))
                  END) AS shingle
                FROM toks),
        shd AS (SELECT DISTINCT doc_id, shingle FROM sh0)
    """
    o["dedup_minhash_lsh"] = f"""
        WITH {_shingle_src},
        sig AS (SELECT doc_id, {_mins} FROM shd GROUP BY doc_id),
        buckets AS (
          SELECT doc_id, band, {_bucket_case} AS bucket
          FROM sig, (SELECT unnest(range(4)) AS band)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a JOIN buckets b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) n FROM shd GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         count(*) AS i
                  FROM shd a JOIN shd b
                    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT c.doc_a, c.doc_b,
               round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) AS jaccard
        FROM cand c
        JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) >= 0.5
    """

    # decontamination twin: same 3-gram shingle CTE, benchmark =
    # every 50th doc, distinct-shared-shingle count per flagged doc
    o["decontaminate"] = f"""
        WITH {_shingle_src},
        bsh AS (SELECT DISTINCT shingle FROM shd WHERE doc_id % 50 = 0)
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_shared_shingles
        FROM shd d JOIN bsh USING (shingle)
        GROUP BY d.doc_id
    """

    # PII twin: identical injected construction, identical ASCII-class
    # regexes; DuckDB needs the 'g' flag to replace all matches (Spark
    # regexp_replace is global by default)
    _pii_src = r"""
        inj AS (
          SELECT doc_id,
                 text || ' mail u' || CAST(doc_id AS VARCHAR)
                 || '@ex' || CAST(doc_id % 3 AS VARCHAR) || '.org ip 10.'
                 || CAST(doc_id % 256 AS VARCHAR) || '.0.1 acct 9'
                 || lpad(CAST(doc_id AS VARCHAR), 9, '0') AS text
          FROM documents)
    """
    _email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _ipv4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    _lnum = r"\b[0-9]{9,}\b"
    o["pii_scrub"] = f"""
        WITH {_pii_src}
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_email}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(text, '{_ipv4}')) AS BIGINT)
                   AS n_ipv4,
               CAST(len(regexp_extract_all(text, '{_lnum}')) AS BIGINT)
                   AS n_longnum,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{_email}', '<EMAIL>', 'g'),
                   '{_ipv4}', '<IP>', 'g'),
                   '{_lnum}', '<NUM>', 'g') AS text_scrubbed
        FROM inj
    """

    # --- SimHash twin (md5 hash mode, 60-bit fp, hamming <= 3) ---
    _votes = ", ".join(
        f"sum(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60))
    _fp = " + ".join(
        f"CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
        for i in range(60))
    o["dedup_simhash"] = rf"""
        WITH t AS (SELECT doc_id, unnest(
                     regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                   FROM documents),
        h AS (SELECT doc_id,
                     CAST('0x' || substr(md5(tok || '#42'), 1, 15)
                          AS BIGINT) AS hv
              FROM t),
        v AS (SELECT doc_id, {_votes} FROM h GROUP BY doc_id),
        f AS (SELECT doc_id, {_fp} AS fp FROM v)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """

    _bpe = (r"''s|''t|''re|''ve|''m|''ll|''d"
            r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")
    o["token_count"] = rf"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subtokens,
               CAST(len(regexp_extract_all(text, '{_bpe}')) AS BIGINT)
                   AS n_bpe_pieces
        FROM documents
    """

    o["text_quality"] = r"""
        WITH m AS (
          SELECT doc_id, length(text) AS n_chars_measured,
                 len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                 length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
                 len(regexp_extract_all(lower(text), '\bthe\b'))
                 + len(regexp_extract_all(lower(text), '\band\b'))
                 + len(regexp_extract_all(lower(text), '\bof\b'))
                 + len(regexp_extract_all(lower(text), '\bis\b')) AS n_stop
          FROM documents)
        SELECT doc_id, n_chars_measured, n_tokens,
               round(n_punct * 1.0 / n_chars_measured, 6) AS punct_ratio,
               round(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
               round(
                 (CASE WHEN n_chars_measured < 50 THEN 0.0 ELSE 1.0 END)
                 * (CASE WHEN n_punct * 1.0 / n_chars_measured > 0.2
                         THEN 0.5 ELSE 1.0 END)
                 * (CASE WHEN n_stop * 1.0 / n_tokens < 0.01
                         THEN 0.5 ELSE 1.0 END)
                 * (CASE WHEN (n_chars_measured - n_tokens + 1) * 1.0
                              / n_tokens < 2
                          OR (n_chars_measured - n_tokens + 1) * 1.0
                              / n_tokens > 12
                         THEN 0.5 ELSE 1.0 END), 6) AS quality
        FROM m
    """

    _lang_score = {
        lang: " + ".join(
            f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
            for w in words)
        for lang, words in sorted(tx.LANG_MARKERS.items())
    }
    _best = "greatest(" + ", ".join(f"s_{L}" for L in sorted(tx.LANG_MARKERS)) + ")"
    _pred = "'und'"
    for L in sorted(tx.LANG_MARKERS, reverse=True):
        _pred = (f"CASE WHEN s_{L} = {_best} AND {_best} > 0 "
                 f"THEN '{L}' ELSE {_pred} END")
    o["lang_id"] = f"""
        WITH sc AS (SELECT doc_id,
            {', '.join(f'{expr} AS s_{L}' for L, expr in _lang_score.items())}
            FROM documents)
        SELECT doc_id, {_pred} AS pred_lang, {_best} AS marker_hits FROM sc
    """

    o["fingerprint"] = r"""
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents
    """

    # Rabin-Karp twin: DuckDB's list_reduce seeds from the first
    # element, so a prepended 0 plays the fold's init accumulator
    o["fingerprint_rolling"] = """
        WITH c AS (
          SELECT doc_id, length(text) AS n,
                 list_transform(range(1, length(text) + 1),
                                i -> ord(substr(text, i, 1))) AS codes
          FROM documents),
        h AS (
          SELECT doc_id, n,
                 CASE WHEN n = 0 THEN 0 ELSE list_reduce(
                     list_prepend(CAST(0 AS BIGINT), codes),
                     (acc, x) -> (acc * 131 + x) % 2147483647)
                 END AS rh_full,
                 CASE WHEN n <= 32 THEN [CAST(0 AS BIGINT)]
                      ELSE generate_series(0, n - 32) END AS starts,
                 codes
          FROM c)
        SELECT doc_id, rh_full,
               list_min(list_transform(starts,
                   i -> CASE WHEN len(codes[i+1 : i+32]) = 0 THEN 0
                        ELSE list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                                         codes[i+1 : i+32]),
                            (acc, x) -> (acc * 131 + x) % 2147483647)
                        END)) AS rh_min_window,
               CAST(n AS BIGINT) AS n_chars
        FROM h
    """

    # registrable-domain twin: identical regexes (ASCII classes — Java
    # regex and RE2 agree) and identical 1-based label-slice arithmetic
    _psl = ", ".join(f"'{s}'" for s in sorted(tx.MULTI_SUFFIXES))
    o["domain_extract"] = f"""
        WITH u AS (
          SELECT doc_id,
                 'https://'
                 || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
                 || source || '.'
                 || list_extract(['com', 'co.uk', 'org'],
                                 CAST(doc_id % 3 + 1 AS INT))
                 || '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        h AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                     '^.*@', ''), ':[0-9]+$', '') AS host
          FROM u),
        l AS (
          SELECT doc_id, host, string_split(host, '.') AS labels,
                 len(string_split(host, '.')) AS n
          FROM h),
        r AS (
          SELECT doc_id, host,
                 CASE WHEN n <= 1 THEN host
                      WHEN n >= 3 AND array_to_string(
                               labels[n-1:n], '.') IN ({_psl})
                           THEN array_to_string(labels[n-2:n], '.')
                      ELSE array_to_string(labels[n-1:n], '.')
                 END AS registrable
          FROM l)
        SELECT doc_id, host, registrable,
               host <> registrable AS is_subdomain
        FROM r
    """

    o["gopher_repetition"] = r"""
        WITH w AS (
          SELECT doc_id, word FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)),
                                             '\s+')) AS word
            FROM documents)
          WHERE word <> ''),
        pw AS (SELECT doc_id, word, count(*) AS cnt
               FROM w GROUP BY doc_id, word),
        ag AS (SELECT doc_id,
                      CAST(sum(cnt) AS BIGINT) AS n_words,
                      CAST(count(*) AS BIGINT) AS n_distinct,
                      CAST(max(cnt) AS BIGINT) AS top_count
               FROM pw GROUP BY doc_id)
        SELECT doc_id, n_words, n_distinct,
               round(CAST(top_count AS DOUBLE) / n_words, 6)
                   AS top_word_frac,
               round(CAST(n_distinct AS DOUBLE) / n_words, 6)
                   AS distinct_ratio,
               (CAST(top_count AS DOUBLE) / n_words <= 0.2
                AND CAST(n_distinct AS DOUBLE) / n_words >= 0.3) AS keep
        FROM ag
    """

    o["strip_boilerplate"] = """
        WITH s0 AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        s AS (
          SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos,
                 unnest(w) AS span
          FROM s0),
        s2 AS (SELECT * FROM s WHERE span <> ''),
        d AS (
          SELECT span FROM (
            SELECT span, count(DISTINCT doc_id) AS span_df
            FROM s2 GROUP BY span)
          WHERE span_df > greatest(CAST(floor(
              0.8 * (SELECT count(*) FROM documents)) AS BIGINT), 1)),
        k AS (SELECT * FROM s2
              WHERE span NOT IN (SELECT span FROM d))
        SELECT doc_id,
               string_agg(span, ' ' ORDER BY pos) AS text_clean,
               count(*) AS n_spans_kept
        FROM k GROUP BY doc_id
    """

    o["knn_bruteforce"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                   FROM embeddings WHERE vec_id IN
                   ({', '.join(str(i) for i in QUERY_IDS)})),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(
                     CAST(q.qvec AS DOUBLE[]),
                     CAST(e.embedding AS DOUBLE[])), 6) AS cosine
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """

    # T11 twin: axis = interval midpoints (aps.py:345-346 analog), then
    # normalised Gaussian weights over valid samples via a per-url
    # self-join. cutoff = 2 days, pthr = 1 (matches the query's cfg).
    _cut_yr = 2 / 365.25
    o["temporal_highpass"] = f"""
        WITH s AS (
          SELECT url, warc_ts, value,
                 row_number() OVER (PARTITION BY url ORDER BY warc_ts)
                     AS rn,
                 (epoch(warc_ts)
                  - min(epoch(warc_ts)) OVER (PARTITION BY url))
                 / {YEAR_SECONDS} AS span
          FROM ({ev})),
        axd AS (
          SELECT *, lead(span) OVER (PARTITION BY url ORDER BY rn) nspan,
                    lag(span)  OVER (PARTITION BY url ORDER BY rn) pspan
          FROM s),
        axis AS (
          SELECT url, rn, warc_ts, value,
                 CASE WHEN nspan IS NOT NULL THEN span + (nspan - span)/2
                      WHEN pspan IS NOT NULL THEN span + (span - pspan)/2
                      ELSE span + 0.5 END AS ax
          FROM axd),
        lp AS (
          SELECT a.url, a.rn,
                 sum(exp(-0.5 * pow((b.ax - a.ax) / {_cut_yr}, 2)) * b.value)
                 / sum(exp(-0.5 * pow((b.ax - a.ax) / {_cut_yr}, 2))) AS lp
          FROM axis a JOIN axis b ON a.url = b.url
          WHERE a.value IS NOT NULL AND b.value IS NOT NULL
          GROUP BY a.url, a.rn)
        SELECT a.url, CAST(epoch(a.warc_ts) AS BIGINT) AS ts_unix,
               round(CAST(CAST(a.value - l.lp AS FLOAT) AS DOUBLE), 4)
                   AS value_hp,
               round(CAST(CAST(l.lp AS FLOAT) AS DOUBLE), 4) AS value_lp
        FROM axis a LEFT JOIN lp l ON a.url = l.url AND a.rn = l.rn
    """

    # T12 spectral low-pass twin: replay grid build, NN fill (ties ->
    # lower index), Gaussian weights over fftshifted distances
    # (sigma = population std / cutoff), and the filter itself as a
    # direct DFT — forward trig sums X(k), then weighted inverse sums.
    # W at true frequency k is wgt[(k + n//2) mod n] = f(min(k, n-k)).
    o["cohort_lowpass_fft"] = f"""
        WITH e AS (
          SELECT url, warc_ts, value,
                 CAST(CAST(url AS BIGINT) % 8 AS VARCHAR) AS ch,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     // 86400 AS b
          FROM ({ev})),
        g AS (SELECT ch, b, avg(value) AS gv FROM e GROUP BY 1, 2),
        ext AS (SELECT ch, min(b) b0, max(b) b1 FROM g GROUP BY ch),
        g0 AS (SELECT ch, b0, unnest(generate_series(b0, b1)) AS b
               FROM ext),
        grid AS (SELECT g0.ch, g0.b, g0.b - g0.b0 AS idx, g.gv AS x
                 FROM g0 LEFT JOIN g ON g.ch = g0.ch AND g.b = g0.b),
        ns AS (SELECT ch, count(*) AS n FROM grid GROUP BY ch),
        good AS (SELECT ch, idx, x FROM grid WHERE x IS NOT NULL),
        cand AS (SELECT gr.ch, gr.idx, gd.x,
                        row_number() OVER (
                            PARTITION BY gr.ch, gr.idx
                            ORDER BY abs(gd.idx - gr.idx), gd.idx) rk
                 FROM grid gr JOIN good gd ON gd.ch = gr.ch
                 WHERE gr.x IS NULL),
        fill AS (SELECT ch, idx, x FROM good
                 UNION ALL SELECT ch, idx, x FROM cand WHERE rk = 1),
        freq AS (SELECT ch, n, unnest(generate_series(0, n - 1)) AS k
                 FROM ns),
        fd AS (SELECT ch, n, k,
                      CAST(least(k, n - k) AS DOUBLE) AS dist_t,
                      CAST(abs(k - n // 2) AS DOUBLE) AS dist_s
               FROM freq),
        sg AS (SELECT ch,
                      sqrt(avg(dist_s * dist_s)
                           - avg(dist_s) * avg(dist_s)) / 5.0 AS sigma
               FROM fd GROUP BY ch),
        wgt AS (SELECT fd.ch, fd.n, fd.k,
                       exp(-0.5 * pow(fd.dist_t / sg.sigma, 2)) AS w
                FROM fd JOIN sg ON sg.ch = fd.ch),
        xf AS (SELECT w.ch, w.k, w.n, any_value(w.w) AS w,
                      sum(f.x * cos(2 * pi() * w.k * f.idx / w.n)) AS xr,
                      -sum(f.x * sin(2 * pi() * w.k * f.idx / w.n)) AS xi
               FROM wgt w JOIN fill f ON f.ch = w.ch
               GROUP BY w.ch, w.k, w.n),
        lp AS (SELECT gr.ch, gr.b,
                      CASE WHEN any_value(gr.x) IS NULL THEN NULL ELSE
                        sum(xf.w * (xf.xr * cos(2 * pi() * xf.k * gr.idx
                                                / xf.n)
                                    - xf.xi * sin(2 * pi() * xf.k * gr.idx
                                                  / xf.n)))
                        / any_value(xf.n)
                      END AS lp
               FROM grid gr JOIN xf ON xf.ch = gr.ch
               GROUP BY gr.ch, gr.b)
        SELECT e.url, CAST(epoch(e.warc_ts) AS BIGINT) AS ts_unix,
               round(CAST(CAST(e.value - l.lp AS FLOAT) AS DOUBLE), 4)
                   + 0.0 AS value_hp,
               round(CAST(CAST(l.lp AS FLOAT) AS DOUBLE), 4)
                   + 0.0 AS value_lp
        FROM e LEFT JOIN lp l ON l.ch = e.ch AND l.b = e.b
    """

    # stub decoder twin: feature j = little-endian uint32 of bytes
    # [4j, 4j+4) of sha256('ASSET-<id>-42'), cast float32, / 2^32 —
    # every step is exactly reproducible in SQL (power-of-two division)
    o["multimodal_features"] = """
        WITH a AS (SELECT unnest(range(64)) AS asset_id),
        h AS (SELECT asset_id,
                     CASE asset_id % 3 WHEN 0 THEN 'image/png'
                          WHEN 1 THEN 'audio/wav'
                          ELSE 'video/mp4' END AS kind,
                     sha256('ASSET-' || asset_id || '-42') AS hx
              FROM a),
        p AS (SELECT asset_id, kind, hx, unnest(range(8)) AS pos FROM h)
        SELECT asset_id, kind, pos,
               round(CAST(CAST(CAST('0x' || substr(hx, pos*8+7, 2)
                                         || substr(hx, pos*8+5, 2)
                                         || substr(hx, pos*8+3, 2)
                                         || substr(hx, pos*8+1, 2)
                                AS BIGINT) AS FLOAT) AS DOUBLE)
                     / 4294967296, 9) AS feat_val,
               true AS decode_ok
        FROM p
    """

    o["dedup_cosine"] = """
        SELECT CAST(a.vec_id AS BIGINT) AS id_a,
               CAST(b.vec_id AS BIGINT) AS id_b,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 6) >= 0.25
    """

    # the oracle recomputes the exact-baseline pair count; the subset
    # and recall facts are Spark-side measured gates (hash geometry is
    # not SQL-replayable), asserted as constant-true booleans
    o["dedup_cosine_lsh"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_brute,
               TRUE AS subset_ok, TRUE AS recall_ok
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 6) >= 0.25
    """

    o["multimodal_resize"] = """
        WITH a AS (SELECT unnest(range(64)) AS asset_id),
        g AS (SELECT asset_id,
                     CASE asset_id % 3 WHEN 0 THEN 'image/png'
                          WHEN 1 THEN 'audio/wav'
                          ELSE 'video/mp4' END AS kind,
                     (asset_id % 64) * 16 + 16 AS w,
                     (asset_id % 48) * 16 + 16 AS h
              FROM a),
        s AS (SELECT *, least(256.0 / w, 256.0 / h, 1.0) AS sc FROM g),
        o AS (SELECT asset_id, kind,
                     greatest(CAST(floor(w * sc) AS BIGINT), 1)
                         AS out_width,
                     greatest(CAST(floor(h * sc) AS BIGINT), 1)
                         AS out_height
              FROM s)
        SELECT asset_id, kind, out_width, out_height,
               sha256('ASSET-' || asset_id || '-42'
                      || '@' || out_width || 'x' || out_height)
                   AS resized_sha
        FROM o
    """

    o["frame_sample"] = """
        WITH a AS (SELECT unnest(range(64)) AS asset_id),
        v AS (SELECT asset_id, (asset_id % 1000) * 33 AS dur
              FROM a WHERE asset_id % 3 = 2)
        SELECT asset_id,
               unnest(generate_series(0, greatest(dur - 1, 0), 1000))
                   AS frame_ms
        FROM v
    """

    # ANN recall gates: the Spark query computes recall@5 vs its own
    # exact baseline and asserts the measured floor; the oracle is the
    # all-true table over the query ids
    _qids = ", ".join(str(i) for i in QUERY_IDS)
    for _k in ("knn_ivf", "knn_lsh"):
        o[_k] = f"""
            SELECT CAST(vec_id AS BIGINT) AS query_id, true AS recall_ok
            FROM embeddings WHERE vec_id IN ({_qids})
        """

    o["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
               round(avg(l_quantity), 5) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    # S9 quicklook colour maths (merge.py:195-231). Rates f32-quantized
    # both sides so the symmetric range M and class boundaries are
    # bit-identical; floor(x+0.5) is the tie-unambiguous nearest-entry.
    o["quicklook_classmap"] = f"""
        WITH per AS (SELECT url,
                            CAST(CAST(avg(value) AS FLOAT) AS DOUBLE)
                                AS rate
                     FROM ({ev}) GROUP BY url),
        m AS (SELECT greatest(abs(min(rate)), abs(max(rate))) AS mm
              FROM per),
        c AS (SELECT url, rate,
                     CASE WHEN rate IS NULL THEN NULL
                          WHEN mm IS NULL OR mm = 0 THEN 0
                          ELSE least(254, greatest(0, CAST(floor(
                               (rate + mm) / (mm + mm) * 254.0 + 0.5)
                               AS INT))) END AS cls
              FROM per, m)
        SELECT url, round(rate, 5) AS rate, cls,
               round(255.0 * least(1.0, (254.0 - cls) / 127.0), 4) AS r,
               round(255.0 * least(1.0,
                     least(CAST(cls AS DOUBLE), 254.0 - cls) / 127.0), 4)
                   AS g,
               round(255.0 * least(1.0, cls / 127.0), 4) AS b
        FROM c
    """

    # exact order statistics: element selection, not a sketch — the
    # replay is bit-for-bit, no rounding anywhere
    o["rollup_stats"] = f"""
        WITH s AS (
          SELECT url,
                 CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                     // 3600 * 3600 AS bucket_unix,
                 value
          FROM ({ev})),
        g AS (
          SELECT url, bucket_unix,
                 min(value) AS vmin, max(value) AS vmax,
                 list_sort(list(value) FILTER (WHERE value IS NOT NULL))
                     AS sv,
                 count(value) AS n_valid,
                 count(*) AS n_obs
          FROM s GROUP BY 1, 2)
        SELECT url, bucket_unix, vmin, vmax,
               CASE WHEN n_valid > 0 THEN
                 sv[greatest(CAST(ceil(n_valid * 0.5) AS INT), 1)]
               END AS p50,
               CASE WHEN n_valid > 0 THEN
                 sv[greatest(CAST(ceil(n_valid * 0.95) AS INT), 1)]
               END AS p95,
               n_valid, n_obs
        FROM g
    """

    # streaming twins (new r6): the streaming query is pinned
    # bit-equal to its batch sibling by construction (same fold order,
    # two-pass split pytest), so the twin shares the sibling's oracle —
    # the gate still independently recomputes every value in DuckDB
    o["streaming_zscore"] = o["anomaly_zscore_hourly"]
    o["streaming_holt"] = o["holt_forecast"]
    o["streaming_seasonal"] = o["seasonal_residual"]

    # composite streaming gates (r7): the UNION of the legs' oracles in
    # the shared layout — any leg value diverging fails the composite
    o["streaming_alert_suite"] = f"""
        SELECT 'zscore' AS detector, url, bucket_unix, value_avg,
               zscore AS m1, CAST(n_window AS DOUBLE) AS m2,
               CAST(NULL AS DOUBLE) AS m3, CAST(NULL AS DOUBLE) AS m4,
               is_anomaly AS flag
        FROM ({o['streaming_zscore']})
        UNION ALL
        SELECT 'holt' AS detector, url, bucket_unix, value_avg,
               level AS m1, trend AS m2, forecast AS m3,
               forecast_error AS m4, FALSE AS flag
        FROM ({o['streaming_holt']})
        UNION ALL
        SELECT 'cusum' AS detector, url, bucket_unix, value_avg,
               cusum_hi AS m1, cusum_lo AS m2,
               CAST(NULL AS DOUBLE) AS m3, CAST(NULL AS DOUBLE) AS m4,
               is_change AS flag
        FROM ({o['streaming_cusum']})
    """

    o["streaming_tier_suite"] = f"""
        SELECT 'gapfill' AS leg, url, bucket_unix AS k1,
               CAST(NULL AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS k3,
               CAST(NULL AS BIGINT) AS k4, value_filled AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3,
               CAST(NULL AS BIGINT) AS n
        FROM ({o['streaming_gapfill_locf']})
        UNION ALL
        SELECT 'cumsum' AS leg, url, bucket_unix AS k1,
               CAST(NULL AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS k3,
               CAST(NULL AS BIGINT) AS k4, value_cuml AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3,
               CAST(NULL AS BIGINT) AS n
        FROM ({o['streaming_cumsum']})
        UNION ALL
        SELECT 'seasonal' AS leg, url, bucket_unix AS k1,
               CAST(hod AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS k3,
               CAST(NULL AS BIGINT) AS k4, value_avg AS v1,
               baseline AS v2, residual AS v3,
               CAST(n_profile AS BIGINT) AS n
        FROM ({o['streaming_seasonal']})
        UNION ALL
        SELECT 'session' AS leg, url, session_start_unix AS k1,
               session_end_unix AS k2, first_unix AS k3, last_unix AS k4,
               value_avg AS v1, CAST(NULL AS DOUBLE) AS v2,
               CAST(NULL AS DOUBLE) AS v3, CAST(n_events AS BIGINT) AS n
        FROM ({o['streaming_sessionize_30m']})
    """

    # gap detection (new r6): interior dead intervals under the same
    # liveness rule as heartbeat_uptime — exact integers, no rounding
    o["gap_detect"] = f"""
        WITH e AS (
            SELECT url,
                   CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                       AS t
            FROM ({_events_sql()})),
        s AS (SELECT url, t,
                     lead(t) OVER (PARTITION BY url ORDER BY t) AS tn
              FROM e)
        SELECT url,
               t + 21600 AS gap_start,
               tn AS gap_end,
               tn - t - 21600 AS gap_sec
        FROM s WHERE tn > t + 21600
    """


    # PromQL/TimescaleDB derived metrics (new r6). Shared base: the
    # deduped event series with values rounded to 5 (so both engines
    # integrate/divide identical doubles), epoch-second timestamps.
    _EB = f"""
        SELECT url,
               CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT) AS t,
               round(value, 5) AS v
        FROM ({_events_sql()}) WHERE value IS NOT NULL
    """

    # time_weight('LOCF'): lead() segments capped at one day, split at
    # hour boundaries via generate_series. Values integer-scaled
    # (floor(v*1e5 + 0.5)) so both sums are exact integers and the
    # gate is bit-exact with no rounding (see the query docstring)
    o["time_weighted_hourly"] = f"""
        WITH e AS (
            SELECT url, t,
                   CAST(floor(v * 100000.0 + 0.5) AS DOUBLE) AS v
            FROM ({_EB})),
        s AS (SELECT url, t, v,
                     lead(t) OVER (PARTITION BY url ORDER BY t) AS tn
              FROM e),
        seg AS (SELECT url, t, v,
                       least(tn, t + 86400) AS tn
                FROM s WHERE tn IS NOT NULL AND tn > t),
        x AS (SELECT url, t, tn, v,
                     unnest(generate_series(t // 3600,
                                            (tn - 1) // 3600)) AS k
              FROM seg),
        c AS (SELECT url, k * 3600 AS bucket_start,
                     greatest(t, k * 3600) AS a,
                     least(tn, (k + 1) * 3600) AS b, v
              FROM x)
        SELECT url, bucket_start,
               sum(v * CAST(b - a AS DOUBLE))
                   / sum(CAST(b - a AS DOUBLE)) / 100000.0
                   AS value_twa,
               CAST(sum(b - a) AS BIGINT) AS covered_sec
        FROM c GROUP BY url, bucket_start
    """

    # deriv(): explicit normal-equation sums (x centred on the bucket
    # start), NULL below 2 samples or at zero time-variance
    o["deriv_hourly"] = f"""
        WITH e AS ({_EB}),
        b AS (SELECT url, (t // 3600) * 3600 AS bucket_start,
                     CAST(t - (t // 3600) * 3600 AS DOUBLE) AS x, v
              FROM e),
        g AS (SELECT url, bucket_start,
                     count(*) AS n, sum(x) AS sx, sum(v) AS sv,
                     sum(x * v) AS sxv, sum(x * x) AS sxx
              FROM b GROUP BY 1, 2)
        SELECT url, bucket_start, n AS n_samples,
               CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
                    THEN round((n * sxv - sx * sv)
                               / (n * sxx - sx * sx), 6) END
                   AS slope_per_sec
        FROM g
    """

    # irate(): last two samples per (url, hour), counter-reset rule;
    # both engines divide the SAME two doubles — exact, no rounding
    o["irate_hourly"] = f"""
        WITH e AS ({_EB}),
        g AS (SELECT url, (t // 3600) * 3600 AS bucket_start,
                     list(v ORDER BY t) AS vs,
                     list(t ORDER BY t) AS ts
              FROM e GROUP BY 1, 2)
        SELECT url, bucket_start,
               CAST(len(vs) AS BIGINT) AS n_samples,
               CASE WHEN len(vs) >= 2 AND ts[-1] - ts[-2] > 0 THEN
                   (CASE WHEN vs[-1] < vs[-2] THEN vs[-1]
                         ELSE vs[-1] - vs[-2] END)
                   / CAST(ts[-1] - ts[-2] AS DOUBLE) END
                   AS irate_per_sec
        FROM g
    """

    # histogram_quantile(0.95): fixed le ladder, cumulative integer
    # counts, Prometheus interpolation (rank in +Inf -> top finite le)
    o["histogram_q95"] = f"""
        WITH e AS (
            SELECT url,
                   (CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                    // 3600) * 3600 AS bucket_start,
                   round(value, 5) AS v
            FROM ({_events_sql()}) WHERE value IS NOT NULL),
        l AS (SELECT unnest([20.0, 40.0, 60.0, 80.0, 100.0,
                             'inf'::DOUBLE]) AS le),
        h AS (SELECT url, bucket_start, le,
                     CAST(count(*) FILTER (v <= le) AS DOUBLE) AS c
              FROM e CROSS JOIN l GROUP BY 1, 2, 3),
        g AS (SELECT url, bucket_start,
                     list(le ORDER BY le) AS les,
                     list(c ORDER BY le) AS cs
              FROM h GROUP BY 1, 2),
        r AS (SELECT url, bucket_start, les, cs,
                     cs[-1] AS total, 0.95 * cs[-1] AS rnk,
                     len(list_filter(cs, c -> c < 0.95 * cs[-1])) + 1
                         AS idx
              FROM g)
        SELECT url, bucket_start,
               CAST(total AS BIGINT) AS total_count,
               CASE WHEN total <= 0 THEN NULL
                    WHEN les[idx] = 'inf'::DOUBLE THEN 100.0
                    WHEN cs[idx] - (CASE WHEN idx > 1 THEN cs[idx - 1]
                                         ELSE 0.0 END) > 0
                    THEN round((CASE WHEN idx > 1 THEN les[idx - 1]
                                     ELSE 0.0 END)
                               + (les[idx]
                                  - (CASE WHEN idx > 1
                                          THEN les[idx - 1]
                                          ELSE 0.0 END))
                               * (rnk - (CASE WHEN idx > 1
                                              THEN cs[idx - 1]
                                              ELSE 0.0 END))
                               / (cs[idx]
                                  - (CASE WHEN idx > 1
                                          THEN cs[idx - 1]
                                          ELSE 0.0 END)), 6)
                    ELSE round(les[idx], 6) END AS q95
        FROM r
    """

    # LTTB (new r6): the selection is a deterministic recurrence —
    # replay it step-for-step with a recursive CTE (the holt_forecast
    # pattern; one row per interior point per url). Area expressions
    # mirror the Spark fold's operand order exactly; anchor averages
    # are the same prepend-0.0 ordered folds; ties keep the earliest
    # candidate via strict > on both sides. Bit-exact, no rounding.
    _A_T = ("abs((r.bt - e.nat) * (e.v - r.bv)"
            " - (r.bt - e.t) * (e.nav - r.bv))")
    _A_P = ("abs((r.pt - e.nat) * (e.v - r.pv)"
            " - (r.pt - e.t) * (e.nav - r.pv))")
    o["lttb_downsample"] = f"""
        WITH RECURSIVE
        pts AS (SELECT url, t, v,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY t) AS i,
                       count(*) OVER (PARTITION BY url) AS n
                FROM ({_EB})),
        small AS (SELECT url, t AS t_unix, v, n AS n_in
                  FROM pts WHERE n <= 20),
        big AS (SELECT * FROM pts WHERE n > 20),
        interior AS (SELECT url, i, CAST(t AS DOUBLE) AS t, v, n,
                            ((CAST(i AS BIGINT) - 1) * 18 - 1)
                                // (n - 2) AS b
                     FROM big WHERE i >= 2 AND i <= n - 1),
        avgs AS (SELECT url, b,
                        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                            list(t ORDER BY i)), (a, x) -> a + x)
                            / count(*) AS at,
                        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                            list(v ORDER BY i)), (a, x) -> a + x)
                            / count(*) AS av
                 FROM interior GROUP BY url, b),
        firstpt AS (SELECT url, CAST(t AS DOUBLE) AS ft, v AS fv, n
                    FROM big WHERE i = 1),
        lastpt AS (SELECT url, CAST(t AS DOUBLE) AS lt, v AS lv
                   FROM big WHERE i = n),
        elems AS (SELECT i.url, i.i, i.t, i.v, i.b, i.n,
                         COALESCE(a.at, l.lt) AS nat,
                         COALESCE(a.av, l.lv) AS nav
                  FROM interior i
                  LEFT JOIN avgs a ON a.url = i.url AND a.b = i.b + 1
                  JOIN lastpt l ON l.url = i.url),
        rec AS (
            SELECT e.url, e.i, e.n,
                   f.ft AS pt, f.fv AS pv, e.b AS cb,
                   abs((f.ft - e.nat) * (e.v - f.fv)
                       - (f.ft - e.t) * (e.nav - f.fv)) AS ba,
                   e.t AS bt, e.v AS bv,
                   CAST(NULL AS DOUBLE) AS et,
                   CAST(NULL AS DOUBLE) AS ev
            FROM elems e JOIN firstpt f ON f.url = e.url
            WHERE e.i = 2
            UNION ALL
            SELECT e.url, e.i, e.n,
                   CASE WHEN e.b != r.cb THEN r.bt ELSE r.pt END,
                   CASE WHEN e.b != r.cb THEN r.bv ELSE r.pv END,
                   e.b,
                   CASE WHEN e.b != r.cb THEN {_A_T}
                        ELSE CASE WHEN {_A_P} > r.ba THEN {_A_P}
                                  ELSE r.ba END END,
                   CASE WHEN e.b != r.cb THEN e.t
                        ELSE CASE WHEN {_A_P} > r.ba THEN e.t
                                  ELSE r.bt END END,
                   CASE WHEN e.b != r.cb THEN e.v
                        ELSE CASE WHEN {_A_P} > r.ba THEN e.v
                                  ELSE r.bv END END,
                   CASE WHEN e.b != r.cb THEN r.bt END,
                   CASE WHEN e.b != r.cb THEN r.bv END
            FROM rec r JOIN elems e
              ON e.url = r.url AND e.i = r.i + 1),
        sel AS (
            SELECT url, ft AS t, fv AS v FROM firstpt
            UNION ALL
            SELECT url, et, ev FROM rec WHERE et IS NOT NULL
            UNION ALL
            SELECT url, bt, bv FROM rec WHERE i = n - 1
            UNION ALL
            SELECT url, lt, lv FROM lastpt)
        SELECT s.url, CAST(s.t AS BIGINT) AS t_unix, s.v AS v,
               f.n AS n_in
        FROM sel s JOIN firstpt f ON f.url = s.url
        UNION ALL
        SELECT url, t_unix, v, n_in FROM small
    """

    # swinging-door (new r6): same recursive-replay construction as
    # the LTTB gate; operand order mirrors the Spark fold exactly
    _S_NH = "((e.v + 5.0 - r.pav) / (e.t - r.pat))"
    _S_NL = "((e.v - 5.0 - r.pav) / (e.t - r.pat))"
    _S_SH2 = f"least(r.sh, {_S_NH})"
    _S_SL2 = f"greatest(r.sl, {_S_NL})"
    _S_X = f"({_S_SL2} > {_S_SH2})"
    _S_RH = "((e.v + 5.0 - r.phv) / (e.t - r.pht))"
    _S_RL = "((e.v - 5.0 - r.phv) / (e.t - r.pht))"
    o["m4_downsample"] = f"""
        WITH b AS (SELECT url, t // {6 * 3600} AS bucket, t, v
                   FROM ({_EB})),
        r AS (SELECT url, bucket, t, v,
                     row_number() OVER (PARTITION BY url, bucket
                                        ORDER BY t, v) AS fa,
                     row_number() OVER (PARTITION BY url, bucket
                                        ORDER BY t DESC, v DESC) AS la,
                     row_number() OVER (PARTITION BY url, bucket
                                        ORDER BY v, t) AS mn,
                     row_number() OVER (PARTITION BY url, bucket
                                        ORDER BY v DESC, t DESC) AS mx,
                     count(*) OVER (PARTITION BY url, bucket) AS n_in
              FROM b)
        SELECT DISTINCT url, bucket, t AS t_unix, v, n_in
        FROM r WHERE 1 IN (fa, la, mn, mx)
    """

    o["swinging_door"] = f"""
        WITH RECURSIVE
        pts AS (SELECT url, t, v,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY t) AS i,
                       count(*) OVER (PARTITION BY url) AS n
                FROM ({_EB})),
        small AS (SELECT url, t AS t_unix, v, n AS n_in
                  FROM pts WHERE n <= 2),
        big AS (SELECT url, CAST(t AS DOUBLE) AS t, v, i, n
                FROM pts WHERE n > 2),
        firstpt AS (SELECT url, t AS ft, v AS fv, n
                    FROM big WHERE i = 1),
        rec AS (
            SELECT e.url, e.i, e.n,
                   f.ft AS pat, f.fv AS pav,
                   ((e.v + 5.0 - f.fv) / (e.t - f.ft)) AS sh,
                   ((e.v - 5.0 - f.fv) / (e.t - f.ft)) AS sl,
                   e.t AS pht, e.v AS phv,
                   CAST(NULL AS DOUBLE) AS et,
                   CAST(NULL AS DOUBLE) AS ev
            FROM big e JOIN firstpt f ON f.url = e.url
            WHERE e.i = 2
            UNION ALL
            SELECT e.url, e.i, e.n,
                   CASE WHEN {_S_X} THEN r.pht ELSE r.pat END,
                   CASE WHEN {_S_X} THEN r.phv ELSE r.pav END,
                   CASE WHEN {_S_X} THEN {_S_RH} ELSE {_S_SH2} END,
                   CASE WHEN {_S_X} THEN {_S_RL} ELSE {_S_SL2} END,
                   e.t, e.v,
                   CASE WHEN {_S_X} THEN r.pht END,
                   CASE WHEN {_S_X} THEN r.phv END
            FROM rec r JOIN big e
              ON e.url = r.url AND e.i = r.i + 1),
        sel AS (
            SELECT url, ft AS t, fv AS v FROM firstpt
            UNION ALL
            SELECT url, et, ev FROM rec WHERE et IS NOT NULL
            UNION ALL
            SELECT url, pht, phv FROM rec WHERE i = n)
        SELECT s.url, CAST(s.t AS BIGINT) AS t_unix, s.v AS v,
               f.n AS n_in
        FROM sel s JOIN firstpt f ON f.url = s.url
        UNION ALL
        SELECT url, t_unix, v, n_in FROM small
    """

    # heartbeat_agg uptime (new r6): union of per-sample liveness
    # intervals (6 h each, truncated at the next sample, the last
    # sample untruncated), split at hour boundaries — exact integer
    # interval algebra on both sides, no rounding anywhere
    o["heartbeat_uptime"] = f"""
        WITH e AS (
            SELECT url,
                   CAST(epoch(date_trunc('second', warc_ts)) AS BIGINT)
                       AS t
            FROM ({_events_sql()})),
        s AS (SELECT url, t,
                     lead(t) OVER (PARTITION BY url ORDER BY t) AS tn
              FROM e),
        seg AS (SELECT url, t,
                       least(t + 21600, COALESCE(tn, t + 21600)) AS e
                FROM s),
        seg2 AS (SELECT * FROM seg WHERE e > t),
        x AS (SELECT url, t, e,
                     unnest(generate_series(t // 3600,
                                            (e - 1) // 3600)) AS k
              FROM seg2),
        c AS (SELECT url, k * 3600 AS bucket_start,
                     least(e, (k + 1) * 3600)
                         - greatest(t, k * 3600) AS dt
              FROM x)
        SELECT url, bucket_start,
               CAST(sum(dt) AS BIGINT) AS uptime_sec,
               CAST(sum(dt) AS BIGINT) / 3600.0 AS uptime_frac
        FROM c GROUP BY url, bucket_start
    """

    return o
