"""Derived-metric operators with PromQL / TimescaleDB semantics:
time-weighted averages, per-bucket regression slope, instantaneous
rate, and histogram quantiles.

The reference pipeline derives its headline products by fitting
per-pixel models over an irregular epoch axis (linear rate via
weighted least squares, pyrate/core/stack.py:92; incremental
displacement, timeseries.py) — the operators here are the
web-observability counterparts of that same "irregular samples ->
per-key derived metric" shape, re-expressed as the public PromQL
(`deriv`, `irate`, `histogram_quantile`) and TimescaleDB
(`time_weight`) constructions. Everything is JVM column algebra
partitioned on url (an unbounded, shardable key): one Exchange per
operator, constant-bounded frames or group folds, no Python in the
hot path — the same scale contract as the anomaly family.

Unlike the exact-fold gates (ewma/CUSUM/Holt), these operators end in
a plain SUM over per-segment or per-sample terms, whose addition
order is engine-dependent — so their oracle gates round like every
other groupBy-avg gate in the suite (docstrings note it per op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyrate_spark.operators.asof import _as_seconds


def _epoch_col(df: DataFrame, ts_col: str):
    """Epoch-seconds long for a timestamp OR epoch-numeric column
    (same schema-resolved policy as asof_join/counter_rate)."""
    return _as_seconds(F.col(ts_col), df.schema[ts_col].dataType,
                       f"ts_col {ts_col!r}").cast("long")


def time_weighted_avg(series_df: DataFrame, bucket_sec: int,
                      method: str = "locf",
                      max_gap_sec: int | None = None,
                      value_col: str = "value",
                      ts_col: str = "warc_ts") -> DataFrame:
    """Time-weighted average per (url, bucket) — TimescaleDB
    ``time_weight('LOCF' | 'Linear')`` semantics (public docs): each
    consecutive-sample segment [t_i, t_{i+1}) contributes its held
    value (LOCF) or trapezoid (linear interpolation) integral, split
    exactly at bucket boundaries, and the bucket's average divides the
    accumulated integral by the seconds it actually covers (not the
    nominal bucket width — a bucket observed for 10 minutes averages
    those 10 minutes). The last sample of a url opens no segment;
    rows with NULL values are skipped (the segment bridges them, like
    TimescaleDB).

    ``max_gap_sec`` caps how long a value is held: a segment longer
    than the cap contributes only its first ``max_gap_sec`` seconds
    (PromQL's staleness-lookback analog). This also bounds the
    boundary-split explode at ``max_gap_sec / bucket_sec`` rows per
    segment — set it at 100 TB scale so one dead url cannot fan a
    single segment into years of buckets; unset, a segment spanning G
    seconds emits G / bucket_sec rows.

    Shape: one Exchange on url for the lead() window, then the
    segment-to-bucket explode (``sequence`` + ``explode``) and one
    hash aggregation on (url, bucket) — a key strictly finer than
    url. Output ``bucket_start`` is epoch-seconds (long); the
    integral ends in a SUM whose addition order is engine-dependent,
    so gates round it (5 dp like every avg gate).
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method!r}")
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if max_gap_sec is not None and max_gap_sec < 1:
        raise ValueError(f"max_gap_sec must be >= 1, got {max_gap_sec}")
    W = int(bucket_sec)
    t = series_df.where(F.col(value_col).isNotNull()) \
        .select("url", _epoch_col(series_df, ts_col).alias("_t"),
                F.col(value_col).cast("double").alias("_v"))
    w = Window.partitionBy("url").orderBy("_t")
    t = (t.withColumn("_tn", F.lead("_t").over(w))
          .withColumn("_vn", F.lead("_v").over(w))
          .where(F.col("_tn").isNotNull() & (F.col("_tn") > F.col("_t"))))
    if max_gap_sec is not None:
        t = t.withColumn(
            "_tn", F.least(F.col("_tn"),
                           F.col("_t") + F.lit(int(max_gap_sec))))
    # buckets the (possibly capped) segment overlaps: floor(t/W) ..
    # floor((tn-1)/W); tn > t guarantees a non-empty sequence
    t = t.withColumn(
        "_k", F.explode(F.sequence(
            F.floor(F.col("_t") / W).cast("long"),
            F.floor((F.col("_tn") - 1) / W).cast("long"))))
    a = F.greatest(F.col("_t"), F.col("_k") * W)
    b = F.least(F.col("_tn"), (F.col("_k") + 1) * W)
    dt = (b - a).cast("double")
    if method == "locf":
        contrib = F.col("_v") * dt
    else:
        # value at clip points via the segment's line, trapezoid rule
        slope = (F.col("_vn") - F.col("_v")) \
            / (F.col("_tn") - F.col("_t")).cast("double")
        va = F.col("_v") + slope * (a - F.col("_t")).cast("double")
        vb = F.col("_v") + slope * (b - F.col("_t")).cast("double")
        contrib = (va + vb) / 2.0 * dt
    return (t.groupBy("url", (F.col("_k") * W).alias("bucket_start"))
            .agg((F.sum(contrib) / F.sum(dt)).alias("value_twa"),
                 F.sum(dt).cast("long").alias("covered_sec"))
            .select("url", "bucket_start", "value_twa", "covered_sec"))


def heartbeat_uptime(series_df: DataFrame, bucket_sec: int,
                     heartbeat_sec: int,
                     ts_col: str = "warc_ts") -> DataFrame:
    """Liveness / uptime per (url, bucket) — TimescaleDB
    ``heartbeat_agg`` semantics (public docs): every observed sample
    asserts liveness for the next ``heartbeat_sec`` seconds; the
    bucket's uptime is the union of those intervals clipped to the
    bucket. Overlaps never double-count (each sample's interval is
    truncated at the next sample), so ``uptime_sec`` is exact integer
    interval algebra and ``uptime_frac = uptime_sec / bucket_sec`` is
    a ratio of exact integers — the gate needs NO rounding. The LAST
    sample of a url also asserts ``heartbeat_sec`` of liveness (there
    is no next sample to truncate it).

    Same execution shape as ``time_weighted_avg``: one Exchange on
    url for the lead() window, a bucket-split explode bounded by
    ``heartbeat_sec / bucket_sec`` rows per sample, one hash
    aggregation on (url, bucket).
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if heartbeat_sec < 1:
        raise ValueError(
            f"heartbeat_sec must be >= 1, got {heartbeat_sec}")
    W, H = int(bucket_sec), int(heartbeat_sec)
    t = series_df.select("url", _epoch_col(series_df, ts_col)
                         .alias("_t")).where(F.col("_t").isNotNull())
    w = Window.partitionBy("url").orderBy("_t")
    t = (t.withColumn("_tn", F.lead("_t").over(w))
          .withColumn("_e", F.least(F.col("_t") + H,
                                    F.coalesce("_tn",
                                               F.col("_t") + H)))
          .where(F.col("_e") > F.col("_t")))
    t = t.withColumn(
        "_k", F.explode(F.sequence(
            F.floor(F.col("_t") / W).cast("long"),
            F.floor((F.col("_e") - 1) / W).cast("long"))))
    a = F.greatest(F.col("_t"), F.col("_k") * W)
    b = F.least(F.col("_e"), (F.col("_k") + 1) * W)
    return (t.groupBy("url", (F.col("_k") * W).alias("bucket_start"))
            .agg(F.sum(b - a).cast("long").alias("uptime_sec"))
            .select("url", "bucket_start", "uptime_sec",
                    (F.col("uptime_sec") / F.lit(float(W)))
                    .alias("uptime_frac")))


def gap_detect(series_df: DataFrame, heartbeat_sec: int,
               ts_col: str = "warc_ts") -> DataFrame:
    """Dead-time intervals per url — the complement of
    ``heartbeat_uptime`` (TimescaleDB ``state_agg`` downtime /
    Prometheus ``absent()`` analog): under the same liveness rule
    (each sample asserts ``heartbeat_sec`` of liveness), a GAP opens
    at ``t_i + heartbeat_sec`` whenever the next sample arrives later
    than that, and closes at the next sample. Emits one row per gap
    with exact integer bounds — trailing gaps (after the last sample)
    are a monitoring-time question, not a data question, so none are
    emitted.

    One Exchange on url for the lead() window, then a filter — rows
    out are at most rows in. Exact integer interval algebra end to
    end; the gate needs no rounding.
    """
    if heartbeat_sec < 1:
        raise ValueError(
            f"heartbeat_sec must be >= 1, got {heartbeat_sec}")
    H = int(heartbeat_sec)
    t = series_df.select("url", _epoch_col(series_df, ts_col)
                         .alias("_t")).where(F.col("_t").isNotNull())
    w = Window.partitionBy("url").orderBy("_t")
    t = (t.withColumn("_tn", F.lead("_t").over(w))
          .where(F.col("_tn") > F.col("_t") + H))
    return t.select("url",
                    (F.col("_t") + H).alias("gap_start"),
                    F.col("_tn").alias("gap_end"),
                    (F.col("_tn") - F.col("_t") - H).alias("gap_sec"))


def regression_slope(series_df: DataFrame, bucket_sec: int,
                     value_col: str = "value",
                     ts_col: str = "warc_ts") -> DataFrame:
    """Per-(url, bucket) least-squares slope of value against time —
    PromQL ``deriv()`` (public docs: simple linear regression over the
    range), the gauge-trend twin of the reference's per-pixel linear
    rate (stack.py:92 fits the same normal equations with unit
    weights). Seconds are centred on the bucket start so the sums stay
    small; buckets with < 2 samples or zero time-variance yield NULL.

    One hash aggregation on (url, bucket) computing the five
    regression sums — pure codegen, no window, no Python. The sums'
    addition order is engine-dependent: gates round (6 dp).
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    W = int(bucket_sec)
    t = series_df.where(F.col(value_col).isNotNull()) \
        .select("url", _epoch_col(series_df, ts_col).alias("_t"),
                F.col(value_col).cast("double").alias("_v"))
    k = F.floor(F.col("_t") / W).cast("long")
    x = (F.col("_t") - k * W).cast("double")
    g = (t.groupBy("url", (k * W).alias("bucket_start"))
         .agg(F.count("*").alias("_n"),
              F.sum(x).alias("_sx"),
              F.sum(F.col("_v")).alias("_sv"),
              F.sum(x * F.col("_v")).alias("_sxv"),
              F.sum(x * x).alias("_sxx")))
    n = F.col("_n").cast("double")
    det = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when((F.col("_n") >= 2) & (det > 0),
                   (n * F.col("_sxv") - F.col("_sx") * F.col("_sv"))
                   / det)
    return g.select("url", "bucket_start",
                    F.col("_n").alias("n_samples"),
                    slope.alias("slope_per_sec"))


def irate(series_df: DataFrame, bucket_sec: int,
          counter: bool = True,
          value_col: str = "value",
          ts_col: str = "warc_ts") -> DataFrame:
    """Instantaneous rate per (url, bucket) — PromQL ``irate()``
    (public docs: the delta of the LAST TWO samples in the range over
    their time gap). ``counter=True`` applies counter-reset semantics
    (a drop restarts the counter: the delta is the new value itself,
    exactly ``counter_rate``'s reset rule); ``counter=False`` is the
    gauge form (signed delta). Buckets with < 2 samples yield NULL.

    One hash aggregation on (url, bucket): the group folds to its two
    greatest (ts, value) structs via ``max_by``-style sort_array
    tail — no window, no per-group list retained past the aggregate,
    group cost O(n log n) in the bucket's samples. Deterministic: the
    struct sort breaks value ties by timestamp, and timestamps within
    a url are unique in every tier this suite produces.
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    W = int(bucket_sec)
    t = series_df.where(F.col(value_col).isNotNull()) \
        .select("url", _epoch_col(series_df, ts_col).alias("_t"),
                F.col(value_col).cast("double").alias("_v"))
    k = F.floor(F.col("_t") / W).cast("long")
    g = (t.groupBy("url", (k * W).alias("bucket_start"))
         .agg(F.sort_array(F.collect_list(
             F.struct(F.col("_t").alias("t"),
                      F.col("_v").alias("v")))).alias("_s")))
    last = F.element_at("_s", -1)
    prev = F.element_at("_s", -2)
    d = last["v"] - prev["v"]
    if counter:
        d = F.when(last["v"] < prev["v"], last["v"]).otherwise(d)
    dt = (last["t"] - prev["t"]).cast("double")
    rate = F.when((F.size("_s") >= 2) & (dt > 0), d / dt)
    return g.select("url", "bucket_start",
                    F.size("_s").cast("long").alias("n_samples"),
                    rate.alias("irate_per_sec"))


def histogram_quantile(hist_df: DataFrame, q: float,
                       le_col: str = "le",
                       count_col: str = "cum_count") -> DataFrame:
    """Quantile from a cumulative le-bucketed histogram — PromQL
    ``histogram_quantile(q, ...)`` (public docs): per (url,
    bucket_start), find the first bucket whose cumulative count
    reaches rank ``q * total`` and interpolate linearly inside it
    between the previous bucket's upper bound (0 below the lowest
    finite bucket, like Prometheus) and its own. Rank landing in the
    +Inf bucket returns the highest finite bound; empty histograms
    yield NULL. Input rows carry CUMULATIVE counts, one row per
    (url, bucket_start, le), with le = +Infinity present (the
    Prometheus histogram contract); a group whose +Inf row is missing
    uses its highest cumulative count as the total.

    One hash aggregation on (url, bucket_start) folding the sorted
    (le, count) list — bucket-boundary count is small and fixed
    (Prometheus default 10-15 les), so the per-group list is O(les),
    never O(samples). Interpolation is two multiplies and a divide:
    gates round (6 dp).
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    g = (hist_df.groupBy("url", "bucket_start")
         .agg(F.sort_array(F.collect_list(F.struct(
             F.col(le_col).cast("double").alias("le"),
             F.col(count_col).cast("double").alias("c"))))
             .alias("_h")))
    total = F.element_at("_h", -1)["c"]
    rank = F.lit(float(q)) * total
    # first bucket with c >= rank: filter preserves le order
    hit = F.element_at(F.filter("_h", lambda s: s["c"] >= rank), 1)
    idx = F.array_position("_h", hit)
    prev = F.when(idx > 1, F.element_at("_h", (idx - 1).cast("int")))
    lo_le = F.coalesce(prev["le"], F.lit(0.0))
    lo_c = F.coalesce(prev["c"], F.lit(0.0))
    # highest finite le, for ranks landing in +Inf
    finite = F.filter("_h", lambda s: ~F.isnan(s["le"])
                      & (s["le"] != float("inf")))
    top_finite = F.element_at(finite, -1)["le"]
    span = hit["c"] - lo_c
    interp = F.when(span > 0,
                    lo_le + (hit["le"] - lo_le) * (rank - lo_c) / span) \
        .otherwise(hit["le"])
    value = F.when(total <= 0, F.lit(None).cast("double")) \
        .when(hit["le"] == float("inf"), top_finite) \
        .otherwise(interp)
    return g.select("url", "bucket_start",
                    total.cast("long").alias("total_count"),
                    value.alias(f"q{int(round(q * 100)):02d}"))
