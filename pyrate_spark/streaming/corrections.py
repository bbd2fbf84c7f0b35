"""Streaming forms of the correction pipeline.

Two patterns cover the whole correct-step registry:

- **Stateful per-key operators** (running totals, LOCF): per-url state
  in ``applyInPandasWithState`` — `streaming_cumsum` here is the A6
  twin (the batch `cumulative` window), `streaming/gapfill.py` the T17
  twin.
- **Micro-batch replay** for corrections whose math needs a whole
  batch cross-section (per-bucket medians, cohort means, per-key
  lstsq): `run_correct_stream` wires the BATCH pipeline
  (plans/pipeline.run_correct) into ``foreachBatch`` — each micro-batch
  is corrected with exactly the batch operators and appended to the
  sink. This is the standard Spark recipe for non-incremental logic in
  a streaming job; semantics per batch are bit-identical to the batch
  pipeline by construction (it IS the batch pipeline).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyrate_spark.config import EngineConfig, DEFAULT

CUMSUM_OUT = ("url string, bucket_start timestamp, value_avg double, "
              "value_cuml double")
CUMSUM_STATE = "running double, seen boolean"


def _cumsum_fn():
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("bucket_start", kind="stable")
        v = rows["value_avg"].to_numpy(dtype=np.float64)
        running, seen = state.get if state.exists else (0.0, False)
        cuml = running + np.nancumsum(v)
        # match the batch window exactly: before any finite value the
        # null-skipping sum is NULL, not 0
        n_seen = np.cumsum(np.isfinite(v)) + (1 if seen else 0)
        cuml = np.where(n_seen > 0, cuml, np.nan)
        if len(v):
            running = running + float(np.nansum(v))
            seen = bool(seen or np.isfinite(v).any())
        state.update((running, seen))
        yield pd.DataFrame({
            "url": url,
            "bucket_start": rows["bucket_start"].to_numpy(),
            "value_avg": v,
            "value_cuml": cuml})
    return fn


def streaming_cumsum(tier_stream: DataFrame) -> DataFrame:
    """A6 twin: per-url running total carried across micro-batches.
    In-order feeding reproduces the batch `cumulative` window rows
    (NaN buckets contribute 0, matching the window's null-skipping
    sum)."""
    return (tier_stream
            .groupBy("url")
            .applyInPandasWithState(
                _cumsum_fn(), CUMSUM_OUT, CUMSUM_STATE,
                "append", GroupStateTimeout.NoTimeout))


CUSUM_OUT = ("url string, bucket_start timestamp, value_avg double, "
             "cusum_hi double, cusum_lo double, is_change boolean")
CUSUM_STATE = "hi double, lo double"


def _cusum_fn(mean: float, sigma: float, k: float, h: float):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("bucket_start", kind="stable")
        v = rows["value_avg"].to_numpy(dtype=np.float64)
        hi, lo = state.get if state.exists else (0.0, 0.0)
        his, los = [], []
        # plain python floats: IEEE doubles with the SAME (hi + z) - k
        # grouping as the batch fold, so rows are bit-identical
        for x in v.tolist():
            z = (x - mean) / sigma
            hi = max(0.0, hi + z - k)
            lo = max(0.0, lo - z - k)
            his.append(hi)
            los.append(lo)
        state.update((hi, lo))
        hi_a = np.asarray(his, dtype=np.float64)
        lo_a = np.asarray(los, dtype=np.float64)
        yield pd.DataFrame({
            "url": url,
            "bucket_start": rows["bucket_start"].to_numpy(),
            "value_avg": v,
            "cusum_hi": hi_a,
            "cusum_lo": lo_a,
            "is_change": (hi_a > h) | (lo_a > h)})
    return fn


def streaming_cusum(tier_stream: DataFrame, mean: float, sigma: float,
                    k: float = 0.5, h: float = 4.0) -> DataFrame:
    """Streaming Page CUSUM against a FIXED reference (mean, sigma) —
    the one-pass form of ``operators/anomaly.cusum_changepoint(...,
    target=(mean, sigma))``: per-url state is just the (hi, lo) pair,
    carried across micro-batches, so an in-order availableNow pass
    reproduces the batch operator row-for-row (bit-identical — same
    operation grouping). Unbounded url cardinality costs two doubles
    per url of state; no watermark needed because the statistic is
    cumulative, not windowed."""
    if not sigma > 0:
        raise ValueError(f"sigma must be > 0, got {sigma}")
    return (tier_stream
            .groupBy("url")
            .applyInPandasWithState(
                _cusum_fn(float(mean), float(sigma), float(k), float(h)),
                CUSUM_OUT, CUSUM_STATE,
                "append", GroupStateTimeout.NoTimeout))


ZSCORE_OUT = ("url string, bucket_start timestamp, value_avg double, "
              "n_window long, zscore double, is_anomaly boolean")
ZSCORE_STATE = "hist array<double>"


def _zscore_fn(window: int, nsig: float, min_obs: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import math
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows["value_avg"].notna()]
        rows = rows.sort_values("bucket_start", kind="stable")
        (hist,) = state.get if state.exists else ([],)
        hist = list(hist)
        ns, zs, flags = [], [], []
        # plain python floats folded oldest->newest: the SAME left-fold
        # order and operation grouping as the batch F.aggregate sums,
        # so mean/var/z are bit-identical
        for x in rows["value_avg"].tolist():
            n = len(hist)
            z = None
            if n > 1:
                s = 0.0
                ss = 0.0
                for v in hist:
                    s = s + v
                    ss = ss + v * v
                mean = s / n
                var = (ss - n * mean * mean) / (n - 1)
                if var > 0:
                    z = (x - mean) / math.sqrt(var)
            ns.append(n)
            zs.append(z)
            flags.append(bool(z is not None and n >= min_obs
                              and abs(z) > nsig))
            hist.append(x)
            if len(hist) > window:
                hist = hist[-window:]
        state.update((hist,))
        yield pd.DataFrame({
            "url": url,
            "bucket_start": rows["bucket_start"].to_numpy(),
            "value_avg": rows["value_avg"].to_numpy(),
            "n_window": pd.array(ns, dtype="int64"),
            "zscore": pd.array(zs, dtype="float64"),
            "is_anomaly": flags})
    return fn


def streaming_zscore(tier_stream: DataFrame, window: int = 24,
                     nsig: float = 3.0, min_obs: int = 6) -> DataFrame:
    """Streaming twin of ``operators/anomaly.anomaly_zscore``: per-url
    state is the trailing ``window``-bucket history (current row always
    excluded before its own test — the batch frame semantics), carried
    across micro-batches, so an in-order availableNow pass reproduces
    the batch operator row-for-row, bit-identically (same left-fold
    order over the same history). State is O(window) doubles per url —
    a small constant times unbounded url cardinality, the same state
    scaling as streaming_cusum; no watermark because the frame is
    row-based, not time-based."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_obs < 2:
        raise ValueError(f"min_obs must be >= 2, got {min_obs}")
    return (tier_stream
            .groupBy("url")
            .applyInPandasWithState(
                _zscore_fn(int(window), float(nsig), int(min_obs)),
                ZSCORE_OUT, ZSCORE_STATE,
                "append", GroupStateTimeout.NoTimeout))


HOLT_OUT = ("url string, bucket_start timestamp, value_avg double, "
            "level double, trend double, forecast double, "
            "forecast_error double")
HOLT_STATE = "l double, b double"


def _holt_fn(alpha: float, beta: float):
    oma = 1.0 - alpha
    omb = 1.0 - beta
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows["value_avg"].notna()]
        rows = rows.sort_values("bucket_start", kind="stable")
        l, b = state.get if state.exists else (None, None)
        ls, bs, fs, es = [], [], [], []
        # same operation grouping as the batch SQL fold:
        # l' = a*x + (1-a)*(l+b);  b' = beta*(l'-l) + (1-beta)*b
        for x in rows["value_avg"].tolist():
            if l is None:
                f = None
                l, b = x, 0.0
            else:
                f = l + b
                l_new = alpha * x + oma * (l + b)
                b = beta * (l_new - l) + omb * b
                l = l_new
            ls.append(l)
            bs.append(b)
            fs.append(f)
            es.append(None if f is None else x - f)
        if l is not None:
            state.update((l, b))
        yield pd.DataFrame({
            "url": url,
            "bucket_start": rows["bucket_start"].to_numpy(),
            "value_avg": rows["value_avg"].to_numpy(),
            "level": pd.array(ls, dtype="float64"),
            "trend": pd.array(bs, dtype="float64"),
            "forecast": pd.array(fs, dtype="float64"),
            "forecast_error": pd.array(es, dtype="float64")})
    return fn


def streaming_holt(tier_stream: DataFrame, alpha: float = 0.5,
                   beta: float = 0.3) -> DataFrame:
    """Streaming twin of ``operators/anomaly.holt_forecast``: per-url
    state is the two smoothing doubles (level, trend) carried across
    micro-batches — the cheapest state in the family — so an in-order
    availableNow pass reproduces the batch fold row-for-row,
    bit-identically (same IEEE operation grouping). The emitted
    one-step forecast_error is the residual a streaming alert rule
    thresholds, completing the alerting trio (z-score / CUSUM / Holt)
    in both batch and streaming forms."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    return (tier_stream
            .groupBy("url")
            .applyInPandasWithState(
                _holt_fn(float(alpha), float(beta)),
                HOLT_OUT, HOLT_STATE,
                "append", GroupStateTimeout.NoTimeout))


def streaming_seasonal(tier_stream: DataFrame,
                       profile_df: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/anomaly.seasonal_baseline``:
    score arriving tier rows against a PRECOMPUTED (url, hour-of-day)
    profile via Spark's native stream-static join — the fixed-
    reference form a one-pass detector must use (the ``target``
    pattern from streaming_cusum, with the whole profile table as the
    target). ``profile_df`` comes from
    ``operators/anomaly.seasonal_profile`` over the retained batch
    tier; rows joined against the same profile the batch operator
    derives are bit-identical to its output. The static side is
    url x 24 rows — broadcast-friendly; no state, no watermark, and
    the stream side never shuffles when the profile broadcasts."""
    from pyrate_spark.operators.anomaly import _hour_of_day
    t = (tier_stream.where(F.col("value_avg").isNotNull())
         .withColumn("hod", _hour_of_day(tier_stream, "bucket_start")))
    p = profile_df.select("url", "hod", "baseline", "n_profile")
    return (t.join(p, ["url", "hod"])
            .select("url", "bucket_start", "value_avg", "hod",
                    "baseline",
                    (F.col("value_avg") - F.col("baseline"))
                    .alias("residual"),
                    "n_profile"))


def run_correct_stream(series_stream: DataFrame, out_path: str,
                       checkpoint_path: str,
                       cfg: EngineConfig = DEFAULT,
                       order: tuple = ("orbfit", "refphase")):
    """foreachBatch replay of the batch correct pipeline: every
    micro-batch goes through plans/pipeline.run_correct unchanged and
    appends to the sink. Returns the StreamingQuery."""
    from pyrate_spark.plans.pipeline import run_correct

    def process(batch_df: DataFrame, batch_id: int):
        (run_correct(batch_df, cfg, order=order)
         .write.mode("append").parquet(out_path))

    return (series_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
