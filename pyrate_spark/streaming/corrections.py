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
from pyspark.sql import DataFrame
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
