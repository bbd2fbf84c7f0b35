"""Stateful streaming gap-fill: the continuous twin of
operators.rollup.gapfill_tier(method='locf').

The batch operator materialises each url's full bucket grid and fills
holes with the last observation (T17). Streaming can't see the future
grid, so the fill state lives in ``applyInPandasWithState``: per url
the state carries (last emitted bucket, last non-null value); each
micro-batch emits the incoming buckets plus synthetic filled rows for
every missing grid step since the previous batch. Feeding the same
in-order data through any number of micro-batches therefore produces
exactly the batch operator's rows (asserted in
tests/test_streaming.py::test_streaming_gapfill_matches_batch).

Out-of-order buckets older than the state's frontier cannot be
re-emitted (their gap rows are already out) and are dropped — the
state-frontier analog of the tier job's watermark drop.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("url string, bucket_start timestamp, value_filled double, "
              "filled boolean")
STATE_SCHEMA = "last_bucket long, last_value double"


def _gapfill_fn(bucket_seconds: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        b = (rows["bucket_start"].to_numpy()
             .astype("datetime64[s]").astype(np.int64))
        v = rows["value_avg"].to_numpy(dtype=np.float64)
        order = np.argsort(b, kind="stable")
        b, v = b[order], v[order]

        if state.exists:
            last_b, last_v = state.get
        else:
            last_b, last_v = None, None

        out_b, out_v, out_f = [], [], []
        for bi, vi in zip(b.tolist(), v.tolist()):
            if last_b is not None and bi <= last_b:
                continue                      # behind the state frontier
            if last_b is not None:
                for g in range(last_b + bucket_seconds, bi,
                               bucket_seconds):
                    out_b.append(g)
                    out_v.append(last_v)
                    out_f.append(True)
            filled = not np.isfinite(vi)
            out_b.append(bi)
            out_v.append(last_v if filled else vi)
            out_f.append(bool(filled))
            last_b = bi
            if not filled:
                last_v = vi
        if last_b is not None:
            state.update((int(last_b),
                          float(last_v) if last_v is not None
                          and np.isfinite(last_v) else float("nan")))
        if out_b:
            yield pd.DataFrame({
                "url": url,
                "bucket_start": np.array(out_b,
                                         dtype="datetime64[s]"),
                "value_filled": np.array(out_v, dtype=np.float64),
                "filled": out_f})

    return fn


def streaming_gapfill_locf(tier_stream: DataFrame,
                           bucket_seconds: int = 3600) -> DataFrame:
    """tier rows (url, bucket_start, value_avg, ...) -> gap-filled rows
    (url, bucket_start, value_filled, filled), LOCF across micro-batch
    boundaries via per-url state."""
    return (tier_stream
            .groupBy("url")
            .applyInPandasWithState(
                _gapfill_fn(bucket_seconds), OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
