"""Single-pass column profiler (data-quality summary).

The reference validates its inputs up front — per-file header/epoch
consistency checks (`validate_epochs` / `validate_ifgs`,
/root/reference/pyrate/core/prepifg_helper.py:51-100) and the
nan-fraction / coherence statistics it stamps into every product
header — before any expensive stage runs. The counterpart for a
training-data pipeline is a table profile: per column, row count,
null count, distinct cardinality and min/max, computed in as few
passes as possible so profiling 100 TB doesn't cost more than the
job it protects.

Two paths, one shape (the jaccard/max_df discipline — the scale path
is the default, the exact path is the gate twin):

- default `exact=False`: ONE aggregation pass; distinct cardinality
  via `approx_count_distinct` (HyperLogLog++, mergeable map-side
  partials, no extra shuffle).
- `exact=True`: exact `count_distinct` per column. Catalyst expands
  n distinct aggregates into an n-way Expand (each row replicated
  once per column) — one shuffle, but n x the shuffle volume. Fine
  at gate scale, and that cost asymmetry is exactly why it is not
  the default.

The wide one-row aggregate is unpivoted to (column, stats) rows with
a literal `stack` — driver-free, no extra job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    exact: bool = False) -> DataFrame:
    """Profile `cols` (default: all) in one aggregation pass.

    Output: (col_name, n_rows, n_null, null_fraction, n_distinct,
    min_str, max_str) — min/max cast to string so heterogeneous
    column types share one schema.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (F.count_distinct if exact
                else (lambda c: F.approx_count_distinct(c)))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols)
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_str, max_str)",
    ).select(
        "col_name", "n_rows", "n_null",
        F.round(F.col("n_null").cast("double") / F.col("n_rows"), 6)
        .alias("null_fraction"),
        "n_distinct", "min_str", "max_str")
