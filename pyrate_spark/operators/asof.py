"""As-of join: enrich each left row with the most recent right row at
or before (backward) / the earliest at or after (forward) its
timestamp, per key.

The reference pairs every observation epoch with interpolated /
carried-forward correction surfaces by index arithmetic inside one
process (e.g. temporal interpolation in the APS workflow,
pyrate/core/aps.py:200-260); the engine analog is the classic
time-series as-of join — match raw points against the latest tier
aggregate, a dimension snapshot, or a slowly-changing config.

Spark-first plan (scales to 10^12 rows):

- NOT a range join (`l.ts >= r.ts` non-equi join explodes to
  O(rows_l x rows_r) per key before aggregation, and Spark plans it
  as BroadcastNestedLoop when the key join is dropped);
- instead: union both sides tagged with a side bit, ONE shuffle on
  the key, one ordered window, `last(<struct>, ignorenulls)` carries
  the most recent right row forward onto every left row. O(n log n)
  per partition, no Python, AQE-compatible.
- ties (left.ts == right.ts) match the right row, same as DuckDB /
  pandas `merge_asof(allow_exact_matches=True)`: the side bit orders
  right rows before left rows at equal timestamps.
- the right row's payload travels as ONE non-null struct so a NULL in
  an individual right column cannot make the window skip past the
  true latest row.
- ``tolerance_sec`` nulls out matches staler than the bound
  (pandas `merge_asof(tolerance=...)` semantics) without a second
  pass: the struct carries the matched timestamp.

Skew note: one hot key lands in one window task, like every per-key
ordered operator here; at production scale hot urls are bounded by
retention (points per url per tier are capped by the bucket grid),
so the window frame stays small even when the url is crawled often.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DataType, DateType, NumericType, TimestampType

_SIDE = "_asof_side"
_TS = "_asof_ts"
_PAYLOAD = "_asof_match"


def _as_seconds(col, dtype: DataType, what: str):
    """Epoch seconds for a timestamp OR epoch-numeric column.

    `F.unix_timestamp` on a numeric column string-parses the number and
    returns NULL, which would silently null every tolerance match — so
    numeric (epoch-seconds) columns pass through and anything else is a
    loud error.
    """
    if isinstance(dtype, (TimestampType, DateType)):
        return F.unix_timestamp(col)
    if isinstance(dtype, NumericType):
        return col.cast("double")
    raise TypeError(f"{what} must be a timestamp or epoch-seconds "
                    f"numeric column for tolerance_sec, got {dtype}")


def asof_join(left: DataFrame, right: DataFrame,
              key: str = "url",
              left_ts: str = "warc_ts",
              right_ts: str = "bucket_start",
              right_cols: Sequence[str] | None = None,
              tolerance_sec: int | None = None,
              direction: str = "backward",
              matched_ts_name: str = "asof_ts") -> DataFrame:
    """Left as-of join. Returns every ``left`` row plus ``right_cols``
    from the matched right row (NULL when no match / out of
    tolerance) and the matched right timestamp as ``matched_ts_name``.

    ``right_cols`` defaults to every right column except the key and
    timestamp; names must not collide with left's columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: "
                         f"{sorted(clash)}; rename before joining")

    carried = [c for c in left.columns if c not in (key, left_ts)]
    payload = F.struct(
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(c) for c in right_cols]).alias(_PAYLOAD)
    r = right.select(
        F.col(key),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in carried])
    l = left.select(
        F.col(key),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *carried)

    # backward: right rows sort before left at equal ts, carry forward;
    # forward: reverse time so "first at-or-after" becomes the same
    # carry-forward (side bit still puts right rows first).
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()]
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    u = r.unionByName(l)
    matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    out = (u.withColumn(_PAYLOAD, matched)
           .where(F.col(_SIDE) == 1))

    m = F.col(_PAYLOAD)
    if tolerance_sec is not None:
        age = (_as_seconds(F.col(_TS), left.schema[left_ts].dataType,
                           f"left_ts {left_ts!r}")
               - _as_seconds(m["_t"], right.schema[right_ts].dataType,
                             f"right_ts {right_ts!r}"))
        if direction == "forward":
            age = -age
        m = F.when(age <= F.lit(int(tolerance_sec)), m)
    sel = [F.col(key), F.col(_TS).alias(left_ts)] + \
        [F.col(c) for c in carried] + \
        [m["_t"].alias(matched_ts_name)] + \
        [m[c].alias(c) for c in right_cols]
    return out.select(*sel)
