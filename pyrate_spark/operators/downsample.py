"""LTTB downsampling: Largest-Triangle-Three-Buckets per key.

The visual-fidelity downsample (Steinarsson 2013, public MSc thesis
"Downsampling Time Series for Visual Representation" — the algorithm
TimescaleDB ships as ``lttb()`` and Grafana uses for panel queries):
keep the first and last points, split the interior into ``n_out - 2``
equal-count buckets, and from each bucket keep the point forming the
largest triangle with the PREVIOUSLY kept point and the NEXT bucket's
average point. The reference engine's D-family covers mean multilook
(D1, pyrate/core/prepifg_helper.py) and nearest-neighbour (D3)
resampling; LTTB is the dashboard-grade third member — it preserves
the spikes and shape a mean rollup flattens.

Execution shape: one Exchange (groupBy url), the per-url series
collected ONCE into a t-sorted array (bounded by the tier retention
window — the same contract as the ewma/CUSUM/Holt folds), then pure
JVM column algebra: bucket anchor averages from disjoint slice folds
and one O(n) running ``aggregate`` fold carrying (previous kept
point, current bucket, best-so-far, kept list). No Python anywhere;
url is the unbounded shardable key.

Determinism (O4): the sequential fold fixes every operand and its
evaluation order, bucket sums are left folds over the t-sorted slice,
and area ties keep the EARLIEST candidate (strict ``>``), so the
selection is bit-reproducible across engines and parallelism — the
DuckDB oracle replays the identical recurrence step-for-step (a
recursive CTE, one row per interior point, the ``holt_forecast``
oracle pattern). Timestamps must be unique per url (every tier and
the deduped event series guarantee it); NULL values are dropped
before bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyrate_spark.operators.asof import _as_seconds

# bucket of interior offset u (0-based, u in [0, n-3]) under the
# canonical floor boundaries lo(b) = b*(n-2) DIV m (Steinarsson's
# `floor(b * every)`): b(u) = ((u+1)*m - 1) DIV (n-2) — verified to
# invert the boundary partition exhaustively in tests
_B = "((CAST(u AS BIGINT) + 1) * {m} - 1) DIV CAST(_n - 2 AS BIGINT)"

# anchor-average array: one struct per bucket, sums as left folds over
# the bucket's disjoint slice (slice start/count from the integer
# bucket-boundary formula; cnt >= 1 whenever m <= n - 2)
_AVGS = """
    CASE WHEN _n <= {n_out} THEN
        CAST(array() AS ARRAY<STRUCT<at: DOUBLE, av: DOUBLE>>)
    ELSE
    transform(sequence(0, {m} - 1), b -> struct(
        aggregate(slice(_s,
                CAST(CAST(b AS BIGINT) * (_n - 2) DIV {m} AS INT) + 2,
                CAST((CAST(b AS BIGINT) + 1) * (_n - 2) DIV {m}
                     - CAST(b AS BIGINT) * (_n - 2) DIV {m} AS INT)),
            CAST(0.0 AS DOUBLE), (a, x) -> a + x.t)
        / (CAST((CAST(b AS BIGINT) + 1) * (_n - 2) DIV {m}
                - CAST(b AS BIGINT) * (_n - 2) DIV {m} AS DOUBLE))
            AS at,
        aggregate(slice(_s,
                CAST(CAST(b AS BIGINT) * (_n - 2) DIV {m} AS INT) + 2,
                CAST((CAST(b AS BIGINT) + 1) * (_n - 2) DIV {m}
                     - CAST(b AS BIGINT) * (_n - 2) DIV {m} AS INT)),
            CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)
        / (CAST((CAST(b AS BIGINT) + 1) * (_n - 2) DIV {m}
                - CAST(b AS BIGINT) * (_n - 2) DIV {m} AS DOUBLE))
            AS av))
    END
"""

# per-interior-point element: its coordinates, bucket, and the NEXT
# anchor (next bucket's average, or the last point for the final
# bucket) — precomputed so the running fold reads only (acc, x)
_ELEMS = f"""
    CASE WHEN _n > {{n_out}} THEN
        transform(sequence(0, _n - 3), u -> struct(
            element_at(_s, CAST(u + 2 AS INT)).t AS t,
            element_at(_s, CAST(u + 2 AS INT)).v AS v,
            {_B} AS b,
            CASE WHEN {_B} + 1 < {{m}}
                 THEN element_at(_avgs, CAST({_B} + 2 AS INT)).at
                 ELSE element_at(_s, _n).t END AS nat,
            CASE WHEN {_B} + 1 < {{m}}
                 THEN element_at(_avgs, CAST({_B} + 2 AS INT)).av
                 ELSE element_at(_s, _n).v END AS nav))
    ELSE CAST(array() AS ARRAY<STRUCT<t: DOUBLE, v: DOUBLE, b: BIGINT,
                                      nat: DOUBLE, nav: DOUBLE>>)
    END
"""

# triangle area (doubled; scaling cannot change the argmax) against
# the previous kept point (p) and the next anchor — operand order is
# pinned; the DuckDB replay writes the identical expression
_AREA_P = ("abs((acc.pt - x.nat) * (x.v - acc.pv)"
           " - (acc.pt - x.t) * (x.nav - acc.pv))")
_AREA_T = ("abs((acc.bt - x.nat) * (x.v - acc.bv)"
           " - (acc.bt - x.t) * (x.nav - acc.bv))")

_FOLD = f"""
    CASE WHEN _n <= {{n_out}} THEN
        transform(_s, p -> struct(p.t AS t, p.v AS v))
    ELSE
    aggregate(
        _elems,
        struct(element_at(_s, 1).t AS pt, element_at(_s, 1).v AS pv,
               CAST(0 AS BIGINT) AS cb,
               CAST(-1.0 AS DOUBLE) AS ba,
               CAST(NULL AS DOUBLE) AS bt, CAST(NULL AS DOUBLE) AS bv,
               array(struct(element_at(_s, 1).t AS t,
                            element_at(_s, 1).v AS v)) AS out),
        (acc, x) -> CASE WHEN x.b != acc.cb THEN
            struct(acc.bt AS pt, acc.bv AS pv, x.b AS cb,
                   {_AREA_T} AS ba, x.t AS bt, x.v AS bv,
                   array_append(acc.out,
                                struct(acc.bt AS t, acc.bv AS v))
                       AS out)
        ELSE
            struct(acc.pt AS pt, acc.pv AS pv, acc.cb AS cb,
                   CASE WHEN {_AREA_P} > acc.ba THEN {_AREA_P}
                        ELSE acc.ba END AS ba,
                   CASE WHEN {_AREA_P} > acc.ba THEN x.t
                        ELSE acc.bt END AS bt,
                   CASE WHEN {_AREA_P} > acc.ba THEN x.v
                        ELSE acc.bv END AS bv,
                   acc.out AS out)
        END,
        acc -> concat(acc.out,
                      array(struct(acc.bt AS t, acc.bv AS v),
                            struct(element_at(_s, _n).t AS t,
                                   element_at(_s, _n).v AS v))))
    END
"""


_SDT_NH = "((x.v + {e} - acc.pav) / (x.t - acc.pat))"
_SDT_NL = "((x.v - {e} - acc.pav) / (x.t - acc.pat))"
_SDT_SH2 = f"least(acc.sh, {_SDT_NH})"
_SDT_SL2 = f"greatest(acc.sl, {_SDT_NL})"
_SDT_X = f"({_SDT_SL2} > {_SDT_SH2})"
_SDT_RH = "((x.v + {e} - acc.phv) / (x.t - acc.pht))"
_SDT_RL = "((x.v - {e} - acc.phv) / (x.t - acc.pht))"

_SDT_FOLD = f"""
    CASE WHEN _n <= 2 THEN
        transform(_s, p -> struct(p.t AS t, p.v AS v))
    ELSE
    aggregate(
        slice(_s, 2, _n - 1),
        struct(element_at(_s, 1).t AS pat, element_at(_s, 1).v AS pav,
               CAST('Infinity' AS DOUBLE) AS sh,
               CAST('-Infinity' AS DOUBLE) AS sl,
               element_at(_s, 1).t AS pht, element_at(_s, 1).v AS phv,
               array(struct(element_at(_s, 1).t AS t,
                            element_at(_s, 1).v AS v)) AS out),
        (acc, x) -> struct(
            CASE WHEN {_SDT_X} THEN acc.pht ELSE acc.pat END AS pat,
            CASE WHEN {_SDT_X} THEN acc.phv ELSE acc.pav END AS pav,
            CASE WHEN {_SDT_X} THEN {_SDT_RH} ELSE {_SDT_SH2} END
                AS sh,
            CASE WHEN {_SDT_X} THEN {_SDT_RL} ELSE {_SDT_SL2} END
                AS sl,
            x.t AS pht, x.v AS phv,
            CASE WHEN {_SDT_X}
                 THEN array_append(acc.out, struct(acc.pht AS t,
                                                   acc.phv AS v))
                 ELSE acc.out END AS out),
        acc -> concat(acc.out, array(struct(acc.pht AS t,
                                            acc.phv AS v))))
    END
"""


def swinging_door(series_df: DataFrame, tolerance: float,
                  value_col: str = "value",
                  ts_col: str = "warc_ts") -> DataFrame:
    """Swinging-door trending (SDT) compression per url — the
    industrial-historian standard (Bristol 1990; the OSIsoft PI
    "compression deviation" algorithm, public): archive the minimal
    subset of points such that the line between consecutive archived
    points stays within ``tolerance`` of every dropped point. Two
    "door" slopes from the last archived point (through each new
    point ±tolerance) narrow monotonically; when they cross, the
    PREVIOUSLY held point is archived and the doors reset from it.
    First and last points are always archived. Error contract (the
    classic algorithm's, pinned by test): the archived polyline stays
    within **2 x tolerance** of every dropped point — the door
    interval certifies a line within tolerance of all seen points and
    the archived segment differs from it by at most tolerance at the
    held point; pass ``tolerance = E / 2`` for a strict E guarantee.

    Where LTTB keeps a fixed budget of visually-dominant points, SDT
    keeps a variable number bounded by an error guarantee — the two
    standard lossy-downsample contracts, side by side. Same execution
    shape and determinism story as ``lttb_downsample``: one Exchange,
    one O(n) JVM ``aggregate`` fold, every operand and comparison
    order fixed, replayed step-for-step by the DuckDB oracle.

    Returns (url, t, v, n_in) — ``t`` epoch seconds (long), one row
    per archived point; series with <= 2 points pass through whole.
    """
    if not tolerance >= 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    t_expr = _as_seconds(F.col(ts_col),
                         series_df.schema[ts_col].dataType,
                         f"ts_col {ts_col!r}").cast("long")
    obs = (series_df.where(F.col(value_col).isNotNull())
           .select("url", t_expr.alias("_t"),
                   F.col(value_col).cast("double").alias("_v"))
           .groupBy("url")
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col("_t").cast("double").alias("t"),
               F.col("_v").alias("v")))).alias("_s")))
    e = f"CAST({float(tolerance)!r} AS DOUBLE)"
    return (obs.withColumn("_n", F.size("_s"))
            .select("url", F.col("_n").cast("long").alias("n_in"),
                    F.explode(F.expr(_SDT_FOLD.format(e=e)))
                    .alias("_p"))
            .select("url",
                    F.col("_p.t").cast("long").alias("t"),
                    F.col("_p.v").alias("v"),
                    "n_in"))


def lttb_downsample(series_df: DataFrame, n_out: int,
                    value_col: str = "value",
                    ts_col: str = "warc_ts") -> DataFrame:
    """Downsample each url's series to at most ``n_out`` points.

    Returns (url, t, v, n_in) rows — ``t`` is epoch seconds (long),
    one row per kept point in time order, ``n_in`` the pre-downsample
    non-null point count. Series with ``n_in <= n_out`` pass through
    whole.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    t_expr = _as_seconds(F.col(ts_col),
                         series_df.schema[ts_col].dataType,
                         f"ts_col {ts_col!r}").cast("long")
    m = int(n_out) - 2
    obs = (series_df.where(F.col(value_col).isNotNull())
           .select("url", t_expr.alias("_t"),
                   F.col(value_col).cast("double").alias("_v"))
           .groupBy("url")
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col("_t").cast("double").alias("t"),
               F.col("_v").alias("v")))).alias("_s")))
    fmt = dict(m=m, n_out=int(n_out))
    return (obs.withColumn("_n", F.size("_s"))
            .withColumn("_avgs", F.expr(_AVGS.format(**fmt)))
            .withColumn("_elems", F.expr(_ELEMS.format(**fmt)))
            .select("url", F.col("_n").cast("long").alias("n_in"),
                    F.explode(F.expr(_FOLD.format(**fmt))).alias("_p"))
            .select("url",
                    F.col("_p.t").cast("long").alias("t"),
                    F.col("_p.v").alias("v"),
                    "n_in"))


def m4_downsample(series_df: DataFrame, bucket_sec: int,
                  value_col: str = "value",
                  ts_col: str = "warc_ts") -> DataFrame:
    """M4 downsampling per url: for each ``bucket_sec`` time bucket
    keep the first, last, min and max points (Jugel et al., VLDB 2014
    "M4: A Visualization-Oriented Time Series Data Aggregation") — the
    width-parameterised member of the downsample family that is
    PIXEL-PERFECT for line rendering at one bucket per x-column.

    Unlike the LTTB / swinging-door folds (which buffer one url's
    series in an aggregation buffer), M4 is a plain partial-aggregable
    groupBy: one Exchange on (url, bucket), map-side combine, no
    per-key array, no window — the shape that survives any key
    cardinality at 100 TB. Extremes are selected as lexicographic
    struct min/max so ties are deterministic in both engines:
    first/last = min/max of (t, v), vmin/vmax = min/max of (v, t).

    Returns (url, bucket, t, v, n_in): up to four distinct points per
    bucket in time order, ``n_in`` the bucket's non-null input count.
    """
    if bucket_sec <= 0:
        raise ValueError(f"bucket_sec must be > 0, got {bucket_sec}")
    t_expr = _as_seconds(F.col(ts_col),
                         series_df.schema[ts_col].dataType,
                         f"ts_col {ts_col!r}").cast("long")
    w = int(bucket_sec)
    obs = (series_df.where(F.col(value_col).isNotNull())
           .select("url", t_expr.alias("_t"),
                   F.col(value_col).cast("double").alias("_v")))
    agg = (obs.groupBy("url", F.expr(f"_t DIV {w}").alias("bucket"))
           .agg(F.min(F.struct("_t", "_v")).alias("_first"),
                F.max(F.struct("_t", "_v")).alias("_last"),
                F.min(F.struct("_v", "_t")).alias("_vmin"),
                F.max(F.struct("_v", "_t")).alias("_vmax"),
                F.count(F.lit(1)).alias("n_in")))
    pts = F.sort_array(F.array_distinct(F.array(
        F.struct(F.col("_first._t").alias("t"),
                 F.col("_first._v").alias("v")),
        F.struct(F.col("_vmin._t").alias("t"),
                 F.col("_vmin._v").alias("v")),
        F.struct(F.col("_vmax._t").alias("t"),
                 F.col("_vmax._v").alias("v")),
        F.struct(F.col("_last._t").alias("t"),
                 F.col("_last._v").alias("v")))))
    return (agg.select("url", "bucket", "n_in",
                       F.explode(pts).alias("_p"))
            .select("url", "bucket",
                    F.col("_p.t").alias("t"), F.col("_p.v").alias("v"),
                    "n_in"))
