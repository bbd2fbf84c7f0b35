"""Reference-pixel grid search (A5) and LOS projection / cell-size
transforms (P7/P8) — the remaining per-column correction utilities.

The reference's ref_pixel (refpixel.py:136-316) grid-searches candidate
pixels, computing for each candidate the per-interferogram standard
deviation of a surrounding patch (population std over valid cells,
gated by a min-valid-cell threshold that EVERY layer must pass,
_ref_pixel_multi refpixel.py:296-316) and ranks candidates by the mean
of those stds (find_min_mean refpixel.py:180-196, nanargmin + first-
index tie-break). The web graft's patch is the url cohort (e.g. same
host) and the layers are time buckets: the best cohort is the one
whose members move together most quietly — the same stability
criterion, same gates, same argmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyrate_spark.config import EngineConfig, DEFAULT


def refpixel_grid_search(series: DataFrame, cohort_expr=None,
                         bucket: str = "1 day",
                         min_valid: int = 2) -> DataFrame:
    """A5: per-(cohort, layer) population std over valid values; a
    candidate is eligible only when EVERY layer in the dataset has
    > min_valid valid obs (refpixel.py:312-316 `all(valid)` over the
    thresh gate); score = mean of the per-layer stds; winner = global
    argmin with ascending-cohort tie-break (refpixel.py:180-196).

    Pure column algebra: two aggregations + one broadcast of the
    layer-count scalar; no UDF, no per-key work."""
    if cohort_expr is None:
        cohort_expr = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    win = F.window("warc_ts", bucket)
    src = (series.withColumn("_cohort", cohort_expr)
           .withColumn("_layer", win["start"]))
    n_layers = (src.select("_layer").distinct()
                .agg(F.count(F.lit(1)).alias("_n_layers")))
    per = (src.groupBy("_cohort", "_layer")
           .agg(F.stddev_pop("value").alias("_sd"),
                F.count("value").alias("_nv")))
    cand = (per.groupBy("_cohort")
            .agg(F.count(F.lit(1)).alias("n_present"),
                 F.min((F.col("_nv") > min_valid).cast("int")).alias("_ok"),
                 F.avg("_sd").alias("mean_sd")))
    return (cand.crossJoin(F.broadcast(n_layers))
            .where((F.col("_ok") == 1)
                   & (F.col("n_present") == F.col("_n_layers")))
            .select(F.col("_cohort").alias("cohort"), "mean_sd",
                    F.col("_n_layers").alias("n_layers"))
            .orderBy(F.asc_nulls_last("mean_sd"), F.asc("cohort"))
            .limit(1))


def los_project(series: DataFrame, incidence_col: str,
                to: str = "vertical", value_col: str = "value") -> DataFrame:
    """P7 (shared.py LOS conversion used by merge.py:282-287): project
    the line-of-sight value into vertical (divide by cos i) or
    pseudo-horizontal (divide by sin i) given a per-row incidence angle
    in radians. Pure column expression."""
    i = F.col(incidence_col)
    denom = F.cos(i) if to == "vertical" else F.sin(i)
    return series.withColumn(value_col, F.col(value_col) / denom)


def cell_size_metres(df: DataFrame, lat_col: str, xstep_deg: float,
                     ystep_deg: float):
    """P8 (shared.py:1201-1238 cell_size): convert angular cell size to
    metres at each row's latitude via the spherical approximation the
    reference uses (1 deg lat = 111111.111... m * scale by cos(lat) for
    x). Returns (df with x_size_m, y_size_m columns)."""
    m_per_deg = 111111.11111111111
    lat = F.radians(F.col(lat_col))
    return (df.withColumn("x_size_m",
                          F.lit(abs(xstep_deg) * m_per_deg) * F.cos(lat))
            .withColumn("y_size_m", F.lit(abs(ystep_deg) * m_per_deg)))
