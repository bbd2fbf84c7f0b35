"""Derived per-pixel radar geometry as pure column algebra.

Graft of /root/reference/pyrate/core/geometry.py:123-216
(``calc_pixel_geometry``), geometry.py:70-121 (``get_sat_positions``),
geometry.py:218-268 (``calc_local_baseline``) and geometry.py:270-345
(``vincinv``): instead of taking incidence / look angle / bperp as
INPUT columns, derive them from the S10 lookup-table grid (range ``rg``
and azimuth ``az`` image coordinates per cell) plus a handful of scalar
acquisition constants — the reference reads the same constants from the
interferogram metadata (semi-major/minor axis, satellite-to-earth-centre
distance, near range, range pixel spacing, heading, look direction;
geometry.py:139-152).

Everything here is JVM column algebra (sin/cos/tan/asin/acos/atan2 on
columns — no Python in the hot path), so it whole-stage-codegens and is
SQL-replayable. Vincenty's inverse (an until-convergence loop in the
reference, tol 1e-12 / max 1000 iterations, geometry.py:311-335) is
unrolled to a FIXED iteration count: at radar look-vector separations
(well under a degree of arc) the lambda iteration converges far below
1e-12 within 4 rounds, so ``vincenty_iters=6`` is bit-stable, and a
fixed count is what makes the operator deterministic, codegen-friendly,
and exactly replayable by the DuckDB oracle (same count both sides).
Each iteration's intermediates are materialised as named columns so
Catalyst's CollapseProject never inlines a multi-referenced trig
subtree exponentially.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class GeometryConstants:
    """Acquisition constants (geometry.py:139-152 reads these from ifg
    metadata; here they are explicit engine configuration). Defaults
    are a Sentinel-1-shaped orbit over the WGS84 ellipsoid."""
    a: float = 6378137.0            # semi-major axis (m)
    b: float = 6356752.3141         # semi-minor axis (m)
    se: float = 7071000.0           # satellite to earth centre (m)
    near_range: float = 830000.0    # near range (m)
    rps: float = 900.0              # range pixel spacing (m)
    heading_deg: float = -12.5      # satellite heading (deg)
    look_dir_deg: float = 90.0      # look direction vs heading (deg)
    # local-baseline constants (geometry.py:218-243)
    prf: float = 1750.0             # pulse repetition frequency (Hz)
    az_looks: int = 4               # azimuth looks
    az_n: int = 1000                # azimuth image length (lines)
    base_c: float = 120.0           # baseline across-track (m)
    base_n: float = -40.0           # baseline normal (m)
    baserate_c: float = 0.2         # baseline rate across-track (m/s)
    baserate_n: float = -0.05       # baseline rate normal (m/s)


def earth_radius(lat_rad: Column, a: float, b: float) -> Column:
    """Ellipsoid radius at latitude (geometry.py:157-159)."""
    cl, sl = F.cos(lat_rad), F.sin(lat_rad)
    return F.sqrt(
        ((a * a * cl) * (a * a * cl) + (b * b * sl) * (b * b * sl))
        / ((a * cl) * (a * cl) + (b * sl) * (b * sl)))


def _vincinv_columns(df: DataFrame, lat1: str, lon1: str, lat2: str,
                     lon2: str, a: float, b: float,
                     iters: int) -> DataFrame:
    """Vincenty's inverse formula (geometry.py:270-345, itself from
    GeodePy's public ``vincinv``) as a fixed-count unrolled column
    recurrence. Appends ``azimuth_angle`` (radians in [0, 2*pi), rounded
    to 9 dp exactly as geometry.py:345 does)."""
    f = (a - b) / a
    df = (df
          .withColumn("_u1", F.atan((1 - f) * F.tan(F.col(lat1))))
          .withColumn("_u2", F.atan((1 - f) * F.tan(F.col(lat2))))
          .withColumn("_omega", F.col(lon2) - F.col(lon1))
          .withColumn("_lam", F.col("_omega")))
    for _ in range(iters):
        # Eq. 74-80, GDA2020 Tech Manual v1.0 (the reference's own
        # equation numbering) — one lambda update per round
        df = (df
              .withColumn("_ss", F.sqrt(
                  F.pow(F.cos("_u2") * F.sin("_lam"), 2)
                  + F.pow(F.cos("_u1") * F.sin("_u2")
                          - F.sin("_u1") * F.cos("_u2") * F.cos("_lam"),
                          2)))
              .withColumn("_cs", F.sin("_u1") * F.sin("_u2")
                          + F.cos("_u1") * F.cos("_u2") * F.cos("_lam"))
              .withColumn("_sig", F.atan2(F.col("_ss"), F.col("_cs")))
              .withColumn("_al", F.asin(
                  F.cos("_u1") * F.cos("_u2") * F.sin("_lam")
                  / F.col("_ss")))
              .withColumn("_c2sm", F.cos("_sig")
                          - 2 * F.sin("_u1") * F.sin("_u2")
                          / F.pow(F.cos("_al"), 2))
              .withColumn("_cc", (f / 16) * F.pow(F.cos("_al"), 2)
                          * (4 + f * (4 - 3 * F.pow(F.cos("_al"), 2))))
              .withColumn("_lam", F.col("_omega")
                          + (1 - F.col("_cc")) * f * F.sin("_al")
                          * (F.col("_sig") + F.col("_cc") * F.sin("_sig")
                             * (F.col("_c2sm")
                                + F.col("_cc") * F.cos("_sig")
                                * (-1 + 2 * F.pow(F.col("_c2sm"), 2))))))
    azi = F.atan2(
        F.cos("_u2") * F.sin("_lam"),
        F.cos("_u1") * F.sin("_u2")
        - F.sin("_u1") * F.cos("_u2") * F.cos("_lam"))
    azi = F.when(azi < 0, azi + 2 * math.pi).otherwise(azi)
    return (df.withColumn("azimuth_angle", F.round(azi, 9))
            .drop("_u1", "_u2", "_omega", "_lam", "_ss", "_cs", "_sig",
                  "_al", "_c2sm", "_cc"))


def pixel_geometry(df: DataFrame, const: GeometryConstants = GeometryConstants(),
                   rg_col: str = "rg", lon_col: str = "lon_deg",
                   lat_col: str = "lat_deg", height_col: str = "dem_height",
                   vincenty_iters: int = 6) -> DataFrame:
    """calc_pixel_geometry (geometry.py:123-216) as column algebra.

    Input: one row per grid cell with a range coordinate, lon/lat in
    decimal degrees, and a height. Appends (all radians / metres):

    - ``range_dist``    — near_range + rps * rg (geometry.py:162)
    - ``look_angle``    — law of cosines in the satellite / earth-centre
                          / pixel triangle (geometry.py:165)
    - ``incidence_angle`` — same triangle with the height-corrected
                          radius (geometry.py:169-174)
    - ``sat_lat`` / ``sat_lon`` — satellite ground position
                          (get_sat_positions, geometry.py:110-121,
                          Eqs. 103-104 of DOT-VNTSC-FAA-16-12)
    - ``azimuth_angle`` — Vincenty inverse azimuth pixel->satellite
                          (geometry.py:183, :270-345)
    """
    c = const
    # explicit x * (pi/180) — np.radians' exact arithmetic
    # (geometry.py:153-156) and what the DuckDB oracle replays;
    # builtin RADIANS() implementations differ across engines at ulp
    # scale, an avoidable divergence source
    deg2rad = math.pi / 180.0
    lat = F.col(lat_col) * deg2rad
    lon = F.col(lon_col) * deg2rad
    heading = math.radians(c.heading_deg)
    look_dir = math.radians(c.look_dir_deg)
    sat_azi = heading + look_dir

    df = (df
          .withColumn("_lat", lat)
          .withColumn("_lon", lon)
          .withColumn("_re", earth_radius(F.col("_lat"), c.a, c.b))
          .withColumn("range_dist",
                      F.lit(c.near_range) + F.lit(c.rps) * F.col(rg_col))
          .withColumn("look_angle", F.acos(
              (c.se * c.se + F.col("range_dist") * F.col("range_dist")
               - F.col("_re") * F.col("_re"))
              / (2 * c.se * F.col("range_dist"))))
          # height-corrected radius for the incidence angle
          # (geometry.py:169: re = re + dem_height)
          .withColumn("_reh", F.col("_re") + F.col(height_col))
          .withColumn("incidence_angle", math.pi - F.acos(
              (F.col("range_dist") * F.col("range_dist")
               + F.col("_reh") * F.col("_reh") - c.se * c.se)
              / (2 * F.col("range_dist") * F.col("_reh")))))

    # get_sat_positions (geometry.py:110-121): epsilon is the angle at
    # the earth's centre; pi - look - (pi - inc) == inc - look
    eps = F.col("incidence_angle") - F.col("look_angle")
    df = (df
          .withColumn("_eps", eps)
          .withColumn("sat_lon",
                      F.asin(-(F.sin("_eps") * math.sin(sat_azi)))
                      / F.cos("_lat") + F.col("_lon"))
          .withColumn("_tmp",
                      F.cos(sat_azi / 2
                            + (F.col("sat_lon") - F.col("_lon")) / 2)
                      / F.cos(sat_azi / 2
                              - (F.col("sat_lon") - F.col("_lon")) / 2)
                      * F.tan((math.pi / 2 + F.col("_lat")
                               - F.col("_eps")) / 2))
          .withColumn("sat_lat",
                      -math.pi / 2 + 2 * F.atan(F.col("_tmp"))))

    df = _vincinv_columns(df, "_lat", "_lon", "sat_lat", "sat_lon",
                          c.a, c.b, vincenty_iters)
    return df.drop("_re", "_reh", "_eps", "_tmp", "_lat", "_lon")


def local_baseline(df: DataFrame, const: GeometryConstants = GeometryConstants(),
                   az_col: str = "az",
                   look_col: str = "look_angle") -> DataFrame:
    """calc_local_baseline (geometry.py:218-243): per-cell perpendicular
    baseline from the azimuth coordinate and the DERIVED look angle —
    bperp = C_local * cos(look) - N_local * sin(look) (Eq. 3.5, Baehr
    2012), with the C/N components linear in azimuth-line time."""
    c = const
    mean_az = c.az_n / 2 - 0.5
    prf = c.prf / c.az_looks
    base_c_local = c.base_c + c.baserate_c * (F.col(az_col) - mean_az) / prf
    base_n_local = c.base_n + c.baserate_n * (F.col(az_col) - mean_az) / prf
    return df.withColumn(
        "bperp",
        base_c_local * F.cos(F.col(look_col))
        - base_n_local * F.sin(F.col(look_col)))
