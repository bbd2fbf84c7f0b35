"""Derived pixel geometry vs a direct numpy replica of the reference
formulas (/root/reference/pyrate/core/geometry.py:70-345): earth
radius, range distance, look/incidence angles, satellite position
(Eqs. 103-104) and the Vincenty inverse azimuth — the numpy replica
iterates Vincenty TO CONVERGENCE (tol 1e-12, as geometry.py:311-335
does) while the column-algebra operator unrolls a fixed 6 rounds, so
agreement to the reference's own 9-dp rounding proves the fixed count
suffices."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from pyrate_spark.operators.geometry import (GeometryConstants,
                                             local_baseline,
                                             pixel_geometry)

C = GeometryConstants()


def np_geometry(rg, lon_deg, lat_deg, h):
    """Reference math, scalar numpy (geometry.py:123-216)."""
    lat, lon = math.radians(lat_deg), math.radians(lon_deg)
    a, b, se = C.a, C.b, C.se
    re = math.sqrt(((a * a * math.cos(lat)) ** 2
                    + (b * b * math.sin(lat)) ** 2)
                   / ((a * math.cos(lat)) ** 2
                      + (b * math.sin(lat)) ** 2))
    rd = C.near_range + C.rps * rg
    look = math.acos((se * se + rd * rd - re * re) / (2 * se * rd))
    reh = re + h
    inc = math.pi - math.acos(
        (rd * rd + reh * reh - se * se) / (2 * rd * reh))
    eps = inc - look                       # pi - look - (pi - inc)
    sat_azi = math.radians(C.heading_deg) + math.radians(C.look_dir_deg)
    sat_lon = math.asin(-(math.sin(eps) * math.sin(sat_azi))) \
        / math.cos(lat) + lon
    temp = (math.cos(0.5 * (sat_azi + sat_lon - lon))
            / math.cos(0.5 * (sat_azi - sat_lon + lon))
            * math.tan(0.5 * (math.pi / 2 + lat - eps)))
    sat_lat = -math.pi / 2 + 2 * math.atan(temp)
    azi = np_vincinv(lat, lon, sat_lat, sat_lon, a, b)
    return look, inc, azi, rd


def np_vincinv(lat1, lon1, lat2, lon2, semimaj, semimin):
    """geometry.py:270-345: iterate until |d_lambda| < 1e-12."""
    f = (semimaj - semimin) / semimaj
    u1 = math.atan((1 - f) * math.tan(lat1))
    u2 = math.atan((1 - f) * math.tan(lat2))
    omega = lon = lon2 - lon1
    for _ in range(1000):
        sin_sigma = math.sqrt(
            (math.cos(u2) * math.sin(lon)) ** 2
            + (math.cos(u1) * math.sin(u2)
               - math.sin(u1) * math.cos(u2) * math.cos(lon)) ** 2)
        cos_sigma = (math.sin(u1) * math.sin(u2)
                     + math.cos(u1) * math.cos(u2) * math.cos(lon))
        sigma = math.atan2(sin_sigma, cos_sigma)
        alpha = math.asin(math.cos(u1) * math.cos(u2) * math.sin(lon)
                          / sin_sigma)
        c2sm = math.cos(sigma) - (2 * math.sin(u1) * math.sin(u2)
                                  / math.cos(alpha) ** 2)
        c = (f / 16) * math.cos(alpha) ** 2 \
            * (4 + f * (4 - 3 * math.cos(alpha) ** 2))
        new_lon = omega + (1 - c) * f * math.sin(alpha) * (
            sigma + c * math.sin(sigma)
            * (c2sm + c * math.cos(sigma) * (-1 + 2 * c2sm ** 2)))
        delta, lon = new_lon - lon, new_lon
        if abs(delta) < 1e-12:
            break
    azi = math.atan2(
        math.cos(u2) * math.sin(lon),
        math.cos(u1) * math.sin(u2)
        - math.sin(u1) * math.cos(u2) * math.cos(lon))
    if azi < 0:
        azi += 2 * math.pi
    return round(azi, 9)


CASES = [(10.0, 110.00, -30.00, 120.0),
         (45.0, 110.35, -30.45, 840.0),
         (90.0, 112.00, -32.00, 10.0),
         (1.0, 111.10, -31.20, 2300.0)]


@pytest.fixture(scope="module")
def geom(spark):
    rows = [Row(cell=i, rg=rg, az=7.0 * i + 3.0, lon_deg=lo,
                lat_deg=la, dem_height=h)
            for i, (rg, lo, la, h) in enumerate(CASES)]
    out = local_baseline(pixel_geometry(spark.createDataFrame(rows)))
    return {r["cell"]: r for r in out.collect()}


def test_pixel_geometry_matches_reference_formulas(geom):
    for i, (rg, lo, la, h) in enumerate(CASES):
        look, inc, azi, rd = np_geometry(rg, lo, la, h)
        r = geom[i]
        assert r["range_dist"] == pytest.approx(rd, abs=1e-6)
        assert r["look_angle"] == pytest.approx(look, abs=1e-12)
        assert r["incidence_angle"] == pytest.approx(inc, abs=1e-12)
        # both sides round to 9 dp (geometry.py:345)
        assert r["azimuth_angle"] == pytest.approx(azi, abs=1e-9)


def test_angles_physical(geom):
    for r in geom.values():
        assert 0 < r["look_angle"] < r["incidence_angle"] < math.pi / 2
        assert 0 <= r["azimuth_angle"] < 2 * math.pi


def test_local_baseline_matches_reference_formula(geom):
    prf = C.prf / C.az_looks
    mean_az = C.az_n / 2 - 0.5
    for i in range(len(CASES)):
        r = geom[i]
        az = 7.0 * i + 3.0
        bc = C.base_c + C.baserate_c * (az - mean_az) / prf
        bn = C.base_n + C.baserate_n * (az - mean_az) / prf
        exp = bc * math.cos(r["look_angle"]) - bn * math.sin(r["look_angle"])
        assert r["bperp"] == pytest.approx(exp, rel=1e-12)
