"""PromQL/TimescaleDB derived metrics: time-weighted average,
regression slope (deriv), irate, histogram_quantile."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.metrics import (histogram_quantile, irate,
                                            regression_slope,
                                            time_weighted_avg)

BASE = dt.datetime(2024, 1, 1)
B0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
assert B0 % 3600 == 0
DDL = "url string, warc_ts timestamp, value double"


def _rows(spec):
    return [(u, BASE + dt.timedelta(seconds=s),
             float(v) if v is not None else None) for u, s, v in spec]


# ---------------------------------------------------------------- twa

def test_twa_locf_boundary_split_and_coverage(spark):
    # one url, hour buckets: 10 held from 1800 ACROSS the boundary to
    # 5400 (1800 s in each hour), then 30 held [5400, 6300); the last
    # sample opens no segment
    rows = _rows([("a", 1800, 10.0), ("a", 3600 + 1800, 30.0),
                  ("a", 3600 + 2700, 50.0)])
    got = {r["bucket_start"]: (r["value_twa"], r["covered_sec"])
           for r in time_weighted_avg(
               spark.createDataFrame(rows, DDL), 3600).collect()}
    assert got[B0] == (10.0, 1800)
    exp_h1 = (10.0 * 1800 + 30.0 * 900) / 2700
    assert got[B0 + 3600] == (pytest.approx(exp_h1), 2700)
    assert len(got) == 2


def test_twa_linear_matches_trapezoid(spark):
    # linear 0 -> 100 over [0, 1000): integral = 50*1000
    rows = _rows([("a", 0, 0.0), ("a", 1000, 100.0)])
    out = time_weighted_avg(spark.createDataFrame(rows, DDL),
                            3600, method="linear").collect()
    assert len(out) == 1
    assert out[0]["value_twa"] == pytest.approx(50.0)  # trapezoid mean
    assert out[0]["covered_sec"] == 1000


def test_twa_max_gap_caps_hold_and_explode(spark):
    # 100 held over a 10-day gap, capped at 2 hours
    rows = _rows([("a", 0, 100.0), ("a", 864000, 1.0),
                  ("a", 864000 + 10, 2.0)])
    out = time_weighted_avg(spark.createDataFrame(rows, DDL), 3600,
                            max_gap_sec=7200).collect()
    per = {r["bucket_start"]: r for r in out}
    assert set(per) == {B0, B0 + 3600, B0 + 864000}     # not 240 gap buckets
    assert per[B0]["value_twa"] == 100.0
    assert per[B0 + 3600]["covered_sec"] == 3600


def test_twa_nulls_bridged_and_validation(spark):
    rows = _rows([("a", 0, 10.0), ("a", 100, None), ("a", 200, 20.0),
                  ("a", 300, 20.0)])
    out = time_weighted_avg(spark.createDataFrame(rows, DDL),
                            3600).collect()
    # NULL row skipped: 10 held [0,200), 20 held [200,300)
    assert out[0]["value_twa"] == pytest.approx((10 * 200 + 20 * 100)
                                                / 300)
    with pytest.raises(ValueError):
        time_weighted_avg(spark.createDataFrame(rows, DDL), 3600,
                          method="nearest")
    with pytest.raises(ValueError):
        time_weighted_avg(spark.createDataFrame(rows, DDL), 0)


def test_twa_matches_numpy_reference(spark, events_small):
    got = (time_weighted_avg(events_small, 3600)
           .orderBy("url", "bucket_start").toPandas())
    pdf = (events_small.select(
        "url", F.unix_timestamp("warc_ts").alias("t"), "value")
        .toPandas().dropna().sort_values(["url", "t"]))
    for (u, k), grp in got.groupby(["url", "bucket_start"]):
        g = pdf[pdf["url"] == u]
        t = g["t"].to_numpy()
        v = g["value"].to_numpy()
        num = den = 0.0
        for i in range(len(t) - 1):
            a, b = max(t[i], k), min(t[i + 1], k + 3600)
            if b > a:
                num += v[i] * (b - a)
                den += b - a
        assert den == grp["covered_sec"].iloc[0]
        assert grp["value_twa"].iloc[0] == pytest.approx(num / den,
                                                         rel=1e-9)


# ------------------------------------------------------------ heartbeat

def test_heartbeat_uptime_union_and_edges(spark):
    from pyrate_spark.operators.metrics import heartbeat_uptime
    # H = 600 s: samples at 0 and 300 overlap (no double count),
    # sample at 3500 straddles the hour boundary, last sample extends
    rows = _rows([("a", 0, 1.0), ("a", 300, 1.0), ("a", 3500, 1.0)])
    got = {r["bucket_start"] - B0: (r["uptime_sec"], r["uptime_frac"])
           for r in heartbeat_uptime(
               spark.createDataFrame(rows, DDL), 3600, 600).collect()}
    # [0,300)+[300,900) = 900, then [3500,3600) = 100 -> 1000 in h0
    assert got[0] == (1000, 1000 / 3600)
    # last sample spills [3600, 4100) into h1
    assert got[3600] == (500, 500 / 3600)
    with pytest.raises(ValueError):
        heartbeat_uptime(spark.createDataFrame(rows, DDL), 3600, 0)


def test_heartbeat_uptime_full_coverage(spark):
    from pyrate_spark.operators.metrics import heartbeat_uptime
    rows = _rows([("a", s, 1.0) for s in range(0, 7200, 60)])
    got = {r["bucket_start"] - B0: r["uptime_frac"]
           for r in heartbeat_uptime(
               spark.createDataFrame(rows, DDL), 3600, 120).collect()}
    assert got[0] == 1.0
    # h1's last sample (7140) extends 120 s -> 3660 of cover, clipped
    assert got[3600] == 1.0
    assert got[7200] == pytest.approx(60 / 3600)


def test_gap_detect_complements_uptime(spark):
    from pyrate_spark.operators.metrics import gap_detect, \
        heartbeat_uptime
    rows = _rows([("a", 0, 1.0), ("a", 300, 1.0), ("a", 5000, 1.0),
                  ("a", 5100, 1.0), ("b", 0, 1.0)])
    gaps = gap_detect(spark.createDataFrame(rows, DDL), 600).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert (g["gap_start"] - B0, g["gap_end"] - B0, g["gap_sec"]) \
        == (900, 5000, 4100)
    # complement over the observed span [first, last]: uptime + gaps
    # cover it exactly (last sample's H extends past the span)
    up = heartbeat_uptime(spark.createDataFrame(rows, DDL),
                          10 ** 6, 600).collect()
    a_up = sum(r["uptime_sec"] for r in up if r["url"] == "a")
    span = 5100 + 600                  # last sample extends H
    assert a_up + g["gap_sec"] == span
    with pytest.raises(ValueError):
        gap_detect(spark.createDataFrame(rows, DDL), 0)


# ---------------------------------------------------------------- deriv

def test_regression_slope_exact_line_and_guards(spark):
    rows = _rows([("a", s, 5.0 + 0.25 * s) for s in (0, 60, 120, 300)]
                 + [("b", 10, 7.0)]                    # n < 2 -> NULL
                 + [("c", 50, 1.0), ("c", 50, 9.0)])   # det == 0 -> NULL
    out = {r["url"]: r for r in regression_slope(
        spark.createDataFrame(rows, DDL), 3600).collect()}
    assert out["a"]["slope_per_sec"] == pytest.approx(0.25, rel=1e-12)
    assert out["a"]["n_samples"] == 4
    assert out["b"]["slope_per_sec"] is None
    assert out["c"]["slope_per_sec"] is None


def test_regression_slope_matches_polyfit(spark, events_small):
    got = (regression_slope(events_small, 3600)
           .orderBy("url", "bucket_start").toPandas())
    pdf = (events_small.select(
        "url", F.unix_timestamp("warc_ts").alias("t"), "value")
        .toPandas().dropna())
    pdf["k"] = (pdf["t"] // 3600) * 3600
    for (u, k), g in pdf.groupby(["url", "k"]):
        row = got[(got["url"] == u) & (got["bucket_start"] == k)]
        x = (g["t"] - k).to_numpy(dtype=float)
        if len(x) < 2 or np.ptp(x) == 0:
            assert row["slope_per_sec"].isna().all()
            continue
        want = np.polyfit(x, g["value"].to_numpy(dtype=float), 1)[0]
        assert row["slope_per_sec"].iloc[0] == pytest.approx(want,
                                                             rel=1e-6)


# ---------------------------------------------------------------- irate

def test_irate_last_two_and_reset(spark):
    rows = _rows([("a", 0, 1.0), ("a", 100, 5.0), ("a", 400, 11.0),
                  ("b", 0, 10.0), ("b", 200, 4.0),   # reset
                  ("c", 7, 3.0)])                    # n < 2
    out = {r["url"]: r for r in irate(
        spark.createDataFrame(rows, DDL), 3600).collect()}
    assert out["a"]["irate_per_sec"] == pytest.approx(6.0 / 300)
    assert out["a"]["n_samples"] == 3
    assert out["b"]["irate_per_sec"] == pytest.approx(4.0 / 200)
    assert out["c"]["irate_per_sec"] is None
    gauge = {r["url"]: r for r in irate(
        spark.createDataFrame(rows, DDL), 3600, counter=False).collect()}
    assert gauge["b"]["irate_per_sec"] == pytest.approx(-6.0 / 200)


# ---------------------------------------------- histogram_quantile

HDDL = "url string, bucket_start long, le double, cum_count long"


def test_histogram_quantile_interpolation_and_edges(spark):
    inf = float("inf")
    rows = [("a", 0, 0.1, 10), ("a", 0, 0.5, 30), ("a", 0, 1.0, 40),
            ("a", 0, inf, 40),
            ("b", 0, 0.1, 0), ("b", 0, inf, 5),     # rank in +Inf
            ("c", 0, 0.1, 0), ("c", 0, inf, 0)]     # empty
    df = spark.createDataFrame(rows, HDDL)
    q50 = {r["url"]: r["q50"] for r in
           histogram_quantile(df, 0.5).collect()}
    # rank 20 in (0.1, 0.5]: 0.1 + 0.4 * (20-10)/20
    assert q50["a"] == pytest.approx(0.3)
    assert q50["b"] == pytest.approx(0.1)   # highest finite le
    assert q50["c"] is None
    q99 = {r["url"]: r["q99"] for r in
           histogram_quantile(df, 0.99).collect()}
    # rank 39.6 in (0.5, 1.0]: 0.5 + 0.5 * 9.6/10
    assert q99["a"] == pytest.approx(0.98)
    with pytest.raises(ValueError):
        histogram_quantile(df, 1.5)


def test_histogram_quantile_q0_first_bucket(spark):
    inf = float("inf")
    df = spark.createDataFrame(
        [("a", 0, 1.0, 4), ("a", 0, inf, 4)], HDDL)
    out = histogram_quantile(df, 0.0).collect()[0]
    # rank 0 hits the first bucket; span 4 -> interpolates to 0.0
    assert out["q00"] == pytest.approx(0.0)
    assert out["total_count"] == 4


@pytest.fixture(scope="module")
def events_small(spark):
    from pyrate_spark.datagen import generate_pages
    from pyrate_spark.operators.extract import extract_series
    return extract_series(generate_pages(
        spark, n_urls=25, epochs_per_url=40, step_hours=1,
        null_pct=15, seed=11)).persist()
