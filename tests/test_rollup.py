"""Tier rollup (D1), cascade, NN-downsample (D3), retention (D2),
gap-fill (T17) and cumulative (A6) — semantics vs local pandas and the
reference's NaN-threshold rule (prepifg_helper.py:231-236)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.rollup import (tier_rollup, cascade_rollup,
                                           nn_downsample, retention_crop,
                                           gapfill_tier, cumulative)


@pytest.fixture(scope="module")
def series(spark):
    """Hand-built series: 2 urls, known buckets, NULLs placed to hit the
    threshold edge cases."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    # url a, hour bucket 0: values 1,2,3,NULL -> null_fraction 0.25
    for i, v in enumerate([1.0, 2.0, 3.0, None]):
        rows.append(("a", base + dt.timedelta(minutes=10 * i), v))
    # url a, hour bucket 1: NULL,NULL,4 -> null_fraction 2/3 >= 0.5 -> NULL
    for i, v in enumerate([None, None, 4.0]):
        rows.append(("a", base + dt.timedelta(hours=1, minutes=15 * i), v))
    # url b, day 2 bucket: all valid
    for i, v in enumerate([10.0, 20.0]):
        rows.append(("b", base + dt.timedelta(days=1, minutes=30 * i), v))
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, value double")


def test_tier_rollup_nan_threshold(series):
    out = tier_rollup(series, "1 hour", thresh=0.5).orderBy(
        "url", "bucket_start").toPandas()
    a0 = out.iloc[0]
    assert a0["value_avg"] == pytest.approx(2.0)       # avg skips NULL
    assert a0["null_fraction"] == pytest.approx(0.25)
    assert a0["n_obs"] == 4
    a1 = out.iloc[1]
    assert pd.isna(a1["value_avg"])                     # 2/3 >= 0.5
    assert a1["n_obs"] == 3
    b = out.iloc[2]
    assert b["value_avg"] == pytest.approx(15.0)


def test_thresh_zero_edge_case(series):
    """prepifg_helper.py:235: nan_fraction==0 and thresh==0 stays valid;
    any nan_fraction>0 at thresh=0 is NULL."""
    out = tier_rollup(series, "1 hour", thresh=0.0).orderBy(
        "url", "bucket_start").toPandas()
    assert pd.isna(out.iloc[0]["value_avg"])    # 0.25 >= 0
    assert out.iloc[2]["value_avg"] == pytest.approx(15.0)  # clean bucket


def test_thresh_validation(series):
    with pytest.raises(ValueError):
        tier_rollup(series, "1 hour", thresh=1.5)


def test_cascade_equals_direct(spark):
    """hour->day cascade must equal a direct day rollup of raw."""
    from pyrate_spark.datagen import generate_pages
    from pyrate_spark.operators.extract import extract_series
    pages = generate_pages(spark, n_urls=8, epochs_per_url=60,
                           null_pct=15, seed=7)
    s = extract_series(pages)
    hourly = tier_rollup(s, "1 hour", thresh=0.99)
    daily_cascade = cascade_rollup(hourly, "1 day", thresh=0.5)
    daily_direct = tier_rollup(s, "1 day", thresh=0.5)
    a = daily_cascade.orderBy("url", "bucket_start").toPandas()
    b = daily_direct.orderBy("url", "bucket_start").toPandas()
    assert len(a) == len(b)
    np.testing.assert_allclose(a["value_avg"].to_numpy(dtype=float),
                               b["value_avg"].to_numpy(dtype=float),
                               rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(a["null_fraction"].to_numpy(dtype=float),
                               b["null_fraction"].to_numpy(dtype=float),
                               rtol=1e-9)
    assert (a["n_obs"] == b["n_obs"]).all()


def test_nn_downsample(series):
    out = nn_downsample(series, "1 hour").orderBy(
        "url", "bucket_start").toPandas()
    # last sample of url a bucket 0 is NULL
    assert pd.isna(out.iloc[0]["value_last"])
    assert out.iloc[1]["value_last"] == pytest.approx(4.0)
    assert out.iloc[2]["value_last"] == pytest.approx(20.0)


def test_retention_crop_modes(series):
    lo = dt.datetime(2024, 1, 1, 1)
    assert retention_crop(series, 3, lo=lo).count() == 5
    # mode 1 intersection: url a spans day1, url b day2 -> empty overlap
    assert retention_crop(series, 1).count() == 0
    # mode 2 union: keeps everything
    assert retention_crop(series, 2).count() == series.count()


def test_gapfill_locf(spark):
    rows = [("a", dt.datetime(2024, 1, 1, h), float(h) if h != 2 else None,
             0.0, 1) for h in (0, 2, 5)]
    tier = spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double,"
              " null_fraction double, n_obs long")
    out = gapfill_tier(tier, "1 hour").orderBy("bucket_start").toPandas()
    assert len(out) == 6                      # full grid 0..5
    assert out["value_filled"].tolist() == [0.0, 0.0, 0.0, 0.0, 0.0, 5.0]


def test_cumulative(spark):
    rows = [("a", dt.datetime(2024, 1, 1, h), float(h + 1)) for h in range(4)]
    tier = spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double")
    out = cumulative(tier).orderBy("bucket_start").toPandas()
    assert out["value_cuml"].tolist() == [1.0, 3.0, 6.0, 10.0]


def test_tier_rollup_stats_exact_order_statistics(spark):
    """min/max/p50/p95 are exact element selections over the valid
    values; NULL-only buckets yield NULL stats but keep their counts."""
    import datetime as dt
    from pyrate_spark.operators.rollup import tier_rollup_stats
    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    rows = [("a", base + dt.timedelta(minutes=m), v)
            for m, v in [(0, 5.0), (5, 1.0), (10, 3.0), (15, None),
                         (20, 9.0), (25, 7.0)]]
    rows += [("b", base + dt.timedelta(minutes=m), None) for m in (0, 30)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double")
    out = {r["url"]: r for r in tier_rollup_stats(df, "1 hour").collect()}
    a = out["a"]
    # sorted valid = [1,3,5,7,9]; p50 -> ceil(2.5)=3rd -> 5; p95 ->
    # ceil(4.75)=5th -> 9
    assert (a["vmin"], a["vmax"], a["p50"], a["p95"]) == (1.0, 9.0, 5.0, 9.0)
    assert (a["n_valid"], a["n_obs"]) == (5, 6)
    b = out["b"]
    assert b["vmin"] is None and b["p50"] is None and b["p95"] is None
    assert (b["n_valid"], b["n_obs"]) == (0, 2)


def test_counter_rate_reset_detection(spark):
    from pyrate_spark.operators.rollup import counter_rate
    base = dt.datetime(2024, 1, 1)
    rows = [("u", base + dt.timedelta(hours=h), v, 0.0, 1)
            for h, v in [(0, 100.0), (1, 150.0), (2, 30.0),  # reset
                         (4, 90.0),                          # gap: dt=2h
                         (5, None), (6, 50.0)]]               # null gap
    tier = spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double, "
              "null_fraction double, n_obs long")
    got = {r["bucket_start"].hour: (r["delta"], r["rate_per_sec"])
           for r in counter_rate(tier).collect()}
    assert got[0] == (None, None)                 # no previous sample
    assert got[1] == (50.0, 50.0 / 3600)
    assert got[2] == (30.0, 30.0 / 3600)          # reset -> new value
    assert got[4] == (60.0, 60.0 / 7200)          # across the gap
    assert got[5] == (None, None)                 # null bucket
    assert got[6] == (None, None)                 # prev was null


def test_counter_rate_epoch_numeric_ts_and_dup_bucket(spark):
    """Epoch-seconds long ts columns must produce real rates (not the
    unix_timestamp-on-long NULL pitfall), and a duplicate bucket
    timestamp (dt == 0) yields NULL rate instead of a division blow-up
    while still emitting the delta."""
    from pyrate_spark.operators.rollup import counter_rate
    rows = [("u", 0, 100.0, 0.0, 1), ("u", 3600, 150.0, 0.0, 1),
            ("u", 3600, 160.0, 0.0, 1)]          # duplicate bucket
    tier = spark.createDataFrame(
        rows, "url string, bucket_start long, value_avg double, "
              "null_fraction double, n_obs long")
    got = [(r["delta"], r["rate_per_sec"])
           for r in counter_rate(tier).orderBy("bucket_start",
                                               "value_avg").collect()]
    assert got[0] == (None, None)
    assert got[1] == (50.0, 50.0 / 3600)
    assert got[2] == (10.0, None)                # dt == 0 -> NULL rate


def test_ewma_matches_pandas(spark, series):
    from pyrate_spark.operators.rollup import ewma_tier, tier_rollup
    tier = tier_rollup(series, "1 hour", thresh=0.99)
    got = (ewma_tier(tier, alpha=0.3)
           .orderBy("url", "bucket_start").toPandas())
    exp = (tier.where(F.col("value_avg").isNotNull())
           .orderBy("url", "bucket_start").toPandas())
    for url, g in got.groupby("url"):
        e = exp[exp["url"] == url]
        ref = e["value_avg"].ewm(alpha=0.3, adjust=False).mean()
        np.testing.assert_allclose(g["value_ewma"].to_numpy(),
                                   ref.to_numpy(), rtol=1e-12)
    # y_0 == x_0 (adjust=False recurrence seed)
    firsts = got.groupby("url").first()
    np.testing.assert_array_equal(firsts["value_ewma"],
                                  firsts["value_avg"])


def test_ewma_alpha_validated(spark, series):
    from pyrate_spark.operators.rollup import ewma_tier, tier_rollup
    with pytest.raises(ValueError):
        ewma_tier(tier_rollup(series, "1 hour"), alpha=0.0)


def test_sessionize_gap_semantics(spark):
    from pyrate_spark.operators.windows import sessionize
    base = dt.datetime(2024, 1, 1)
    rows = [("u", base + dt.timedelta(minutes=m), float(m))
            for m in [0, 10, 29, 70, 99, 130]]
    # chains: 0-10-29 (gaps<30), 70-99 (29min), 130 (31min after 99)
    got = (sessionize(spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double"),
        gap="30 minutes")
        .orderBy("session_start").collect())
    assert [r["n_events"] for r in got] == [3, 2, 1]
    assert got[0]["session_end"] == base + dt.timedelta(minutes=59)
    # an event at EXACTLY prev+gap JOINS the session (Spark merges
    # touching [start, last+gap] windows; the SQL oracle mirrors this)
    two = [("u", base, 1.0), ("u", base + dt.timedelta(minutes=30), 2.0)]
    got2 = sessionize(spark.createDataFrame(
        two, "url string, warc_ts timestamp, value double"),
        gap="30 minutes").collect()
    assert len(got2) == 1 and got2[0]["n_events"] == 2


def test_topk_per_bucket_ties_and_validation(spark):
    from pyrate_spark.operators.windows import topk_per_bucket
    base = dt.datetime(2024, 1, 1)
    rows = [("a", base, 5.0, 0.0, 1), ("b", base, 5.0, 0.0, 1),
            ("c", base, 7.0, 0.0, 1), ("d", base, None, 0.0, 1)]
    tier = spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double, "
              "null_fraction double, n_obs long")
    got = [(r["url"], r["rank"]) for r in
           topk_per_bucket(tier, k=2).orderBy("rank").collect()]
    assert got == [("c", 1), ("a", 2)]   # tie a/b -> url asc; null out
    with pytest.raises(ValueError):
        topk_per_bucket(tier, k=0)


def test_ohlc_rollup_endpoints_and_null_skip(spark):
    from pyrate_spark.operators.rollup import ohlc_rollup
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [("u", base + dt.timedelta(minutes=m), v) for m, v in
            [(0, None), (5, 3.0), (10, 9.0), (20, 1.0), (40, 4.0),
             (59, None)]] + \
           [("v", base, None)]          # all-null url -> no candle
    series = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double")
    got = ohlc_rollup(series, "1 hour").collect()
    assert len(got) == 1                # v's empty candle dropped
    r = got[0]
    # open/close are the first/last VALID values, not the null edges
    assert (r["open"], r["high"], r["low"], r["close"]) == (3.0, 9.0,
                                                            1.0, 4.0)
    assert r["open_ts"] == base + dt.timedelta(minutes=5)
    assert r["close_ts"] == base + dt.timedelta(minutes=40)
    assert r["n_valid"] == 4


def test_ohlc_cascade_equals_direct(spark):
    """Mergeability: hourly candles cascaded to daily are bit-equal to
    a direct daily candle of the raw series."""
    from pyrate_spark.datagen import generate_pages
    from pyrate_spark.operators.extract import extract_series
    from pyrate_spark.operators.rollup import ohlc_rollup, ohlc_cascade
    series = extract_series(generate_pages(
        spark, n_urls=15, epochs_per_url=30, step_hours=3,
        null_pct=15, seed=21))
    direct = ohlc_rollup(series, "1 day")
    cascaded = ohlc_cascade(ohlc_rollup(series, "1 hour"), "1 day")
    key = lambda r: (r["url"], r["bucket_start"])
    d = {key(r): r.asDict() for r in direct.collect()}
    c = {key(r): r.asDict() for r in cascaded.collect()}
    assert d == c and len(d) > 0


def test_histogram_rollup_bins_edges_and_null_skip(spark):
    from pyrate_spark.operators.rollup import histogram_rollup
    base = dt.datetime(2024, 1, 1, 10)
    # lo=0, hi=8, n_bins=4 -> width 2; bins: under,| [0,2) [2,4) [4,6) [6,8) |,over
    vals = [-1.0, 0.0, 1.9, 2.0, 7.9, 8.0, 100.0, None]
    rows = [("u", base + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    series = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double")
    got = histogram_rollup(series, "1 hour", lo=0.0, hi=8.0,
                           n_bins=4).collect()
    assert len(got) == 1
    r = got[0]
    assert r["counts"] == [1, 2, 1, 0, 1, 2]   # under,4 bins,over
    assert r["n_valid"] == 7                   # NULL skipped
    with pytest.raises(ValueError):
        histogram_rollup(series, "1 hour", lo=1.0, hi=1.0)


def test_histogram_cascade_equals_direct(spark):
    from pyrate_spark.datagen import generate_pages
    from pyrate_spark.operators.extract import extract_series
    from pyrate_spark.operators.rollup import (histogram_rollup,
                                               histogram_cascade)
    series = extract_series(generate_pages(
        spark, n_urls=12, epochs_per_url=30, step_hours=3,
        null_pct=10, seed=33))
    kw = dict(lo=-50.0, hi=50.0, n_bins=8)
    direct = histogram_rollup(series, "1 day", **kw)
    casc = histogram_cascade(histogram_rollup(series, "1 hour", **kw),
                             "1 day", n_bins=8)
    key = lambda r: (r["url"], r["bucket_start"])
    d = {key(r): (r["counts"], r["n_valid"]) for r in direct.collect()}
    c = {key(r): (r["counts"], r["n_valid"]) for r in casc.collect()}
    assert d == c and len(d) > 0


def test_histogram_quantile_est_vs_manual(spark):
    import math
    from pyrate_spark.operators.rollup import (histogram_rollup,
                                               histogram_quantile_est)
    base = dt.datetime(2024, 1, 1, 10)
    vals = [1.0, 3.0, 3.5, 5.0, 9.5, 9.9, 12.0]   # 12.0 overflows hi=10
    rows = [("u", base + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    series = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double")
    hist = histogram_rollup(series, "1 hour", lo=0.0, hi=10.0, n_bins=5)
    r = histogram_quantile_est(hist, 0.5, lo=0.0, hi=10.0,
                               n_bins=5).first()
    # in-range counts per width-2 bin: [1, 2, 1, 0, 2]; n_in=6,
    # rank=ceil(0.5*6)=3 -> bin 2 ([2,4)), cum_before=1, in_bin=2
    # est = 2 + 2*(3-1)/2 = 4.0
    assert r["n_in_range"] == 6
    assert math.isclose(r["q_est"], 4.0)
    # estimate within one bin width of the true in-range median (3.5)
    assert abs(r["q_est"] - 3.5) <= 2.0
    with pytest.raises(ValueError):
        histogram_quantile_est(hist, 0.0)


class TestDistinctTier:
    def test_cascade_equals_direct_in_exact_mode(self, spark):
        """Hourly sketches unioned to daily == the direct daily sketch
        while groups stay in HLL coupon mode (small cardinality)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from pyrate_spark.operators.rollup import (distinct_cascade,
                                                   distinct_tier)
        base = dt.datetime(2024, 1, 1)
        rows = [("u", base + dt.timedelta(hours=h, minutes=m),
                 float((h * 7 + m) % 40))
                for h in range(30) for m in (0, 20, 40)]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, value double")
        merged = distinct_cascade(distinct_tier(df, "1 hour"), "1 day")
        direct = distinct_tier(df, "1 day")
        m = {(r.url, r.bucket_start): r.n_distinct_est
             for r in merged.collect()}
        d = {(r.url, r.bucket_start): r.n_distinct_est
             for r in direct.collect()}
        assert m == d
        exact = {(r.url, r.bucket_start): r.c
                 for r in df.groupBy(
                     "url",
                     F.window("warc_ts", "1 day")["start"]
                     .alias("bucket_start"))
                 .agg(F.count_distinct("value").alias("c")).collect()}
        assert m == exact                      # coupon mode == exact

    def test_estimate_contract_at_large_cardinality(self, spark):
        """Past coupon mode the sketch ESTIMATES — within the
        documented ~2% band, not exact (the trade-off the operator
        docstring names)."""
        from pyspark.sql import functions as F

        from pyrate_spark.operators.rollup import distinct_tier
        df = spark.range(20000).select(
            F.lit("u").alias("url"),
            F.lit("2024-01-01 00:30:00").cast("timestamp")
            .alias("warc_ts"),
            F.col("id").cast("double").alias("value"))
        est = distinct_tier(df, "1 hour").first().n_distinct_est
        assert abs(est - 20000) / 20000 < 0.05

    def test_null_values_skipped(self, spark):
        from pyspark.sql import functions as F

        from pyrate_spark.operators.rollup import distinct_tier
        df = spark.createDataFrame(
            [("u", "2024-01-01 00:00:00", 1.0),
             ("u", "2024-01-01 00:10:00", None),
             ("u", "2024-01-01 00:20:00", 1.0),
             ("v", "2024-01-01 00:00:00", None)],
            "url string, warc_ts string, value double") \
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        out = {r.url: r.n_distinct_est
               for r in distinct_tier(df, "1 hour").collect()}
        assert out == {"u": 1}                 # v all-NULL -> dropped
