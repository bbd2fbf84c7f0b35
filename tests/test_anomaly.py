"""Anomaly operators: trailing z-score + seasonal baseline.

Semantics pinned here (the oracle gate only proves cross-engine
equality): the z-score frame EXCLUDES the current row, min_obs and
flat-history rows carry NULL z / false flag, and the seasonal profile
is the bucket-ordered exact-fold mean with hod derived from either a
timestamp or an epoch-seconds column.
"""

import datetime as dt
import math

import pytest

from pyrate_spark.operators.anomaly import (anomaly_zscore,
                                            cusum_changepoint,
                                            holt_forecast,
                                            seasonal_baseline)


def _tier(spark, rows):
    return spark.createDataFrame(rows, "url string, bucket_start long,"
                                       " value_avg double")


def test_zscore_excludes_current_row_and_flags_spike(spark):
    # 8 calm points then a spike: history stats must not include the
    # spike itself, so z = (100 - mean(calm)) / std(calm).
    calm = [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0]
    rows = [("a", 3600 * i, v) for i, v in enumerate(calm)]
    rows.append(("a", 3600 * 8, 100.0))
    out = {r["bucket_start"]: r for r in
           anomaly_zscore(_tier(spark, rows), window=24, nsig=3.0,
                          min_obs=6, ts_col="bucket_start").collect()}
    spike = out[3600 * 8]
    mean = sum(calm) / len(calm)
    var = sum((v - mean) ** 2 for v in calm) / (len(calm) - 1)
    assert spike["n_window"] == 8
    assert spike["zscore"] == pytest.approx(
        (100.0 - mean) / math.sqrt(var), rel=1e-12)
    assert spike["is_anomaly"] is True
    # the spike is in later rows' history but its own row used calm only
    assert all(not out[3600 * i]["is_anomaly"] for i in range(8))


def test_zscore_min_obs_and_flat_history(spark):
    # 3 history rows < min_obs=6 -> z computed but flag false;
    # flat history (std 0) -> z NULL, flag false.
    rows = [("a", 3600 * i, float(i)) for i in range(4)]
    rows += [("b", 3600 * i, 5.0) for i in range(10)]
    out = anomaly_zscore(_tier(spark, rows), window=24, nsig=0.1,
                         min_obs=6, ts_col="bucket_start").collect()
    by = {(r["url"], r["bucket_start"]): r for r in out}
    short = by[("a", 3600 * 3)]
    assert short["n_window"] == 3 and short["zscore"] is not None
    assert short["is_anomaly"] is False
    flat = by[("b", 3600 * 9)]
    assert flat["zscore"] is None and flat["is_anomaly"] is False


def test_zscore_window_caps_history(spark):
    rows = [("a", 3600 * i, float(i % 7)) for i in range(40)]
    out = anomaly_zscore(_tier(spark, rows), window=10,
                         ts_col="bucket_start").collect()
    assert max(r["n_window"] for r in out) == 10


def test_zscore_rejects_bad_params(spark):
    df = _tier(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        anomaly_zscore(df, window=0)
    with pytest.raises(ValueError):
        anomaly_zscore(df, min_obs=1)


def test_seasonal_baseline_plan_has_no_window_buffer(spark):
    """The profile fold must live in the (url, hod) aggregate — one
    collected list per profile cell — never in a per-output-row window
    frame buffer (the O(group) x n-rows memory amplification the
    join-back form exists to avoid)."""
    rows = [("a", 3600 * h, float(h)) for h in range(48)]
    plan = (seasonal_baseline(_tier(spark, rows),
                              ts_col="bucket_start")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan, plan
    assert "collect_list" in plan    # the fold is in the aggregate


def test_seasonal_baseline_epoch_and_timestamp_agree(spark):
    # same series expressed as epoch seconds and as timestamps (UTC
    # session tz) must yield identical profiles
    rows = [("a", 86400 * d + 3600 * h, float(d + h))
            for d in range(3) for h in range(4)]
    epoch_out = {(r["url"], r["bucket_start"]): r for r in
                 seasonal_baseline(_tier(spark, rows),
                                   ts_col="bucket_start").collect()}
    ts_rows = [(u, dt.datetime.fromtimestamp(s, dt.timezone.utc)
                .replace(tzinfo=None), v) for u, s, v in rows]
    tdf = spark.createDataFrame(
        ts_rows, "url string, bucket_start timestamp, value_avg double")
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        pytest.skip(f"session tz {tz}: hour() not comparable to epoch")
    ts_out = seasonal_baseline(tdf, ts_col="bucket_start").collect()
    for r in ts_out:
        key = (r["url"], int(r["bucket_start"]
                             .replace(tzinfo=dt.timezone.utc).timestamp()))
        e = epoch_out[key]
        assert r["hod"] == e["hod"]
        assert r["baseline"] == pytest.approx(e["baseline"], abs=0)
        assert r["n_profile"] == e["n_profile"]
    # profile math: hod h over 3 days averages d+h for d in 0..2
    for (u, s), r in epoch_out.items():
        h = (s % 86400) // 3600
        assert r["hod"] == h
        assert r["n_profile"] == 3
        assert r["baseline"] == pytest.approx(h + 1.0, rel=1e-12)
        assert r["residual"] == pytest.approx(
            r["value_avg"] - r["baseline"], rel=1e-12)


def test_cusum_detects_level_shift(spark):
    # 12 calm points then the level jumps by ~2 global sigma: the hi
    # statistic must accumulate past h after the shift while no point
    # alone is extreme (deterministic noise keeps sigma > 0).
    noise = [0.1, -0.2, 0.05, -0.1]
    rows = [("a", 3600 * i, (0.0 if i < 12 else 3.0) + noise[i % 4])
            for i in range(20)]
    out = sorted(cusum_changepoint(_tier(spark, rows), k=0.5, h=4.0,
                                   ts_col="bucket_start").collect(),
                 key=lambda r: r["bucket_start"])
    flagged = [r["bucket_start"] // 3600 for r in out if r["is_change"]]
    assert flagged and min(flagged) >= 12  # fires after, never before
    # replay the recurrence in python on the standardised series
    vals = [v for _, _, v in rows]
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    sd = math.sqrt(var)
    hi = lo = 0.0
    for r, v in zip(out, vals):
        z = (v - mean) / sd
        hi = max(0.0, hi + z - 0.5)
        lo = max(0.0, lo - z - 0.5)
        assert r["cusum_hi"] == pytest.approx(hi, rel=1e-12, abs=1e-15)
        assert r["cusum_lo"] == pytest.approx(lo, rel=1e-12, abs=1e-15)
        assert r["is_change"] is (hi > 4.0 or lo > 4.0)


def test_cusum_flat_and_short_series_null(spark):
    rows = [("flat", 3600 * i, 7.0) for i in range(6)]
    rows.append(("single", 0, 1.0))
    out = cusum_changepoint(_tier(spark, rows),
                            ts_col="bucket_start").collect()
    assert len(out) == 7
    assert all(r["cusum_hi"] is None and r["cusum_lo"] is None
               and r["is_change"] is False for r in out)


def test_cusum_rejects_bad_params(spark):
    df = _tier(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        cusum_changepoint(df, k=-0.1)
    with pytest.raises(ValueError):
        cusum_changepoint(df, h=0.0)


def test_holt_tracks_linear_trend(spark):
    # a pure linear ramp: level converges onto the ramp and the
    # one-step forecast error shrinks toward 0 (EWMA would lag by a
    # constant); verify against the python recurrence exactly.
    rows = [("a", 3600 * i, 2.0 * i + 1.0) for i in range(30)]
    out = sorted(holt_forecast(_tier(spark, rows), alpha=0.5, beta=0.3,
                               ts_col="bucket_start").collect(),
                 key=lambda r: r["bucket_start"])
    level = trend = None
    for r, (_, _, x) in zip(out, rows):
        if level is None:
            level, trend, fc = x, 0.0, None
        else:
            fc = level + trend
            new_l = 0.5 * x + 0.5 * (level + trend)
            trend = 0.3 * (new_l - level) + 0.7 * trend
            level = new_l
        assert r["level"] == pytest.approx(level, rel=1e-12)
        assert r["trend"] == pytest.approx(trend, rel=1e-12)
        if fc is None:
            assert r["forecast"] is None and r["forecast_error"] is None
        else:
            assert r["forecast"] == pytest.approx(fc, rel=1e-12)
            assert r["forecast_error"] == pytest.approx(x - fc,
                                                        rel=1e-9,
                                                        abs=1e-9)
    assert abs(out[-1]["forecast_error"]) < abs(out[2]["forecast_error"])


def test_holt_rejects_bad_params(spark):
    df = _tier(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        holt_forecast(df, alpha=0.0)
    with pytest.raises(ValueError):
        holt_forecast(df, beta=1.5)


def test_burn_rate_multi_window_gating(spark):
    from pyrate_spark.operators.anomaly import slo_burn_rate
    # one isolated spike (short window reacts, long must NOT agree)
    # then a sustained violation run that trips both windows
    vals = [1.0] * 10 + [9.0] + [1.0] * 5 + [9.0] * 12
    rows = [("a", 3600 * i, v) for i, v in enumerate(vals)]
    out = sorted(slo_burn_rate(_tier(spark, rows), threshold=5.0,
                               short_window=3, long_window=12,
                               burn_threshold=0.5,
                               ts_col="bucket_start").collect(),
                 key=lambda r: r["bucket_start"])
    spike = out[10]
    assert spike["violation"] is True
    assert spike["short_rate"] == pytest.approx(1 / 3)
    assert spike["is_burning"] is False  # long window vetoes
    burning = [r["bucket_start"] // 3600 for r in out if r["is_burning"]]
    assert burning and min(burning) >= 16
    last = out[-1]
    assert last["short_rate"] == 1.0 and last["long_rate"] > 0.5
    # partial frames early on: denominators are the actual row counts
    assert out[0]["short_rate"] == 0.0 and out[0]["long_rate"] == 0.0


def test_burn_rate_rejects_bad_windows(spark):
    from pyrate_spark.operators.anomaly import slo_burn_rate
    df = _tier(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        slo_burn_rate(df, 1.0, short_window=0)
    with pytest.raises(ValueError):
        slo_burn_rate(df, 1.0, short_window=6, long_window=3)


def test_seasonal_baseline_skips_nulls(spark):
    rows = [("a", 3600 * h, None if h % 2 else 2.0) for h in range(6)]
    out = seasonal_baseline(_tier(spark, rows),
                            ts_col="bucket_start").collect()
    assert len(out) == 3
    assert all(r["baseline"] == 2.0 and r["n_profile"] == 1 for r in out)


def test_zscore_window_sums_equal_explicit_fold(spark):
    """r8 pin: the windowed sum/sum-of-squares form must stay a
    bit-exact left fold in frame order — the contract the DuckDB
    oracle replays with list_reduce. If a Spark version ever changed
    bounded-frame evaluation order, THIS fails (not the driver gate)."""
    import numpy as np
    from pyspark.sql import Window, functions as F
    rng = np.random.default_rng(13)
    rows = [(f"u{i % 7}", 3600 * (i // 7), float(rng.normal(0, 1)))
            for i in range(700)]
    df = _tier(spark, rows)
    got = (anomaly_zscore(df, window=24, nsig=2.0, min_obs=6,
                          ts_col="bucket_start")
           .toPandas().sort_values(["url", "bucket_start"])
           .reset_index(drop=True))
    w = (Window.partitionBy("url").orderBy("bucket_start")
         .rowsBetween(-24, -1))
    t = df.where(F.col("value_avg").isNotNull())
    t = t.withColumn("_hist", F.collect_list("value_avg").over(w))
    n = F.size("_hist")
    s = F.aggregate("_hist", F.lit(0.0), lambda a, v: a + v)
    ss = F.aggregate("_hist", F.lit(0.0), lambda a, v: a + v * v)
    mean = F.when(n > 0, s / n)
    var = F.when(n > 1, (ss - n * mean * mean) / (n - 1))
    std = F.when(var > 0, F.sqrt(var))
    z = F.when(std.isNotNull(), (F.col("value_avg") - mean) / std)
    exp = (t.select("url", "bucket_start", z.alias("zscore"))
           .toPandas().sort_values(["url", "bucket_start"])
           .reset_index(drop=True))
    a = got["zscore"].to_numpy()
    b = exp["zscore"].to_numpy()
    assert np.array_equal(a.view(np.uint64), b.view(np.uint64))
