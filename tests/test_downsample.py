"""LTTB downsampling vs a literal scalar reference implementation."""

import datetime as dt

import numpy as np
import pytest

from pyrate_spark.operators.downsample import lttb_downsample

BASE = dt.datetime(2024, 1, 1)
DDL = "url string, warc_ts timestamp, value double"


def lttb_ref(t, v, n_out):
    """Scalar LTTB (Steinarsson 2013, the canonical pseudocode):
    equal-count interior buckets, next-bucket average anchor, argmax
    triangle area vs the previously kept point, ties -> earliest."""
    n = len(t)
    if n <= n_out:
        return list(zip(t, v))
    m = n_out - 2
    out = [(t[0], v[0])]
    # interior index u in [0, n-3] maps to point u+1; bucket boundaries
    lo = [(b * (n - 2)) // m for b in range(m + 1)]
    prev = (t[0], v[0])
    for b in range(m):
        if b + 1 < m:
            seg = range(lo[b + 1] + 1, lo[b + 2] + 1)
            nat = sum(t[i] for i in seg) / len(seg)
            nav = sum(v[i] for i in seg) / len(seg)
        else:
            nat, nav = t[n - 1], v[n - 1]
        best, best_area = None, -1.0
        for i in range(lo[b] + 1, lo[b + 1] + 1):
            area = abs((prev[0] - nat) * (v[i] - prev[1])
                       - (prev[0] - t[i]) * (nav - prev[1]))
            if area > best_area:
                best_area, best = area, (t[i], v[i])
        out.append(best)
        prev = best
    out.append((t[n - 1], v[n - 1]))
    return out


def _df(spark, series):
    rows = [(u, BASE + dt.timedelta(seconds=int(s)), float(x))
            for u, ts, vs in series for s, x in zip(ts, vs)]
    return spark.createDataFrame(rows, DDL)


def _got(spark, series, n_out):
    out = (lttb_downsample(_df(spark, series), n_out)
           .orderBy("url", "t").collect())
    b0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    per = {}
    for r in out:
        per.setdefault(r["url"], []).append((r["t"] - b0, r["v"]))
    return per, {r["url"]: r["n_in"] for r in out}


def test_lttb_matches_reference_random(spark):
    rng = np.random.RandomState(3)
    series = []
    for i, n in enumerate((500, 73, 12, 3, 1)):
        ts = np.sort(rng.choice(10 ** 6, size=n, replace=False))
        vs = np.round(rng.randn(n) * 50, 3)
        series.append((f"u{i}", ts.tolist(), vs.tolist()))
    per, n_in = _got(spark, series, 12)
    for u, ts, vs in series:
        want = lttb_ref(ts, vs, 12)
        assert n_in[u] == len(ts)
        assert per[u] == [(int(a), b) for a, b in want], u
        assert len(per[u]) == min(len(ts), 12)


def test_lttb_keeps_spikes_mean_rollup_flattens(spark):
    # flat series with one spike: LTTB must keep the spike point
    ts = list(range(0, 100000, 100))
    vs = [1.0] * len(ts)
    vs[377] = 500.0
    per, _ = _got(spark, [("s", ts, vs)], 20)
    assert (ts[377], 500.0) in per["s"]
    assert per["s"][0] == (ts[0], 1.0)
    assert per["s"][-1] == (ts[-1], 1.0)


def test_lttb_passthrough_and_validation(spark):
    per, n_in = _got(spark, [("a", [1, 2, 3], [5.0, 6.0, 7.0])], 10)
    assert per["a"] == [(1, 5.0), (2, 6.0), (3, 7.0)]
    assert n_in["a"] == 3
    with pytest.raises(ValueError):
        lttb_downsample(_df(spark, []), 2)


def sdt_ref(t, v, E):
    """Scalar swinging-door reference (Bristol 1990 pseudocode)."""
    n = len(t)
    if n <= 2:
        return list(zip(t, v))
    out = [(t[0], v[0])]
    pat, pav = float(t[0]), v[0]
    pht, phv = float(t[0]), v[0]
    sh, sl = float("inf"), float("-inf")
    for i in range(1, n):
        x_t, x_v = float(t[i]), v[i]
        nh = (x_v + E - pav) / (x_t - pat)
        nl = (x_v - E - pav) / (x_t - pat)
        sh2, sl2 = min(sh, nh), max(sl, nl)
        if sl2 > sh2:
            out.append((pht, phv))
            pat, pav = pht, phv
            sh = (x_v + E - pav) / (x_t - pat)
            sl = (x_v - E - pav) / (x_t - pat)
        else:
            sh, sl = sh2, sl2
        pht, phv = x_t, x_v
    out.append((pht, phv))
    return [(int(a), b) for a, b in out]


def test_sdt_matches_reference_and_error_bound(spark):
    from pyrate_spark.operators.downsample import swinging_door
    rng = np.random.RandomState(9)
    series = []
    for i, n in enumerate((400, 60, 7, 2)):
        ts = np.sort(rng.choice(10 ** 6, size=n, replace=False))
        vs = np.round(np.cumsum(rng.randn(n)), 3)   # a random walk
        series.append((f"u{i}", ts.tolist(), vs.tolist()))
    E = 1.5
    out = (swinging_door(_df(spark, series), E)
           .orderBy("url", "t").collect())
    b0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    per = {}
    for r in out:
        per.setdefault(r["url"], []).append((r["t"] - b0, r["v"]))
    for u, ts, vs in series:
        assert per[u] == sdt_ref(ts, vs, E), u
        # the classic-SDT contract: the archived polyline stays within
        # 2E of every original point (the door interval certifies a
        # line within E of all points; the archived segment agrees
        # with it at the pivot and differs by <= E at the held point,
        # so the triangle inequality gives 2E — the documented bound)
        at = np.array([p[0] for p in per[u]], dtype=float)
        av = np.array([p[1] for p in per[u]], dtype=float)
        interp = np.interp(np.asarray(ts, dtype=float), at, av)
        assert np.max(np.abs(interp - np.asarray(vs))) <= 2 * E + 1e-9, u
        assert len(per[u]) <= len(ts)
    # compression actually happened on the smooth-ish walk
    assert len(per["u0"]) < 400


def test_sdt_straight_line_keeps_two_points(spark):
    from pyrate_spark.operators.downsample import swinging_door
    ts = list(range(0, 5000, 50))
    vs = [0.5 * s + 3.0 for s in ts]
    out = (swinging_door(_df(spark, [("l", ts, vs)]), 0.01)
           .orderBy("t").collect())
    b0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    assert [r["t"] - b0 for r in out] == [0, 4950]
    assert len(out) == 2                       # first + last only
    assert all(r["n_in"] == len(ts) for r in out)
    with pytest.raises(ValueError):
        swinging_door(_df(spark, [("l", ts, vs)]), -1.0)


def test_lttb_nulls_dropped(spark):
    rows = [("a", BASE + dt.timedelta(seconds=s),
             None if s % 3 == 0 else float(s)) for s in range(60)]
    df = spark.createDataFrame(rows, DDL)
    out = lttb_downsample(df, 10).collect()
    assert len(out) == 10
    assert all(r["n_in"] == 40 for r in out)


def test_m4_roles_ties_and_plan(spark):
    from pyspark.sql import functions as F
    from pyrate_spark.operators.downsample import m4_downsample
    base = dt.datetime(2024, 1, 1)
    # one url, one 1-hour bucket of 6 points with a tied minimum (v=1.0
    # at t=120 and t=180 -> lexicographic (v, t) min keeps t=120), plus
    # a second bucket where one point is first, last, min and max at
    # once (collapses to a single output row), plus a null (dropped)
    rows = [("u", base + dt.timedelta(seconds=s), v) for s, v in
            ((0, 5.0), (60, 2.0), (120, 1.0), (180, 1.0), (240, 9.0),
             (300, 4.0), (3600, 7.0))] + [("u", base, None)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, value double")
    out = m4_downsample(df, 3600)
    got = out.orderBy("bucket", "t").collect()
    t0 = int(base.timestamp())
    b0 = [r for r in got if r["bucket"] == t0 // 3600]
    # first(t=0,v=5), tied min keeps earliest (t=120), max(t=240,v=9),
    # last(t=300,v=4); n_in counts only non-null points
    assert [(r["t"] - t0, r["v"], r["n_in"]) for r in b0] == [
        (0, 5.0, 6), (120, 1.0, 6), (240, 9.0, 6), (300, 4.0, 6)]
    b1 = [r for r in got if r["bucket"] != t0 // 3600]
    assert [(r["t"] - t0, r["v"], r["n_in"]) for r in b1] == [
        (3600, 7.0, 1)]
    # scale shape: pure hash aggregation — exactly one Exchange, no
    # sort-based window, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    assert "EvalPython" not in plan
    with pytest.raises(ValueError):
        m4_downsample(df, 0)
