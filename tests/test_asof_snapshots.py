"""as-of join, linear-interp gap-fill, snapshot store (r5 additions)."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.asof import asof_join
from pyrate_spark.operators.rollup import gapfill_tier, tier_rollup
from pyrate_spark.plans import snapshots as snap

T = dt.datetime


@pytest.fixture(scope="module")
def events_series(spark):
    from pyrate_spark.datagen import generate_pages
    from pyrate_spark.operators.extract import extract_series
    return extract_series(generate_pages(
        spark, n_urls=40, epochs_per_url=30, step_hours=5,
        null_pct=25, seed=7))


# ---------------------------------------------------------------- as-of join

@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [("a", T(2024, 1, 1, 0, 30), 1.0), ("a", T(2024, 1, 1, 1, 30), 2.0),
         ("a", T(2024, 1, 1, 2, 0), 3.0), ("b", T(2024, 1, 1, 0, 10), 9.0),
         ("c", T(2024, 1, 1, 5, 0), 7.0)],
        "url string, warc_ts timestamp, value double")
    right = spark.createDataFrame(
        [("a", T(2024, 1, 1, 0, 0), 10.0), ("a", T(2024, 1, 1, 2, 0), 30.0),
         ("b", T(2024, 1, 1, 1, 0), 99.0)],
        "url string, bucket_start timestamp, value_avg double")
    return left, right


def test_asof_backward_matches_pandas(spark, asof_frames):
    left, right = asof_frames
    got = (asof_join(left, right)
           .orderBy("url", "warc_ts").toPandas())
    lp = left.toPandas().sort_values(["warc_ts", "url"])
    rp = (right.toPandas().sort_values(["bucket_start", "url"])
          .rename(columns={"bucket_start": "asof_ts"}))
    exp = pd.merge_asof(lp, rp, left_on="warc_ts", right_on="asof_ts",
                        by="url").sort_values(["url", "warc_ts"])
    assert list(got["value_avg"].fillna(-1)) == \
        list(exp["value_avg"].fillna(-1))
    assert list(got["asof_ts"].fillna(T(1970, 1, 1))) == \
        list(exp["asof_ts"].fillna(T(1970, 1, 1)))


def test_asof_tolerance_and_forward(spark, asof_frames):
    left, right = asof_frames
    tol = {r["warc_ts"]: r["value_avg"]
           for r in asof_join(left, right, tolerance_sec=3600)
           .where(F.col("url") == "a").collect()}
    # 01:30 is 90 min past the 00:00 bucket -> out of tolerance
    assert tol[T(2024, 1, 1, 1, 30)] is None
    assert tol[T(2024, 1, 1, 0, 30)] == 10.0
    assert tol[T(2024, 1, 1, 2, 0)] == 30.0   # exact match, age 0
    fwd = {(r["url"], r["warc_ts"]): r["value_avg"]
           for r in asof_join(left, right, direction="forward").collect()}
    assert fwd[("b", T(2024, 1, 1, 0, 10))] == 99.0   # next bucket ahead
    assert fwd[("a", T(2024, 1, 1, 0, 30))] == 30.0
    assert fwd[("c", T(2024, 1, 1, 5, 0))] is None


def test_asof_null_right_column_still_matches_latest(spark):
    """A NULL in a matched right column must not fall through to an
    older right row (the struct-payload property)."""
    left = spark.createDataFrame(
        [("a", T(2024, 1, 1, 3, 0), 1.0)],
        "url string, warc_ts timestamp, value double")
    right = spark.createDataFrame(
        [("a", T(2024, 1, 1, 0, 0), 5.0), ("a", T(2024, 1, 1, 2, 0), None)],
        "url string, bucket_start timestamp, value_avg double")
    row = asof_join(left, right).first()
    assert row["asof_ts"] == T(2024, 1, 1, 2, 0)
    assert row["value_avg"] is None


def test_asof_rejects_column_clash(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("value_avg", "value"))


def test_asof_single_shuffle_plan(spark, asof_frames):
    left, right = asof_frames
    plan = asof_join(left, right)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_tolerance_on_epoch_numeric_ts(spark):
    """tolerance_sec must work when the ts columns are epoch-seconds
    longs (unix_timestamp on a long string-parses to NULL, which would
    silently null every match)."""
    left = spark.createDataFrame(
        [("a", 1000, 1.0), ("a", 8000, 2.0)],
        "url string, warc_ts long, value double")
    right = spark.createDataFrame(
        [("a", 900, 10.0)],
        "url string, bucket_start long, value_avg double")
    got = {r["warc_ts"]: r["value_avg"]
           for r in asof_join(left, right, tolerance_sec=3600).collect()}
    assert got[1000] == 10.0        # 100 s old: in tolerance
    assert got[8000] is None        # 7100 s old: out of tolerance
    # a non-time dtype is a loud error, not a silent all-NULL join
    with pytest.raises(TypeError, match="timestamp or epoch-seconds"):
        asof_join(left.withColumn("warc_ts",
                                  F.col("warc_ts").cast("string")),
                  right.withColumn("bucket_start",
                                   F.col("bucket_start").cast("string")),
                  tolerance_sec=60).collect()


# ---------------------------------------------------------- interp gap-fill

def test_gapfill_interp_lerp_and_edges(spark):
    rows = [("u", T(2024, 1, 1, h), v, 0.0, 1)
            for h, v in [(1, 10.0), (4, 40.0), (6, None)]]
    tier = spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double, "
              "null_fraction double, n_obs long")
    got = {r["bucket_start"].hour: r["value_filled"]
           for r in gapfill_tier(tier, "1 hour", method="interp").collect()}
    assert got[1] == 10.0 and got[4] == 40.0
    assert got[2] == pytest.approx(20.0)
    assert got[3] == pytest.approx(30.0)
    # trailing gap (6 observed-null) has no right bracket -> NULL
    assert got[5] is None and got[6] is None


def test_gapfill_interp_matches_numpy(spark, events_series):
    tier = tier_rollup(events_series, "1 hour", thresh=0.5)
    got = (gapfill_tier(tier, "1 hour", method="interp")
           .orderBy("url", "bucket_start").toPandas())
    for url, g in got.groupby("url"):
        t = g["bucket_start"].astype("int64").to_numpy() / 1e9
        v = g["value_avg"].to_numpy(dtype=float)
        ok = ~np.isnan(v)
        if ok.sum() == 0:
            assert g["value_filled"].isna().all()
            continue
        exp = np.interp(t, t[ok], v[ok])
        # np.interp clamps edges; ours nulls them
        lo, hi = t[ok][0], t[ok][-1]
        inside = (t >= lo) & (t <= hi)
        np.testing.assert_allclose(
            g["value_filled"].to_numpy(dtype=float)[inside],
            exp[inside], rtol=1e-12)
        assert g["value_filled"].isna().to_numpy()[~inside].all()


# ------------------------------------------------------------ snapshot store

def test_snapshot_commit_time_travel_rollback_expire(spark, tmp_path):
    store = str(tmp_path / "tier_store")
    df1 = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2.0).alias("v"))
    df2 = spark.range(100, 150).select(
        F.col("id"), (F.col("id") * 2.0).alias("v"))

    m1 = snap.commit_snapshot(df1, store, mode="append")
    m2 = snap.commit_snapshot(df2, store, mode="append")
    assert (m1["version"], m2["version"]) == (1, 2)
    assert snap.read_snapshot(spark, store, 1).count() == 100
    assert snap.read_snapshot(spark, store, 2).count() == 150
    assert snap.read_snapshot(spark, store).count() == 150  # latest

    # a reader resolved at v2 survives everything that follows
    frozen = snap.read_snapshot(spark, store, 2)

    m3 = snap.commit_snapshot(df1.limit(7), store, mode="overwrite")
    assert m3["version"] == 3
    assert snap.read_snapshot(spark, store).count() == 7

    m4 = snap.rollback(store, to_version=2)
    assert m4["version"] == 4 and m4["properties"]["rollback_of"] == 2
    assert snap.read_snapshot(spark, store).count() == 150
    assert os.path.isfile(snap._manifest_path(store, 2))  # history intact
    assert frozen.count() == 150

    res = snap.expire_snapshots(store, keep_last=1)
    assert res["expired"] == [1, 2, 3]
    # v1/v2's data dirs are still referenced by v4 (the rollback) ->
    # NOT deleted; v3's overwrite dir is unreferenced -> deleted
    assert len(res["deleted_dirs"]) == 1
    assert snap.read_snapshot(spark, store).count() == 150
    assert frozen.count() == 150                  # immutable files
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, store, 1)


def test_snapshot_concurrent_commit_cas(spark, tmp_path):
    """Two writers racing for the same version: the loser re-derives on
    top of the winner instead of clobbering it."""
    store = str(tmp_path / "race")
    snap.commit_snapshot(spark.range(10), store)
    base = snap.latest_version(store)
    df = spark.range(10, 20)
    sub = "s-racer"
    data_path = os.path.join(store, snap.DATA_DIR, sub)
    df.write.parquet(data_path)
    # craft a manifest that targets an already-taken version
    stale = {
        "version": base, "parent": base - 1 if base > 1 else None,
        "mode": "append", "own_paths": [data_path],
        "paths": [data_path], "columns": df.columns,
        "committed_at": 0.0, "properties": {},
    }
    m = snap._publish(store, stale)
    assert m["version"] == base + 1
    assert snap.read_snapshot(spark, store).count() == 20


def test_snapshot_merge_upsert(spark, tmp_path):
    store = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)],
        "url string, bucket_start int, v double")
    # merge into an empty store == initial commit
    m1 = snap.merge_snapshot(base, store, keys=("url", "bucket_start"))
    assert m1["version"] == 1
    # update one key, insert one new key
    delta = spark.createDataFrame(
        [("a", 2, 99.0), ("c", 5, 50.0)],
        "url string, bucket_start int, v double")
    m2 = snap.merge_snapshot(delta, store, keys=("url", "bucket_start"))
    assert m2["version"] == 2 and m2["properties"]["merge_keys"] == \
        ["url", "bucket_start"]
    got = {(r["url"], r["bucket_start"]): r["v"]
           for r in snap.read_snapshot(spark, store).collect()}
    assert got == {("a", 1): 10.0, ("a", 2): 99.0,
                   ("b", 1): 30.0, ("c", 5): 50.0}
    # pre-merge state is still time-travelable
    v1 = {(r["url"], r["bucket_start"]): r["v"]
          for r in snap.read_snapshot(spark, store, 1).collect()}
    assert v1[("a", 2)] == 20.0 and ("c", 5) not in v1
    with pytest.raises(ValueError, match="absent"):
        snap.merge_snapshot(delta.withColumnRenamed("url", "u"), store)


def test_merge_partition_scoped_carries_untouched_dirs(spark, tmp_path):
    """A merge must rewrite ONLY data directories whose manifest key
    bounds overlap the delta; disjoint directories are carried into
    the new manifest by reference (identical path, zero I/O)."""
    store = str(tmp_path / "scoped")
    early = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0)],
        "url string, bucket_start int, v double")
    late = spark.createDataFrame(
        [("x", 100, 10.0), ("z", 200, 20.0)],
        "url string, bucket_start int, v double")
    m1 = snap.commit_snapshot(early, store, mode="append",
                              stats_cols=("url", "bucket_start"))
    m2 = snap.commit_snapshot(late, store, mode="append",
                              stats_cols=("url", "bucket_start"))
    early_dir, late_dir = m1["own_paths"][0], m2["own_paths"][0]
    # delta overlaps ONLY the late directory's (url, bucket) box
    delta = spark.createDataFrame(
        [("x", 100, 99.0), ("y", 150, 15.0)],
        "url string, bucket_start int, v double")
    m3 = snap.merge_snapshot(delta, store, keys=("url", "bucket_start"))
    assert early_dir in m3["paths"]            # carried by reference
    assert late_dir not in m3["paths"]         # rewritten
    assert m3["properties"]["rewrote_dirs"] == 1
    assert m3["properties"]["carried_dirs"] == 1
    # the carried dir's stats ride along untouched
    assert m3["stats"][early_dir] == m1["stats"][early_dir]
    got = {(r["url"], r["bucket_start"]): r["v"]
           for r in snap.read_snapshot(spark, store).collect()}
    assert got == {("a", 1): 1.0, ("b", 2): 2.0, ("x", 100): 99.0,
                   ("y", 150): 15.0, ("z", 200): 20.0}
    # disjoint-everywhere delta rewrites NOTHING: pure append shape
    far = spark.createDataFrame(
        [("m", 500, 5.0)], "url string, bucket_start int, v double")
    m4 = snap.merge_snapshot(far, store, keys=("url", "bucket_start"))
    assert m4["properties"]["rewrote_dirs"] == 0
    assert set(m3["paths"]) < set(m4["paths"])
    assert snap.read_snapshot(spark, store).count() == 6


def test_derived_commit_conflict_raises(spark, tmp_path):
    """merge/rollback manifests carry the head they were derived from;
    losing the CAS race to any other writer is a conflict, never a
    silent retry with stale content."""
    store = str(tmp_path / "conflict")
    snap.commit_snapshot(spark.range(5), store)
    snap.commit_snapshot(spark.range(5, 8), store)       # head is v2
    stale = {
        "version": 2, "parent": 1, "mode": "merge", "read_version": 1,
        "own_paths": [], "paths": [], "columns": ["id"],
        "committed_at": 0.0, "properties": {},
    }
    with pytest.raises(snap.SnapshotConflictError):
        snap._publish(store, stale)


def test_merge_retries_then_raises_without_orphans(spark, tmp_path,
                                                   monkeypatch):
    """A merge that loses every commit race re-derives bounded times,
    removes each orphaned attempt directory, then propagates."""
    store = str(tmp_path / "retry")
    base = spark.createDataFrame(
        [("a", 1, 1.0)], "url string, bucket_start int, v double")
    snap.commit_snapshot(base, store)
    calls = {"n": 0}
    real_publish = snap._publish

    def losing_publish(st, manifest):
        calls["n"] += 1
        raise snap.SnapshotConflictError("forced race loss")

    monkeypatch.setattr(snap, "_publish", losing_publish)
    delta = spark.createDataFrame(
        [("a", 1, 9.0)], "url string, bucket_start int, v double")
    with pytest.raises(snap.SnapshotConflictError, match="3 times"):
        snap.merge_snapshot(delta, store, keys=("url", "bucket_start"),
                            max_retries=3)
    assert calls["n"] == 3
    monkeypatch.setattr(snap, "_publish", real_publish)
    # no orphaned attempt dirs: every data dir is manifest-referenced
    live = {p for m in snap.list_snapshots(store) for p in m["paths"]}
    data_root = os.path.join(store, snap.DATA_DIR)
    on_disk = {os.path.join(data_root, d) for d in os.listdir(data_root)}
    assert on_disk == live


def test_expired_reader_fails_loudly(spark, tmp_path):
    """A reader holding a manifest resolved BEFORE expire_snapshots ran
    must fail at execution when GC deleted its data — never silently
    return fewer rows (the documented keep_last reader-lifetime
    contract)."""
    store = str(tmp_path / "gc")
    snap.commit_snapshot(spark.range(50), store, mode="append")
    frozen = snap.read_snapshot(spark, store, 1)
    snap.commit_snapshot(spark.range(7), store, mode="overwrite")
    res = snap.expire_snapshots(store, keep_last=1)
    assert res["expired"] == [1] and len(res["deleted_dirs"]) == 1
    with pytest.raises(Exception) as exc:
        frozen.count()
    assert "not exist" in str(exc.value).lower() \
        or "filenotfound" in str(exc.value).lower().replace(" ", "")


def test_snapshot_modes_validated(spark, tmp_path):
    with pytest.raises(ValueError):
        snap.commit_snapshot(spark.range(1), str(tmp_path / "x"),
                             mode="merge")
    with pytest.raises(ValueError):
        snap.expire_snapshots(str(tmp_path / "x"), keep_last=0)
