"""Kill-and-resume (FIXTURES.md F5): a run stopped mid-way and resumed
must produce output identical to a single uninterrupted run, with
manifests carrying lineage + metrics."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pyrate_spark.datagen import generate_pages
from pyrate_spark.operators.extract import extract_series
from pyrate_spark.operators.rollup import tier_rollup
from pyrate_spark.plans.checkpoint import (checkpointed_run,
                                           completed_buckets, read_result)


@pytest.fixture(scope="module")
def series(spark):
    return extract_series(
        generate_pages(spark, n_urls=60, epochs_per_url=30, null_pct=10,
                       seed=5)).persist()


def transform(df):
    return tier_rollup(df, "1 hour", thresh=0.5)


def _sorted(df):
    return df.orderBy("url", "bucket_start").toPandas()


def test_kill_and_resume_equals_single_shot(spark, series, tmp_path):
    full_dir = str(tmp_path / "full")
    kill_dir = str(tmp_path / "killed")

    n_full = checkpointed_run(series, full_dir, transform,
                              n_buckets=16, batches=4, params_hash="h1")
    assert n_full == 16

    # simulate a kill after 2 of 4 batches
    n1 = checkpointed_run(series, kill_dir, transform,
                          n_buckets=16, batches=4, params_hash="h1",
                          max_batches=2)
    assert 0 < n1 < 16
    done_mid = completed_buckets(kill_dir, "h1")
    assert len(done_mid) == n1

    # resume: only the remaining buckets run
    n2 = checkpointed_run(series, kill_dir, transform,
                          n_buckets=16, batches=4, params_hash="h1")
    assert n1 + n2 == 16

    a = _sorted(read_result(spark, full_dir))
    b = _sorted(read_result(spark, kill_dir))
    assert a.equals(b)


def test_noop_when_complete(spark, series, tmp_path):
    out = str(tmp_path / "o")
    assert checkpointed_run(series, out, transform, n_buckets=8,
                            params_hash="h2") == 8
    assert checkpointed_run(series, out, transform, n_buckets=8,
                            params_hash="h2") == 0


def test_param_change_reprocesses(spark, series, tmp_path):
    out = str(tmp_path / "o2")
    checkpointed_run(series, out, transform, n_buckets=8, params_hash="a")
    assert checkpointed_run(series, out, transform, n_buckets=8,
                            params_hash="b") == 8


def test_input_change_reprocesses_changed_buckets(spark, series, tmp_path):
    out = str(tmp_path / "o3")
    checkpointed_run(series, out, transform, n_buckets=8, params_hash="a")
    changed = series.withColumn(
        "value", F.when(F.col("url").endswith("1"),
                        F.col("value") * 2).otherwise(F.col("value")))
    n = checkpointed_run(changed, out, transform, n_buckets=8,
                         params_hash="a")
    assert 0 < n <= 8       # only buckets whose fingerprint moved


def test_xor_cancelling_change_still_reprocesses(spark, series, tmp_path):
    """Adding two identical rows leaves the bit_xor fingerprint
    unchanged; rows_in must catch it (ADVICE r1)."""
    out = str(tmp_path / "o5")
    one = series.limit(1)
    padded = series.unionAll(one).unionAll(one)
    checkpointed_run(padded, out, transform, n_buckets=4, params_hash="a")
    n = checkpointed_run(series, out, transform, n_buckets=4,
                         params_hash="a")
    assert n >= 1            # the touched bucket re-pends
    fresh = str(tmp_path / "o5_fresh")
    checkpointed_run(series, fresh, transform, n_buckets=4, params_hash="a")
    a = _sorted(read_result(spark, out))
    b = _sorted(read_result(spark, fresh))
    assert a.equals(b)


def test_vanished_bucket_is_purged(spark, series, tmp_path):
    """A bucket whose input rows all disappear must not survive in the
    output (ADVICE r1: stale partition + manifest removal)."""
    out = str(tmp_path / "o6")
    checkpointed_run(series, out, transform, n_buckets=4, params_hash="a")
    kept = series.where(F.pmod(F.xxhash64("url"), F.lit(4)) != 0)
    assert kept.count() < series.count()
    checkpointed_run(kept, out, transform, n_buckets=4, params_hash="a")
    got_urls = {r.url for r in read_result(spark, out)
                .select("url").distinct().collect()}
    want_urls = {r.url for r in kept.select("url").distinct().collect()}
    assert got_urls == want_urls


def test_manifest_carries_lineage_and_metrics(spark, series, tmp_path):
    out = str(tmp_path / "o4")
    checkpointed_run(series, out, transform, n_buckets=4, params_hash="h")
    rows = completed_buckets(out, "h")
    assert len(rows) == 4
    row = next(iter(rows.values()))
    for key in ("fingerprint", "rows_in", "rows_out", "wall_sec",
                "metric_min", "metric_max", "metric_null_fraction",
                "committed_at"):
        assert key in row, key
    assert row["rows_out"] > 0


def test_manifest_pruned_read_skips_buckets(spark, series, tmp_path):
    """S6 data skipping: a metric-range read touches only buckets whose
    manifest stats intersect the range, and filtered results equal the
    unpruned read."""
    from pyrate_spark.plans.checkpoint import read_result_pruned
    out = str(tmp_path / "o7")
    checkpointed_run(series, out, transform, n_buckets=8, params_hash="p")
    full = read_result(spark, out)
    lo = full.agg(F.min("value_avg")).first()[0]
    hi = full.agg(F.max("value_avg")).first()[0]
    cut = lo + (hi - lo) * 0.9
    pruned = read_result_pruned(spark, out, "p", metric_min=cut)
    n_pruned_files = pruned.select(F.input_file_name()).distinct().count()
    n_full_files = full.select(F.input_file_name()).distinct().count()
    assert n_pruned_files < n_full_files       # something was skipped
    a = (pruned.where(F.col("value_avg") >= cut)
         .orderBy("url", "bucket_start").toPandas()
         .drop(columns=["_cp_bucket"], errors="ignore"))
    b = (full.where(F.col("value_avg") >= cut)
         .orderBy("url", "bucket_start").toPandas())
    assert a[b.columns.tolist()].equals(b)


def test_manifest_pruned_read_empty_range(spark, series, tmp_path):
    from pyrate_spark.plans.checkpoint import read_result_pruned
    out = str(tmp_path / "o8")
    checkpointed_run(series, out, transform, n_buckets=4, params_hash="p")
    hi = read_result(spark, out).agg(F.max("value_avg")).first()[0]
    got = read_result_pruned(spark, out, "p", metric_min=hi + 1e9)
    assert got.count() == 0
