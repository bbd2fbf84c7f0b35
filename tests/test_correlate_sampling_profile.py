"""Correlation, deterministic sampling, and profiling operators
(r7 late additions; oracle twins corr_leadlag / hash_split_assign /
stratified_sample / profile_documents)."""

import math

import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.correlate import (best_lag, corr_pairs,
                                              top_keys_by_density)
from pyrate_spark.operators.profile import profile_columns
from pyrate_spark.operators.sampling import (hash_split, hash_uniform,
                                             stratified_sample)


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, bucket_start timestamp, value_avg double")


def _hourly(url, values, start="2024-01-01 00:00:00"):
    import datetime as dt
    t0 = dt.datetime.fromisoformat(start)
    return [(url, t0 + dt.timedelta(hours=i), float(v))
            for i, v in enumerate(values)]


class TestCorrelate:
    def test_identical_series_r1_lag0(self, spark):
        vals = [math.sin(i / 3.0) + i * 0.1 for i in range(48)]
        df = _tier(spark, _hourly("a", vals) + _hourly("b", vals))
        out = corr_pairs(df, top_keys=8, min_overlap=10,
                         lags=(-1, 0, 1)).collect()
        by_lag = {r.lag: r for r in out}
        assert by_lag[0].url_a == "a" and by_lag[0].url_b == "b"
        assert by_lag[0].r == pytest.approx(1.0, abs=1e-12)
        assert abs(by_lag[-1].r) < 1.0 and abs(by_lag[1].r) < 1.0

    def test_shifted_copy_best_lag(self, spark):
        vals = [math.sin(i / 2.0) * 10 for i in range(60)]
        # b(t) = a(t - 3h): a correlates with b at lag +3
        df = _tier(spark, _hourly("a", vals[:48])
                   + _hourly("b", vals[:48], start="2024-01-01 03:00:00"))
        pairs = corr_pairs(df, top_keys=8, min_overlap=10,
                           lags=(-4, -3, 0, 3, 4))
        top = best_lag(pairs).collect()
        assert len(top) == 1
        assert top[0].best_lag == 3
        assert top[0].r == pytest.approx(1.0, abs=1e-9)

    def test_anticorrelated(self, spark):
        vals = [math.cos(i / 4.0) * 5 + 1 for i in range(30)]
        df = _tier(spark, _hourly("a", vals)
                   + _hourly("b", [-v for v in vals]))
        out = corr_pairs(df, top_keys=4, min_overlap=10, lags=(0,)).collect()
        assert len(out) == 1
        assert out[0].r == pytest.approx(-1.0, abs=1e-12)

    def test_top_keys_cap_and_min_overlap(self, spark):
        rows = []
        for u in "abcdef":
            rows += _hourly(u, [ord(u) * 0.1 + i for i in range(20)])
        rows += _hourly("sparse", [1.0, 2.0])   # below min_overlap
        df = _tier(spark, rows)
        cand = top_keys_by_density(df, 3).collect()
        assert [r.url for r in cand] == ["a", "b", "c"]  # count ties -> key
        out = corr_pairs(df, top_keys=3, min_overlap=5, lags=(0,))
        pairs = {(r.url_a, r.url_b) for r in out.collect()}
        assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_plan_no_global_window_rank(self, spark):
        df = _tier(spark, _hourly("a", range(30)) + _hourly("b", range(30)))
        plan = corr_pairs(df, top_keys=4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan   # candidate top-k
        assert "Window" not in plan              # no rank window anywhere


class TestSampling:
    def test_split_partitions_rows_exhaustively(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        out = hash_split(df)
        assert out.count() == 2000
        counts = {r.split: r.n for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] + counts["test"]

    def test_split_deterministic_across_parallelism(self, spark):
        df1 = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        df2 = df1.repartition(7)
        a = sorted((r.doc_id, r.split) for r in hash_split(df1).collect())
        b = sorted((r.doc_id, r.split) for r in hash_split(df2).collect())
        assert a == b

    def test_split_weights_must_sum_to_one(self, spark):
        df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(df, weights={"train": 0.5, "val": 0.1})

    def test_hash_uniform_range_and_spread(self, spark):
        df = spark.range(0, 4096).select(
            hash_uniform(F.col("id"), 9).alias("u"))
        row = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                     F.avg("u").alias("mu")).collect()[0]
        assert 0.0 <= row.lo and row.hi < 1.0
        assert row.mu == pytest.approx(0.5, abs=0.05)

    def test_stratified_sample_subset_and_rates(self, spark):
        df = spark.range(0, 3000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"))
        out = stratified_sample(df, {"en": 0.2, "zh": 1.0})
        got = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert got["zh"] == 1500                 # fraction 1.0 keeps all
        assert 200 < got["en"] < 400             # ~0.2 of 1500
        # membership is a subset of the source and deterministic
        again = stratified_sample(df.repartition(5), {"en": 0.2, "zh": 1.0})
        assert sorted(r.doc_id for r in out.collect()) == \
            sorted(r.doc_id for r in again.collect())

    def test_unknown_stratum_dropped_by_default(self, spark):
        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"), F.lit("xx").alias("lang"))
        assert stratified_sample(df, {"en": 1.0}).count() == 0


class TestProfile:
    def _docs(self, spark):
        rows = [(0, "alpha", None), (1, "beta", 2.0), (2, None, 2.0),
                (3, "beta", 9.5)]
        return spark.createDataFrame(rows, "id long, s string, x double")

    def test_exact_profile_values(self, spark):
        out = {r.col_name: r for r in
               profile_columns(self._docs(spark), exact=True).collect()}
        assert set(out) == {"id", "s", "x"}
        assert out["id"].n_rows == 4 and out["id"].n_null == 0
        assert out["id"].n_distinct == 4
        assert out["id"].min_str == "0" and out["id"].max_str == "3"
        assert out["s"].n_null == 1 and out["s"].n_distinct == 2
        assert out["s"].min_str == "alpha" and out["s"].max_str == "beta"
        assert out["x"].null_fraction == pytest.approx(0.25)
        assert out["x"].max_str == "9.5"

    def test_approx_default_matches_exact_on_small_input(self, spark):
        exact = profile_columns(self._docs(spark), exact=True) \
            .orderBy("col_name").collect()
        approx = profile_columns(self._docs(spark)) \
            .orderBy("col_name").collect()
        for e, a in zip(exact, approx):
            assert e.col_name == a.col_name
            assert e.n_null == a.n_null
            assert a.n_distinct == e.n_distinct  # HLL exact at tiny n
            assert e.min_str == a.min_str and e.max_str == a.max_str

    def test_single_pass_plan(self, spark):
        # one aggregation job: the profile must not plan one scan per
        # column (5 scans of 100 TB is the failure mode)
        plan = profile_columns(self._docs(spark), exact=False)._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1

    def test_empty_cols_raises(self, spark):
        with pytest.raises(ValueError, match="no columns"):
            profile_columns(self._docs(spark), cols=[])
