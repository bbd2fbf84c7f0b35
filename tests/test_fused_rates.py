"""Fused pairs->rates operator == the oracle-gated two-stage chain,
bit-exact, across methods, MST selection, NaN-bearing phases and hot
keys — the fusion may change the plan, never the numbers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrate_spark.config import EngineConfig
from pyrate_spark.datagen import generate_pages
from pyrate_spark.operators.extract import extract_series
from pyrate_spark.operators.grouped import (linear_rate_from_pairs,
                                            linear_rate_per_url,
                                            timeseries_per_url)
from pyrate_spark.operators.pairs import network_pairs
from pyrate_spark.sources.tables import exchange_count


def _rates_pd(df):
    pdf = df.toPandas().sort_values("url").reset_index(drop=True)
    return pdf


@pytest.fixture(scope="module")
def pairs(spark):
    series = extract_series(generate_pages(
        spark, n_urls=120, epochs_per_url=20, hot_urls=2, hot_factor=15,
        null_pct=15, seed=31))
    return network_pairs(series, max_span_days=3,
                         max_pairs_per_epoch=2).persist()


@pytest.mark.parametrize("method,use_mst", [(2, False), (1, False),
                                            (2, True)])
def test_fused_equals_two_stage_bit_exact(spark, pairs, method, use_mst):
    cfg = EngineConfig(ts_method=method, ts_pthr=0, velerror_nsig=2,
                       salt_buckets=16)
    two = _rates_pd(linear_rate_per_url(
        timeseries_per_url(pairs, cfg, use_mst=use_mst), cfg))
    fused = _rates_pd(linear_rate_from_pairs(pairs, cfg,
                                             use_mst=use_mst))
    assert list(two["url"]) == list(fused["url"])
    for c in ("rate", "intercept", "rsquared", "error", "samples"):
        a = two[c].to_numpy()
        b = fused[c].to_numpy()
        # bit-exact including NaN patterns
        np.testing.assert_array_equal(a.view(np.uint64),
                                      b.view(np.uint64), err_msg=c)


def test_fused_halves_the_exchanges(spark, pairs):
    cfg = EngineConfig(ts_method=2, ts_pthr=0, salt_buckets=16)
    two = linear_rate_per_url(timeseries_per_url(pairs, cfg,
                                                 use_mst=False), cfg)
    fused = linear_rate_from_pairs(pairs, cfg, use_mst=False)
    assert exchange_count(fused) < exchange_count(two)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
