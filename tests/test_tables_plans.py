"""Physical-plan assertions: bucketed tables remove shuffles; filters
and projections reach the parquet scan (pushdown/pruning)."""

import pytest
from pyspark.sql import functions as F

from pyrate_spark.datagen import generate_pages
from pyrate_spark.operators.extract import extract_series
from pyrate_spark.sources.tables import (exchange_count, read_table,
                                         write_bucketed)


@pytest.fixture(scope="module")
def bucketed(spark):
    import shutil
    s = extract_series(generate_pages(spark, n_urls=40, epochs_per_url=20,
                                      seed=9))
    spark.sql("DROP TABLE IF EXISTS series_b")
    # in-memory catalog forgets tables between sessions but the
    # warehouse dir persists: clear the stale location too
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    shutil.rmtree(f"{wh}/series_b", ignore_errors=True)
    write_bucketed(s, "series_b", n_buckets=8)
    return read_table(spark, "series_b")


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    agg = bucketed.groupBy("url").agg(F.avg("value"))
    assert exchange_count(agg) == 0
    # sanity: the same agg on a plain (non-bucketed) frame DOES shuffle
    plain = bucketed.localCheckpoint() if False else None
    s = extract_series(generate_pages(spark, n_urls=40, epochs_per_url=20,
                                      seed=9))
    assert exchange_count(s.groupBy("url").agg(F.avg("value"))) >= 1


def test_bucketed_self_join_is_colocated(spark, bucketed):
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    j = a.join(b, "url")
    assert exchange_count(j) == 0


def test_filter_and_projection_pushdown(spark, tmp_path):
    path = str(tmp_path / "pages")
    generate_pages(spark, n_urls=30, epochs_per_url=10,
                   seed=3).write.parquet(path)
    df = (spark.read.parquet(path)
          .where(F.col("lang") == "en")
          .select("url", "lang"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: the fat html binary never reaches the scan output
    assert "html" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_broadcast_join_for_small_dim(spark):
    s = extract_series(generate_pages(spark, n_urls=30, epochs_per_url=10,
                                      seed=3))
    dim = spark.createDataFrame([("en", 1)], "lang string, prio int")
    j = s.join(F.broadcast(dim), "lang")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
