"""Datagen determinism, the byte-identical text row invariant, and the
pages -> series extraction (P1 nodata->NULL semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrate_spark.datagen import generate_pages, signal_params_numpy
from pyrate_spark.operators.extract import extract_series, with_t_years


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, n_urls=20, epochs_per_url=24,
                          seed=42).cache()


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == \
        ["url", "warc_ts", "html", "text", "lang"]
    kinds = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert kinds["html"] == "binary"
    assert kinds["warc_ts"] == "timestamp"


def test_deterministic_regeneration(spark, pages):
    """Two generations are row-for-row byte-identical (seeded)."""
    again = generate_pages(spark, n_urls=20, epochs_per_url=24, seed=42)
    a = pages.orderBy("url", "warc_ts").toPandas()
    b = again.orderBy("url", "warc_ts").toPandas()
    assert (a["text"] == b["text"]).all()
    assert (a["url"] == b["url"]).all()
    assert a["html"].map(bytes).equals(b["html"].map(bytes))


def test_text_invariant_through_pipeline(spark, pages):
    """BASELINE row invariant: extracted text joined back by
    (url, warc_ts) after the numeric pipeline is byte-identical."""
    series = extract_series(pages)
    # simulate a full round trip: series -> agg -> re-join text
    back = (series.join(pages.select("url", "warc_ts", "text"),
                        ["url", "warc_ts"]))
    orig = pages.select("url", "warc_ts", "text")
    diff = (back.select("url", "warc_ts", "text")
            .exceptAll(orig).count())
    assert diff == 0
    assert back.count() == pages.count()


def test_html_text_recovery_byte_identical(spark, pages):
    """extract_text_html recovers the carried text from the raw html
    binary byte-for-byte (the row invariant recovered from the fat
    column itself, not just re-joined); a malformed shell extracts ""
    rather than a truncation."""
    from pyrate_spark.operators.extract import extract_text_html
    ex = extract_text_html(pages)
    assert ex.where(F.col("text_from_html") != F.col("text")).count() == 0
    assert ex.count() == pages.count()
    broken = pages.withColumn(
        "html", F.encode(F.lit("<html><body>oops</body>"), "UTF-8"))
    bad = extract_text_html(broken).select("text_from_html").first()[0]
    assert bad == ""


def test_extract_parses_value(pages):
    s = extract_series(pages)
    row = s.where(F.col("value").isNotNull()).first()
    assert isinstance(row["value"], float)
    assert s.where(F.col("value").isNull()).count() == 0  # null_pct=0


def test_null_injection(spark):
    p = generate_pages(spark, n_urls=10, epochs_per_url=30, seed=42,
                       null_pct=30)
    s = extract_series(p)
    frac = s.agg(F.avg(F.col("value").isNull().cast("double"))).first()[0]
    assert 0.15 < frac < 0.45


def test_signal_closed_form(spark):
    """Recover per-url linear rate from the generated signal with plain
    least squares; must match signal_params_numpy rate (FIXTURES F1).
    amp_scale=0 isolates the linear component; residual error comes
    only from the bounded noise term."""
    p = generate_pages(spark, n_urls=20, epochs_per_url=24, seed=42,
                       amp_scale=0.0)
    s = with_t_years(extract_series(p))
    got = (s.groupBy("url")
           .agg(F.regr_slope("value", "t_years").alias("slope"))
           .orderBy("url").toPandas())
    url_ids = got["url"].str.extract(r"p/(\d+)$")[0].astype(int).to_numpy()
    rate, amp = signal_params_numpy(url_ids, seed=42)
    assert np.abs(got["slope"].to_numpy() - rate).max() < 5.0
    # rates must actually vary across urls (mixer quality)
    assert rate.std() > 10.0


def test_hot_urls_density(spark):
    p = generate_pages(spark, n_urls=10, epochs_per_url=20, hot_urls=2,
                       hot_factor=5, seed=42)
    counts = (p.groupBy("url").count().orderBy("url").toPandas())
    hot = counts["count"].iloc[:2].mean()
    cold = counts["count"].iloc[2:].mean()
    assert hot > 3 * cold
