"""Deterministic synthetic pages table (FIXTURES.md F1).

Generates the BASELINE-mandated input shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
entirely with Spark built-ins (``spark.range`` + column expressions) so
generation itself scales: no driver-side data, no Python UDFs, no
external files. Every value is a pure function of (row id, seed), so two
runs — or two cluster sizes — produce byte-identical tables.

Per-url signal (closed-form, so oracles know the answer analytically):

    value(url, t) = rate_u * t
                    + amp_u * amp_scale * sin(2*pi * t * 365.25/period_days)
                    + noise

with t in years since START (seasonal period defaults to 7 days —
weekly web-traffic cadence; amp_scale=0 gives a pure linear signal for
exact rate-recovery oracles). ``text`` embeds the value as its leading
``v=<float>`` token: byte-identical text per (url, warc_ts) is the row
invariant the pipeline must preserve (BASELINE.json input_hint).

The per-url parameters use a Knuth multiplicative mix reduced mod 2^31
(overflow-safe under ANSI SQL semantics) replicated exactly in
:func:`signal_params_numpy` for test-side closed-form checks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

START = "2024-01-01 00:00:00"
START_UNIX = 1704067200          # 2024-01-01T00:00:00Z
YEAR_SECONDS = 365.25 * 86400.0  # reference DAYS_PER_YEAR (ifgconstants.py:128)
_MIX = 2654435761                # Knuth multiplicative hash constant
_MOD = 2 ** 31


_MIX2 = 97002721


def _mix(col, salt: int):
    """Uniform [0,1) from an integer column with xor-shift avalanche;
    overflow-safe (mod-2^31 reductions keep products < 2^62).
    Bit-for-bit replicated by :func:`_mix_np`."""
    a = F.pmod((col + F.lit(salt)) * F.lit(_MIX), F.lit(_MOD))
    a = a.bitwiseXOR(F.shiftright(a, 16))
    a = F.pmod(a * F.lit(_MIX2), F.lit(_MOD))
    a = a.bitwiseXOR(F.shiftright(a, 13))
    a = F.pmod(a * F.lit(_MIX), F.lit(_MOD))
    return a.cast("double") / F.lit(float(_MOD))


def _hash_uniform(col, salt: int):
    """Independent uniform [0,1) per (row, salt) via xxhash64 — proper
    avalanche, so different salts decorrelate (unlike _mix)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(_MOD)) \
            .cast("double") / F.lit(float(_MOD))


def _mix_np(x: np.ndarray, salt: int) -> np.ndarray:
    a = ((x.astype(np.int64) + salt) * _MIX) % _MOD
    a = a ^ (a >> 16)
    a = (a * _MIX2) % _MOD
    a = a ^ (a >> 13)
    a = (a * _MIX) % _MOD
    return a.astype(np.float64) / _MOD


def signal_params_numpy(url_ids: np.ndarray, seed: int = 42):
    """Closed-form per-url (rate, amp) — numpy twin of the Spark exprs."""
    rate = _mix_np(np.asarray(url_ids), seed + 1) * 100.0 - 50.0
    amp = _mix_np(np.asarray(url_ids), seed + 2) * 5.0
    return rate, amp


def generate_pages(spark: SparkSession, n_urls: int = 100,
                   epochs_per_url: int = 48, step_hours: int = 6,
                   gap_pct: int = 20, n_hosts: int = 10,
                   hot_urls: int = 0, hot_factor: int = 10,
                   noise: float = 0.05, seed: int = 42,
                   null_pct: int = 0, period_days: float = 7.0,
                   amp_scale: float = 1.0) -> DataFrame:
    """Pages DataFrame. ``hot_urls`` gives the first k urls a
    ``hot_factor``-denser epoch grid (the skew knob exercising salting);
    ``null_pct`` injects non-numeric v= tokens (the NaN analog,
    reference nodata semantics shared.py:342-366)."""
    step_s = step_hours * 3600

    def build(ids: DataFrame, density: int) -> DataFrame:
        epu = epochs_per_url * density
        df = ids.select(
            (F.col("id") / epu).cast("long").alias("url_id"),
            F.pmod(F.col("id"), F.lit(epu)).alias("k"),
            F.col("id"),
        )
        u_gap = _hash_uniform(F.col("id"), seed + 11)
        u_jit = _hash_uniform(F.col("id"), seed + 12)
        u_noise = _hash_uniform(F.col("id"), seed + 13)
        u_null = _hash_uniform(F.col("id"), seed + 14)
        rate = _mix(F.col("url_id"), seed + 1) * 100.0 - 50.0
        amp = _mix(F.col("url_id"), seed + 2) * 5.0

        ts_unix = (F.lit(START_UNIX)
                   + F.col("k") * F.lit(step_s / density)
                   + (u_jit * 2.0 - 1.0) * F.lit(step_s / density * 0.25))
        t_years = (ts_unix - F.lit(START_UNIX)) / F.lit(YEAR_SECONDS)
        value = (rate * t_years
                 + amp * F.lit(amp_scale)
                 * F.sin(t_years * F.lit(2.0 * np.pi * 365.25 / period_days))
                 + (u_noise * 2.0 - 1.0) * F.lit(noise))
        vtoken = F.when(u_null < F.lit(null_pct / 100.0), F.lit("v=null")) \
                  .otherwise(F.format_string("v=%.6f", value))
        df = (df
              .where(u_gap >= F.lit(gap_pct / 100.0))
              .select(
                  F.format_string("https://host%04d.example/p/%05d",
                                  F.pmod(F.col("url_id"), F.lit(n_hosts)),
                                  F.col("url_id")).alias("url"),
                  F.timestamp_seconds(ts_unix).alias("warc_ts"),
                  vtoken.alias("vtoken"),
                  F.col("url_id"), F.col("id")))
        lang = F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "zh", "es", "fr")]),
            (F.pmod(F.col("url_id"), F.lit(5)) + 1).cast("int"))
        text = F.concat(
            F.col("vtoken"), F.lit(" "),
            F.format_string("page url_id=%d crawl=%d lang segment body",
                            F.col("url_id"), F.col("id")))
        return df.select(
            "url", "warc_ts",
            F.encode(F.concat(F.lit("<html><body>"), text,
                              F.lit("</body></html>")), "UTF-8").alias("html"),
            text.alias("text"),
            lang.alias("lang"))

    cold = build(spark.range(n_urls * epochs_per_url), 1)
    if hot_urls > 0:
        hot = build(spark.range(hot_urls * epochs_per_url * hot_factor),
                    hot_factor)
        cold = cold.where(
            F.regexp_extract("url", r"p/(\d+)$", 1).cast("long") >= hot_urls)
        return hot.unionAll(cold)
    return cold
