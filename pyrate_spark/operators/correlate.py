"""Cross-series correlation with lead-lag search.

The reference's VCM build correlates every interferogram with every
other through shared epochs (`get_vcmt`,
/root/reference/pyrate/core/covariance.py:257-310) — a dense
cross-signal second-moment matrix over a bounded signal set. The
web-observability counterpart is cross-URL Pearson correlation over
aligned tier buckets ("which metrics moved with this incident"),
optionally shifted by a small set of lags to find lead/lead
relationships.

Scale contract (the jaccard/max_df discipline): an uncapped all-pairs
correlation over URLs is quadratic in the key cardinality — the
100 TB killer. ``corr_pairs`` therefore ranks keys by observation
count and keeps the densest ``top_keys`` before pairing (rank,
broadcast semi-join back), exactly like the reference bounds the VCM
to the interferogram set. After the cap the bucket-aligned self-join
fans out at most ``top_keys**2`` rows per bucket and the whole
operator is: one hash agg (candidate ranks) + one broadcast
semi-join + one shuffle-join on the bucket key + one hash agg
(Pearson co-moments, map-side partials) — no Python, no windows, no
driver loops. Lags multiply the probe side by ``len(lags)`` (a small
constant) before the join, never after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window


def top_keys_by_density(tier_df: DataFrame, top_keys: int,
                        key_col: str = "url",
                        value_col: str = "value_avg") -> DataFrame:
    """The densest `top_keys` keys (most non-null buckets),
    deterministic tie-break on the key itself. Tiny output — always
    broadcastable."""
    ranked = (tier_df.where(F.col(value_col).isNotNull())
              .groupBy(key_col)
              .agg(F.count(F.lit(1)).alias("n_buckets")))
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # partial top-k per partition merged on the driver, NOT the
    # single-partition global-window shuffle a row_number() rank
    # would plan. At 10^9 keys this is the difference between a
    # bounded driver merge and one executor sorting every key.
    return (ranked.orderBy(F.desc("n_buckets"), F.asc(key_col))
            .limit(top_keys).select(key_col, "n_buckets"))


def corr_pairs(tier_df: DataFrame, bucket_sec: int = 3600,
               top_keys: int = 32, min_overlap: int = 24,
               lags: tuple = (0,), key_col: str = "url",
               bucket_col: str = "bucket_start",
               value_col: str = "value_avg") -> DataFrame:
    """Pairwise Pearson correlation between the densest `top_keys`
    series at each lag in `lags` (units of buckets; positive lag k
    correlates a(t) with b(t + k*bucket_sec), i.e. b LAGS a).

    Output: (url_a, url_b, lag, r, n_overlap) for url_a < url_b and
    n_overlap >= min_overlap. ``r`` is engine-exact Pearson; gates
    float-squash + round like every variance-family oracle.
    """
    cand = top_keys_by_density(tier_df, top_keys, key_col, value_col)
    base = (tier_df.where(F.col(value_col).isNotNull())
            .join(F.broadcast(cand.select(key_col)), key_col, "semi")
            .select(F.col(key_col).alias("k"),
                    F.unix_timestamp(bucket_col).cast("long").alias("b"),
                    F.col(value_col).alias("v")))
    probe = base.select(
        "k", "v",
        F.explode(F.array(*[F.lit(int(l)) for l in lags])).alias("lag"),
        (F.col("b") + F.col("lag") * F.lit(int(bucket_sec))).alias("b_join"))
    a = probe.select(F.col("k").alias("url_a"), F.col("lag"),
                     F.col("b_join"), F.col("v").alias("va"))
    bb = base.select(F.col("k").alias("url_b"), F.col("b").alias("b_join"),
                     F.col("v").alias("vb"))
    joined = a.join(bb, "b_join").where(F.col("url_a") < F.col("url_b"))
    out = (joined.groupBy("url_a", "url_b", "lag")
           .agg(F.corr("va", "vb").alias("r"),
                F.count(F.lit(1)).alias("n_overlap"))
           .where(F.col("n_overlap") >= min_overlap))
    return out


def best_lag(pairs_df: DataFrame) -> DataFrame:
    """Per pair, the lag with the strongest |r| (deterministic
    tie-break: smaller lag). Input is `corr_pairs` output; one
    window over the (pair) key — bounded frame, cardinality already
    capped upstream at top_keys**2 * len(lags)."""
    w = Window.partitionBy("url_a", "url_b").orderBy(
        F.desc(F.abs(F.col("r"))), F.asc("lag"))
    return (pairs_df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("url_a", "url_b", F.col("lag").alias("best_lag"),
                    "r", "n_overlap"))
