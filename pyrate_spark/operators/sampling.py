"""Deterministic hash splits and stratified sampling for training
pipelines.

The reference assigns work deterministically by pure arithmetic on
ids — round-robin tile split (`mpiops.array_split`,
/root/reference/pyrate/core/mpiops.py:105-117) and the factorised
grid decomposition (`algorithm.factorise_integer`,
/root/reference/pyrate/core/algorithm.py:240-268) — so any process
count yields the same assignment. A training-data pipeline needs the
same property for train/val/test membership: a row's split must be a
pure function of its id, stable across runs, cluster sizes, and
engine versions. Random `df.sample` gives none of that.

Implementation: an integer xor-shift avalanche over the key (the
datagen's `_mix` construction — every intermediate stays below 2^62,
safe under ANSI arithmetic) mapped to a uniform [0,1), thresholded.
Pure column algebra: no shuffle at all for the assignment itself
(narrow, fuses into the scan), exactly replayable in any SQL engine
with integer ops — which is what the oracle gate does. At 100 TB the
split is therefore free: it pipelines into whatever scan already
runs, and downstream filters on the split column push down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MIX = 2654435761        # Knuth multiplicative constant
_MIX2 = 97002721
_MOD = 2 ** 31
_OFFSET = 1013904223     # kills the key==-salt zero fixed point


def hash_uniform(key: Column, salt: int = 0) -> Column:
    """Deterministic uniform [0,1) from an integer key: xor-shift
    avalanche, mod-2^31 reductions (products < 2^62, ANSI-safe)."""
    a = F.pmod((F.pmod(key, F.lit(_MOD)) + F.lit(salt + _OFFSET))
               * F.lit(_MIX), F.lit(_MOD))
    a = a.bitwiseXOR(F.shiftright(a, 16))
    a = F.pmod(a * F.lit(_MIX2), F.lit(_MOD))
    a = a.bitwiseXOR(F.shiftright(a, 13))
    a = F.pmod(a * F.lit(_MIX), F.lit(_MOD))
    return a.cast("double") / F.lit(float(_MOD))


def hash_uniform_sql(key_expr: str, salt: int = 0) -> str:
    """The DuckDB replay of :func:`hash_uniform` — the oracle twin."""
    a = f"((({key_expr}) % {_MOD} + {salt + _OFFSET}) * {_MIX}) % {_MOD}"
    a = f"xor({a}, ({a}) >> 16)"
    a = f"(({a}) * {_MIX2}) % {_MOD}"
    a = f"xor({a}, ({a}) >> 13)"
    a = f"(({a}) * {_MIX}) % {_MOD}"
    return f"CAST({a} AS DOUBLE) / {float(_MOD)}"


def hash_split(df: DataFrame, key_col: str = "doc_id",
               weights: dict | None = None, salt: int = 0) -> DataFrame:
    """Assign every row a split label by hash threshold. `weights`
    maps label -> fraction (must sum to 1); label boundaries are the
    cumulative fractions in the given order. Adds `split`."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_uniform(F.col(key_col).cast("long"), salt)
    expr, acc = None, 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(label)) if expr is None \
            else expr.when(cond, F.lit(label))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, fractions: dict,
                      key_col: str = "doc_id",
                      stratum_col: str = "lang",
                      default_fraction: float = 0.0,
                      salt: int = 1) -> DataFrame:
    """Deterministic per-stratum hash sample: keep a row iff
    u(key, salt) < fraction(stratum). Unlike `df.sampleBy` the result
    is a pure function of the data — rerunning, re-partitioning, or
    scaling the cluster cannot change membership. Narrow (no
    shuffle); the per-stratum fraction map is a literal CASE, not a
    join, since it's config-sized."""
    u = hash_uniform(F.col(key_col).cast("long"), salt)
    frac = None
    for stratum, f_keep in sorted(fractions.items()):
        cond = F.col(stratum_col) == F.lit(stratum)
        frac = F.when(cond, F.lit(float(f_keep))) if frac is None \
            else frac.when(cond, F.lit(float(f_keep)))
    frac = F.lit(float(default_fraction)) if frac is None \
        else frac.otherwise(F.lit(float(default_fraction)))
    return df.where(u < frac)
