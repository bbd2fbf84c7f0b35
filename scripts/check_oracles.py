"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the same
sf directory, compare row count, column names, and order-insensitive
values (NaN==NaN, None==None).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from pyrate_spark.session import get_session  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int widths / nullables
    return df.sort_values(list(df.columns), na_position="last") \
             .reset_index(drop=True)


def dtype_class(dt) -> str:
    """Coarse dtype class mirroring what the driver's value-hash sees:
    an int64 26 and a float64 26.0 hash differently, so int vs float is
    a real mismatch even when the values agree numerically."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith(("bool", "Bool")):
        return "bool"
    if "datetime" in s:
        return "datetime"
    return "object"


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        return problems
    for c in sorted(got.columns):
        gc, ec = dtype_class(got[c].dtype), dtype_class(exp[c].dtype)
        if gc != ec:
            problems.append(
                f"col {c}: dtype-class {gc} ({got[c].dtype}) vs "
                f"{ec} ({exp[c].dtype}) — driver hash would mismatch")
    if len(got) != len(exp):
        problems.append(f"rowcount {len(got)} vs {len(exp)}")
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            if gv.dtype == object:
                bad = (gv != ev)
            else:
                bad = ~((gv == ev) | (pd.isna(gv) & pd.isna(ev)))
                if np.issubdtype(gv.dtype, np.floating) and \
                        np.issubdtype(ev.dtype, np.floating):
                    # -0.0 == +0.0 compares True but value-hashes
                    # differently at the driver (the r7
                    # closure_sums_tri/closure_classmap reds shipped
                    # because this check was sign-blind)
                    bad |= ((gv == 0) & (ev == 0)
                            & (np.signbit(gv) != np.signbit(ev)))
            nbad = int(np.sum(bad))
            if nbad:
                i = int(np.flatnonzero(bad)[0])
                problems.append(
                    f"col {c}: {nbad} mismatches, first at row {i}: "
                    f"{gv[i]!r} vs {ev[i]!r} "
                    + ("(signed-zero)" if gv[i] == ev[i] else ""))
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    # single-threaded oracle: DuckDB's parallel aggregation sums in a
    # nondeterministic partial order, so a value sitting at a rounding
    # (or float32-squash) boundary can flip between runs — observed on
    # dem_error_derived's aux_coef (72.00864 vs 72.00865 across
    # identical runs at threads=default; stable and Spark-matching at
    # threads=1). One thread makes the local gate deterministic.
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    spark = get_session("oracle-check", parallelism=8, shuffle_partitions=16)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error {type(exc).__name__}: "
                  f"{str(exc)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(got) >= 0 else "EMPTY"
            print(f"{status}  {name}: rows-only, {len(got)} rows")
            n_rows_only += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {str(exc)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
