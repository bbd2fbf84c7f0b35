"""Per-partition checkpoint manifests: resumable tier builds.

The reference resumes by re-reading step outputs keyed by parameters
(orbital.py:392-407, aps.py:68-72, dem_error.py:306-328, mst.py:284-288)
and by metadata done-flags (shared.py:1330-1369 check_correction_status).
The Spark-native equivalent implemented here:

- work is split into url-hash *buckets* (the unit of resume — the
  analog of the reference's tiles);
- buckets are processed in driver-side batches; each batch is one Spark
  job writing ``out_dir/_bucket=N/`` parquet partitions with dynamic
  partition overwrite;
- a manifest row (JSON file per bucket under ``out_dir/_manifest/``) is
  written only AFTER its batch's job commits, carrying lineage
  (params hash, input fingerprint) + rollup metrics (rows in/out,
  null fraction, value min/max, wall seconds);
- resume = read manifests, skip buckets whose (params_hash, input
  fingerprint) match, reprocess and overwrite everything else — so a
  kill mid-batch loses at most one batch of work and never corrupts
  output (unmanifested partitions are rewritten).

At cluster scale the manifest store would be the Iceberg table's
snapshot/summary metadata; a directory of tiny JSON files keeps the
same contract without an Iceberg runtime in this sandbox.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "_cp_bucket"


def bucket_of(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_buckets(out_dir: str, params_hash: str) -> dict[int, dict]:
    """bucket -> manifest row for every committed bucket matching the
    parameter hash."""
    mdir = _manifest_dir(out_dir)
    done = {}
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            row = json.load(f)
        if row.get("params_hash") == params_hash:
            done[int(row["bucket"])] = row
    return done


def _input_fingerprints(df: DataFrame, key_col: str,
                        n_buckets: int) -> dict[int, dict]:
    """Cheap per-bucket input fingerprint: row count + xor of row
    hashes (order-insensitive, one aggregation)."""
    rows = (df.withColumn(BUCKET_COL, bucket_of(key_col, n_buckets))
            .withColumn("_rh", F.xxhash64(*df.columns))
            .groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("rows_in"),
                 # bit_xor: order-insensitive, overflow-free content hash
                 F.expr("bit_xor(_rh)").alias("content_sum"))
            .collect())
    return {int(r[BUCKET_COL]): {"rows_in": int(r["rows_in"]),
                                 "fingerprint": str(r["content_sum"])}
            for r in rows}


def checkpointed_run(df: DataFrame, out_dir: str,
                     transform: Callable[[DataFrame], DataFrame],
                     key_col: str = "url", n_buckets: int = 32,
                     batches: int = 4, params_hash: str = "default",
                     max_batches: int | None = None) -> int:
    """Process ``transform(df)`` bucket-by-bucket with resume.

    transform: DataFrame -> DataFrame; must keep ``key_col``. Returns
    the number of buckets processed this run (0 = everything was
    already committed). ``max_batches`` stops early (used by the
    kill-and-resume test to simulate a mid-job failure).
    """
    spark = df.sparkSession
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    fps = _input_fingerprints(df, key_col, n_buckets)
    done = completed_buckets(out_dir, params_hash)
    # staleness = fingerprint OR row-count change: the xor fingerprint
    # alone cancels when an even number of identical rows is added or
    # removed, so rows_in participates too
    pending = [b for b in sorted(fps)
               if b not in done
               or done[b].get("fingerprint") != fps[b]["fingerprint"]
               or done[b].get("rows_in") != fps[b]["rows_in"]]
    # a manifested bucket whose input rows all disappeared would never
    # re-pend: drop its stale parquet partition + manifest so
    # read_result cannot return deleted data
    for b in sorted(set(done) - set(fps)):
        part_dir = os.path.join(out_dir, f"{BUCKET_COL}={b}")
        if os.path.isdir(part_dir):
            import shutil
            shutil.rmtree(part_dir)
        mpath = os.path.join(_manifest_dir(out_dir), f"{b}.json")
        if os.path.exists(mpath):
            os.remove(mpath)
    if not pending:
        return 0

    src = df.withColumn(BUCKET_COL, bucket_of(key_col, n_buckets))
    batch_size = max(1, (len(pending) + batches - 1) // batches)
    processed = 0
    n_run = 0
    for i in range(0, len(pending), batch_size):
        if max_batches is not None and n_run >= max_batches:
            break
        chunk = pending[i:i + batch_size]
        t0 = time.perf_counter()
        part = src.where(F.col(BUCKET_COL).isin(chunk))
        out = transform(part.drop(BUCKET_COL)) \
            .withColumn(BUCKET_COL, bucket_of(key_col, n_buckets))
        out.persist()
        # rollup metrics per bucket, computed once, attached to lineage
        metric_cols = [c for c, t in out.dtypes
                       if t in ("double", "float") and c != BUCKET_COL]
        mexprs = [F.count(F.lit(1)).alias("rows_out")]
        if metric_cols:
            c = metric_cols[0]
            mexprs += [F.min(c).alias("metric_min"),
                       F.max(c).alias("metric_max"),
                       F.avg(F.col(c).isNull().cast("double"))
                       .alias("metric_null_fraction")]
        stats = {int(r[BUCKET_COL]): r.asDict()
                 for r in out.groupBy(BUCKET_COL).agg(*mexprs).collect()}
        (out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL).parquet(out_dir))
        out.unpersist()
        wall = time.perf_counter() - t0
        # commit manifests only after the parquet job succeeded
        for b in chunk:
            row = {
                "bucket": b,
                "params_hash": params_hash,
                "fingerprint": fps[b]["fingerprint"],
                "rows_in": fps[b]["rows_in"],
                "wall_sec": round(wall, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
                **{k: (float(v) if v is not None else None)
                   for k, v in (stats.get(b) or {}).items()
                   if k != BUCKET_COL},
            }
            tmp = os.path.join(_manifest_dir(out_dir), f".{b}.tmp")
            with open(tmp, "w") as f:
                json.dump(row, f)
            os.replace(tmp, os.path.join(_manifest_dir(out_dir),
                                         f"{b}.json"))
        processed += len(chunk)
        n_run += 1
    return processed


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).drop(BUCKET_COL)


def read_result_pruned(spark: SparkSession, out_dir: str,
                       params_hash: str,
                       metric_min: float | None = None,
                       metric_max: float | None = None) -> DataFrame:
    """Manifest-based data skipping (the Iceberg snapshot-stats role,
    S6): each bucket's manifest carries the min/max of its primary
    metric column; a value-range query reads ONLY buckets whose
    [metric_min, metric_max] interval intersects the requested range.
    Returns the possibly-superset rows of the matching buckets — the
    caller still applies the exact row filter; pruning just avoids
    touching files that cannot contain matches (at cluster scale this
    is the table format's manifest pruning; the JSON manifests keep the
    same contract without an Iceberg runtime)."""
    done = completed_buckets(out_dir, params_hash)
    keep = []
    for b, row in done.items():
        lo = row.get("metric_min")
        hi = row.get("metric_max")
        if lo is None or hi is None:
            keep.append(b)               # no stats -> cannot skip
            continue
        if metric_min is not None and hi < metric_min:
            continue
        if metric_max is not None and lo > metric_max:
            continue
        keep.append(b)
    if not keep:
        return (spark.read.parquet(out_dir)
                .where(F.lit(False)).drop(BUCKET_COL))
    paths = [os.path.join(out_dir, f"{BUCKET_COL}={b}") for b in keep]
    return spark.read.parquet(*paths)
