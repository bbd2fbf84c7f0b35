"""Snapshot-versioned tier store: atomic commits, time travel,
rollback, snapshot expiry (the Iceberg table-format contract the
north rule names, kept runnable without an Iceberg runtime).

The reference overwrites its outputs in place per run (tifs and
NumPy dumps keyed by parameters — shared.py write_output_geotiff /
the .npy caches); a 10^12-row tier store cannot, because readers and
the streaming writer race the rewrite. The snapshot contract fixes
that the same way Iceberg does:

- data files are IMMUTABLE: every commit writes a brand-new
  ``data/s<version>/`` parquet directory and never touches prior ones;
- a snapshot is a tiny JSON manifest listing the data directories
  that make up the table at that version (append = parent's list plus
  the new one; overwrite = just the new one);
- the commit point is a single atomic filesystem primitive:
  the manifest is staged to a dot-temp file and published with
  ``os.link`` — creating the final name FAILS if it already exists,
  so two racing writers cannot both claim a version (optimistic
  concurrency, Iceberg's compare-and-swap on the metadata pointer);
- readers resolve a manifest once, then read only immutable files: a
  reader started at version N is unaffected by any later commit or
  rollback (snapshot isolation);
- ``rollback`` never rewrites history — it commits a NEW version
  whose file list equals the target's, like Iceberg's
  rollback-to-snapshot;
- ``expire_snapshots`` drops old manifests and then deletes only data
  directories referenced by NO surviving manifest (garbage
  collection; the live version can never lose files).

At cluster scale the manifest directory is one metadata object per
commit on the table's object-store prefix — listing it is O(commits),
never O(data). ``os.link`` maps to the conditional-PUT /
putIfAbsent primitive real lakehouse catalogs use.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"
DATA_DIR = "data"


def _snap_dir(store: str) -> str:
    return os.path.join(store, SNAP_DIR)


def _manifest_path(store: str, version: int) -> str:
    return os.path.join(_snap_dir(store), f"v{version:08d}.json")


def list_snapshots(store: str) -> list[dict]:
    """All committed snapshots, oldest first."""
    sdir = _snap_dir(store)
    if not os.path.isdir(sdir):
        return []
    out = []
    for name in sorted(os.listdir(sdir)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(sdir, name)) as f:
                out.append(json.load(f))
    return out


def latest_version(store: str) -> int | None:
    snaps = list_snapshots(store)
    return snaps[-1]["version"] if snaps else None


def _load_manifest(store: str, version: int | None) -> dict:
    if version is None:
        version = latest_version(store)
        if version is None:
            raise FileNotFoundError(f"no snapshots committed at {store}")
    p = _manifest_path(store, version)
    if not os.path.isfile(p):
        raise FileNotFoundError(f"snapshot v{version} not found at {store}")
    with open(p) as f:
        return json.load(f)


def _publish(store: str, manifest: dict) -> dict:
    """Atomic commit: stage to a dot-temp, publish via hard link
    (fails if the version was taken by a racing writer), unlink the
    stage. Retries with the next version on collision."""
    sdir = _snap_dir(store)
    os.makedirs(sdir, exist_ok=True)
    while True:
        v = manifest["version"]
        final = _manifest_path(store, v)
        stage = os.path.join(sdir, f".stage-v{v:08d}-{os.getpid()}.json")
        with open(stage, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        try:
            os.link(stage, final)       # atomic create-if-absent
            os.unlink(stage)
            return manifest
        except FileExistsError:
            # a racing writer committed this version first: re-derive
            # on top of the now-latest snapshot and try again
            os.unlink(stage)
            cur = latest_version(store) or 0
            parent = _load_manifest(store, cur)
            manifest = dict(manifest, version=cur + 1,
                            parent=cur,
                            paths=(manifest["paths"]
                                   if manifest["mode"] == "overwrite" else
                                   parent["paths"] + manifest["own_paths"]))


def commit_snapshot(df: DataFrame, store: str, mode: str = "append",
                    properties: dict | None = None) -> dict:
    """Write ``df`` as a new immutable data directory and commit it as
    the next snapshot. ``mode='append'`` adds to the parent's file
    list; ``mode='overwrite'`` replaces it (the table now contains
    only this commit's rows). Returns the committed manifest."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent_v = latest_version(store)
    version = (parent_v or 0) + 1
    # data dir name is unique per attempt, never reused even across
    # optimistic-concurrency retries (immutability of data files)
    sub = f"s{version:08d}-{os.getpid()}-{int(time.time() * 1000) % 100000}"
    data_path = os.path.join(store, DATA_DIR, sub)
    df.write.mode("error").parquet(data_path)
    parent_paths = ([] if parent_v is None or mode == "overwrite"
                    else _load_manifest(store, parent_v)["paths"])
    manifest = {
        "version": version,
        "parent": parent_v,
        "mode": mode,
        "own_paths": [data_path],
        "paths": parent_paths + [data_path],
        "columns": df.columns,
        "committed_at": time.time(),
        "properties": properties or {},
    }
    return _publish(store, manifest)


def read_snapshot(spark: SparkSession, store: str,
                  version: int | None = None) -> DataFrame:
    """The table as of ``version`` (latest when None). Resolves the
    manifest once; the returned plan reads only immutable files, so a
    concurrent commit/rollback/expire cannot change or break it."""
    m = _load_manifest(store, version)
    return spark.read.parquet(*m["paths"])


def rollback(store: str, to_version: int) -> dict:
    """Make the table's latest state equal snapshot ``to_version`` by
    committing a NEW version with the same file list (history is
    preserved — Iceberg rollback semantics)."""
    target = _load_manifest(store, to_version)
    cur = latest_version(store)
    manifest = {
        "version": (cur or 0) + 1,
        "parent": cur,
        "mode": "overwrite",
        "own_paths": [],
        "paths": list(target["paths"]),
        "columns": target["columns"],
        "committed_at": time.time(),
        "properties": {"rollback_of": to_version},
    }
    return _publish(store, manifest)


def merge_snapshot(df: DataFrame, store: str,
                   keys: Sequence[str] = ("url", "bucket_start"),
                   properties: dict | None = None) -> dict:
    """MERGE INTO (upsert): incoming rows replace current rows with the
    same key; everything else is carried forward. Implemented
    copy-on-write like Iceberg's MERGE: ONE new immutable data
    directory holds ``current ANTI-JOIN incoming  UNION  incoming``,
    committed as an overwrite snapshot — so the merge is atomic (the
    CAS publish), time-travelable (the pre-merge snapshot is intact),
    and concurrent-reader-safe (no current file is touched).

    The anti-join shuffles both sides once on the key; with a
    broadcast-sized incoming delta Catalyst/AQE plans it as a
    broadcast hash anti-join, so routine small upserts never shuffle
    the big current side. At 10^12 rows the production refinement is
    partition-scoped copy-on-write (rewrite only data files whose key
    range overlaps the delta — the manifest already carries one path
    per commit to scope by); semantics here are identical.
    """
    keys = list(keys)
    try:
        current = read_snapshot(df.sparkSession, store)
    except FileNotFoundError:
        return commit_snapshot(df, store, mode="append",
                               properties=properties)
    missing = [k for k in keys if k not in df.columns
               or k not in current.columns]
    if missing:
        raise ValueError(f"merge keys absent from one side: {missing}")
    merged = (current.join(df.select(*keys).distinct(), keys,
                           "left_anti")
              .unionByName(df))
    props = dict(properties or {}, merge_keys=keys)
    return commit_snapshot(merged, store, mode="overwrite",
                           properties=props)


def expire_snapshots(store: str, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` manifests, then delete
    data directories referenced by NO surviving manifest. Returns
    {'expired': [versions], 'deleted_dirs': [paths]}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = list_snapshots(store)
    if len(snaps) <= keep_last:
        return {"expired": [], "deleted_dirs": []}
    expired, kept = snaps[:-keep_last], snaps[-keep_last:]
    live = {p for m in kept for p in m["paths"]}
    # manifests first: once a manifest is gone no reader can resolve
    # it, THEN its now-unreferenced data is safe to delete
    for m in expired:
        os.unlink(_manifest_path(store, m["version"]))
    deleted = []
    for m in expired:
        for p in m["paths"]:
            if p not in live and os.path.isdir(p):
                shutil.rmtree(p)
                deleted.append(p)
    return {"expired": [m["version"] for m in expired],
            "deleted_dirs": sorted(set(deleted))}
