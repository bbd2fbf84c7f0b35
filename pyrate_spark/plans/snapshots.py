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

Concurrency contract (Iceberg's): ``append`` commits are
content-independent of the table head, so a CAS collision re-derives
the file list on top of the winner and retries. ``merge`` and
``rollback`` commits DERIVE their content from a head they read —
colliding with a concurrent commit means that derivation is stale, so
they raise :class:`SnapshotConflictError` (``merge_snapshot`` re-runs
the merge against the new head itself, bounded retries) instead of
publishing a manifest that silently drops the winner's rows.

GC hazard (inherent to every snapshot store, Iceberg included): a
reader that resolved a manifest BEFORE ``expire_snapshots`` ran may
hold references to data directories GC deletes out from under it —
the read then fails loudly at execution (Spark file-not-found), never
silently returns fewer rows. Operationally, ``keep_last`` must cover
the longest reader lifetime, exactly like Iceberg's
``expire_snapshots(older_than=...)`` retention horizon.

At cluster scale the manifest directory is one metadata object per
commit on the table's object-store prefix — listing it is O(commits),
never O(data). ``os.link`` maps to the conditional-PUT /
putIfAbsent primitive real lakehouse catalogs use. Each manifest also
carries per-data-directory min/max stats of the table's key columns
(the Iceberg manifest-file column-bounds role), which is what lets
``merge_snapshot`` rewrite only the directories a delta can touch.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

SNAP_DIR = "_snapshots"
DATA_DIR = "data"

#: columns whose per-directory min/max go into the manifest when present
DEFAULT_STATS_COLS = ("url", "bucket_start")


class SnapshotConflictError(RuntimeError):
    """A derived commit (merge/rollback) lost the CAS race: the head it
    was derived from is no longer the latest snapshot. Re-derive
    against the new head and retry."""


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
    stage.

    Collision handling by mode: ``append`` re-derives its file list on
    top of the winner and retries (content is head-independent);
    ``overwrite`` retries with its own paths (last-writer-wins replace
    is the requested semantic); ``merge``/``rollback`` manifests carry
    ``read_version`` — the head their content was derived from — and
    raise :class:`SnapshotConflictError` when that head moved, because
    retrying with the stale derivation would silently drop the racing
    winner's committed rows."""
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
            os.unlink(stage)
            cur = latest_version(store) or 0
            if manifest.get("read_version") is not None \
                    and cur != manifest["read_version"]:
                raise SnapshotConflictError(
                    f"commit derived from v{manifest['read_version']} "
                    f"but head is now v{cur}; re-derive and retry")
            if manifest["mode"] == "append":
                # content is head-independent: splice onto the winner
                parent = _load_manifest(store, cur)
                manifest = dict(
                    manifest, version=cur + 1, parent=cur,
                    paths=parent["paths"] + manifest["own_paths"],
                    stats={**parent.get("stats", {}),
                           **manifest.get("own_stats", {})})
            else:                       # blind overwrite: replace head
                manifest = dict(manifest, version=cur + 1, parent=cur)


def _json_stat(v):
    """One manifest-stat scalar, in a domain that compares consistently
    on both the path side and the delta side: timestamps/dates become
    epoch seconds, numerics and strings pass through."""
    if isinstance(v, _dt.datetime):
        return v.timestamp()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).timestamp()
    return v


def _column_bounds(df: DataFrame, cols: Sequence[str]) -> dict:
    """{col: [min, max]} over ``df`` for the given columns (one agg
    job, NULLs ignored; a column with no non-null values maps to
    [None, None] which every consumer treats as 'no stat')."""
    cols = [c for c in cols if c in df.columns]
    if not cols:
        return {}
    row = df.agg(*[f(c).alias(f"{tag}_{i}")
                   for i, c in enumerate(cols)
                   for tag, f in (("mn", F.min), ("mx", F.max))]) \
            .collect()[0]
    return {c: [_json_stat(row[f"mn_{i}"]), _json_stat(row[f"mx_{i}"])]
            for i, c in enumerate(cols)}


def _write_data_dir(df: DataFrame, store: str, version: int,
                    stats_cols: Sequence[str]) -> tuple[str, dict]:
    """Write one immutable data directory and return (path, bounds).
    Bounds come from reading back only the stat columns of the files
    just written (a column-pruned scan of the new directory, never the
    table)."""
    # data dir name is unique per attempt, never reused even across
    # optimistic-concurrency retries (immutability of data files)
    sub = f"s{version:08d}-{os.getpid()}-{int(time.time() * 1000) % 100000}"
    data_path = os.path.join(store, DATA_DIR, sub)
    df.write.mode("error").parquet(data_path)
    cols = [c for c in stats_cols if c in df.columns]
    bounds = (_column_bounds(
        df.sparkSession.read.parquet(data_path).select(*cols), cols)
        if cols else {})
    return data_path, bounds


def commit_snapshot(df: DataFrame, store: str, mode: str = "append",
                    properties: dict | None = None,
                    stats_cols: Sequence[str] = DEFAULT_STATS_COLS) -> dict:
    """Write ``df`` as a new immutable data directory and commit it as
    the next snapshot. ``mode='append'`` adds to the parent's file
    list; ``mode='overwrite'`` replaces it (the table now contains
    only this commit's rows). The manifest records min/max bounds of
    ``stats_cols`` (those present in ``df``) for the new directory —
    the pruning index ``merge_snapshot`` scopes its copy-on-write by.
    Returns the committed manifest."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent_v = latest_version(store)
    version = (parent_v or 0) + 1
    data_path, bounds = _write_data_dir(df, store, version, stats_cols)
    parent = (None if parent_v is None
              else _load_manifest(store, parent_v))
    parent_paths = [] if parent is None or mode == "overwrite" \
        else parent["paths"]
    parent_stats = {} if parent is None or mode == "overwrite" \
        else parent.get("stats", {})
    own_stats = {data_path: bounds}
    manifest = {
        "version": version,
        "parent": parent_v,
        "mode": mode,
        "own_paths": [data_path],
        "paths": parent_paths + [data_path],
        "stats": {**parent_stats, **own_stats},
        "own_stats": own_stats,
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
    preserved — Iceberg rollback semantics). Raises
    :class:`SnapshotConflictError` if another writer commits between
    reading the head and publishing (the rollback decision was made
    against a head that no longer exists)."""
    target = _load_manifest(store, to_version)
    cur = latest_version(store)
    manifest = {
        "version": (cur or 0) + 1,
        "parent": cur,
        "mode": "rollback",
        "read_version": cur,
        "own_paths": [],
        "paths": list(target["paths"]),
        "stats": target.get("stats", {}),
        "own_stats": {},
        "columns": target["columns"],
        "committed_at": time.time(),
        "properties": {"rollback_of": to_version},
    }
    return _publish(store, manifest)


def _bounds_overlap(path_stats: dict, delta_bounds: dict,
                    keys: Sequence[str]) -> bool:
    """Conservative bounding-box test: can ``path_stats`` contain a row
    equal to some delta row on ALL keys? Missing stats on either side
    give no pruning power for that column (treated as overlapping);
    only a provably-disjoint interval on some key excludes the path."""
    for k in keys:
        ps = (path_stats or {}).get(k)
        db = delta_bounds.get(k)
        if not ps or not db or None in ps or None in db:
            continue
        if ps[1] < db[0] or db[1] < ps[0]:
            return False
    return True


def merge_snapshot(df: DataFrame, store: str,
                   keys: Sequence[str] = ("url", "bucket_start"),
                   properties: dict | None = None,
                   max_retries: int = 5) -> dict:
    """MERGE INTO (upsert): incoming rows replace current rows with the
    same key; everything else is carried forward. Copy-on-write like
    Iceberg's MERGE, scoped by the manifest's per-directory key
    bounds: only data directories whose [min, max] box on the merge
    keys overlaps the delta's are rewritten (``rewritten ANTI-JOIN
    delta  UNION  delta`` into ONE new immutable directory); every
    provably-disjoint directory is carried into the new manifest BY
    REFERENCE — zero I/O against it. A routine small upsert against a
    10^12-row store therefore rewrites O(delta-touched directories),
    not O(table). The merge is atomic (the CAS publish),
    time-travelable (the pre-merge snapshot is intact), and
    concurrent-reader-safe (no current file is touched).

    The anti-join shuffles only the overlapping directories; with a
    broadcast-sized incoming delta Catalyst/AQE plans it as a
    broadcast hash anti-join, so the rewritten slice streams through
    without shuffling. Concurrency: the commit validates that the head
    it merged against is still the head at publish time; on a lost
    race the orphaned attempt directory is removed and the merge
    re-runs against the new head (``max_retries`` bounds the loop,
    then :class:`SnapshotConflictError` propagates).
    """
    keys = list(keys)
    spark = df.sparkSession
    for _ in range(max_retries):
        head_v = latest_version(store)
        if head_v is None:
            # initial commit, but still merge-derived: read_version 0
            # makes a racing table creation a conflict (re-merge), not
            # an append-splice that could duplicate keys
            data_path, bounds = _write_data_dir(df, store, 1, keys)
            own_stats = {data_path: bounds}
            manifest = {
                "version": 1, "parent": None, "mode": "merge",
                "read_version": 0,
                "own_paths": [data_path], "paths": [data_path],
                "stats": own_stats, "own_stats": own_stats,
                "columns": df.columns, "committed_at": time.time(),
                "properties": dict(properties or {}, merge_keys=keys,
                                   rewrote_dirs=0, carried_dirs=0),
            }
            try:
                return _publish(store, manifest)
            except SnapshotConflictError:
                shutil.rmtree(data_path, ignore_errors=True)
                continue    # another writer created the table first
        head = _load_manifest(store, head_v)
        missing = [k for k in keys if k not in df.columns
                   or k not in head["columns"]]
        if missing:
            raise ValueError(f"merge keys absent from one side: {missing}")
        delta_bounds = _column_bounds(df.select(*keys), keys)
        head_stats = head.get("stats", {})
        rewrite = [p for p in head["paths"]
                   if _bounds_overlap(head_stats.get(p), delta_bounds,
                                      keys)]
        untouched = [p for p in head["paths"] if p not in set(rewrite)]
        if rewrite:
            current = spark.read.parquet(*rewrite)
            merged = (current.join(df.select(*keys).distinct(), keys,
                                   "left_anti")
                      .unionByName(df))
        else:
            merged = df
        version = head_v + 1
        data_path, bounds = _write_data_dir(merged, store, version, keys)
        own_stats = {data_path: bounds}
        manifest = {
            "version": version,
            "parent": head_v,
            "mode": "merge",
            "read_version": head_v,
            "own_paths": [data_path],
            "paths": untouched + [data_path],
            "stats": {**{p: head_stats.get(p, {}) for p in untouched},
                      **own_stats},
            "own_stats": own_stats,
            "columns": merged.columns,
            "committed_at": time.time(),
            "properties": dict(properties or {}, merge_keys=keys,
                               rewrote_dirs=len(rewrite),
                               carried_dirs=len(untouched)),
        }
        try:
            return _publish(store, manifest)
        except SnapshotConflictError:
            # never published: remove the orphaned attempt directory
            # and re-derive the whole merge against the new head
            shutil.rmtree(data_path, ignore_errors=True)
    raise SnapshotConflictError(
        f"merge lost the commit race {max_retries} times at {store}")


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
