"""Manifest-pointer table commits — the object-store-honest sink layout.

``compact_small_files`` (sinks.py) swaps directories by rename, which is
POSIX-only and non-atomic across two paths. A 100 TB lake on an object
store commits the way Iceberg/Delta do instead (no rename of data at all):

1. data files are IMMUTABLE and write-once, under a fresh versioned
   prefix per commit (``data/v00000001/``, ``data/v00000002/``, …);
2. a tiny manifest per snapshot (``manifests/v00000001.json``) lists the
   exact data files that make up that table version;
3. the table pointer (``MANIFEST.json``) is repointed at the new snapshot
   in ONE atomic operation — readers see the old file list or the new
   one, never a mix, and a crash anywhere before the swap leaves the
   previous version intact and current.

The COMMIT point is the snapshot-manifest create, done as PUT-if-absent
(``open(.., "x")`` locally; a conditional PUT on an object store — exactly
Delta's zero-padded ``_delta_log`` entry): two writers racing for version
n cannot both create ``manifests/v0000000n.json``, so the loser aborts
with ``ConcurrentCommitError`` and removes only its own never-referenced
data prefix. The pointer swap afterwards (atomic ``os.replace``; catalog
CAS on an object store) only PUBLISHES the committed version to readers.
If a writer dies between commit and publish, the next commit adopts the
orphaned newest manifest as its parent and its own publish step makes
both visible — no lost updates, no split history.

Because snapshots are file LISTS, logical operations never rewrite
history in place: append = old files + new prefix, compact = same rows as
new files, overwrite = new files only. Old snapshots stay readable
(time travel) until ``vacuum`` drops their unreferenced data files.

Reference parity note: the reference (task.ts:216) submits one document
per run and keeps no table state; this module is the engine's scale-path
addition (SURVEY §2 C, storage management), not a reference behavior.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

MANIFEST_POINTER = "MANIFEST.json"
_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer created this commit's target version first (lost the
    PUT-if-absent race on the snapshot manifest — optimistic concurrency,
    Iceberg/Delta-style)."""


@dataclass(frozen=True)
class Snapshot:
    """One committed table version: an immutable list of data files.

    ``txn`` maps writer-application ids to the last transaction (e.g.
    streaming micro-batch id) each has committed — carried forward across
    versions, it makes retried writes idempotent (the Delta
    ``txn``/``setTransaction`` shape)."""

    version: int
    files: tuple[str, ...]  # paths relative to the table root
    operation: str  # "overwrite" | "append" | "compact"
    parent: int | None
    txn: tuple[tuple[str, int], ...] = ()
    # Per-file column statistics for scan pruning: (file, json-of-
    # {col: [min, max]}) pairs — the Iceberg/Delta manifest-stats shape.
    # Stored as rendered JSON strings so the dataclass stays hashable.
    stats: tuple[tuple[str, str], ...] = ()

    @property
    def txn_map(self) -> dict[str, int]:
        return dict(self.txn)

    @property
    def stats_map(self) -> dict[str, dict]:
        return {f: json.loads(s) for f, s in self.stats}

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "parent": self.parent,
                "files": list(self.files),
                "txn": dict(self.txn),
                "stats": {f: json.loads(s) for f, s in self.stats},
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "Snapshot":
        d = json.loads(text)
        return cls(
            version=d["version"],
            files=tuple(d["files"]),
            operation=d["operation"],
            parent=d["parent"],
            txn=tuple(sorted(d.get("txn", {}).items())),
            stats=tuple(
                sorted(
                    (f, json.dumps(s, sort_keys=True))
                    for f, s in d.get("stats", {}).items()
                )
            ),
        )


def _pointer_path(root: str) -> str:
    return os.path.join(root, MANIFEST_POINTER)


def _snapshot_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version:08d}.json")


def current_version(root: str) -> int | None:
    """Version the table pointer names (the PUBLISHED version), or None for
    an uninitialized table."""
    try:
        with open(_pointer_path(root), encoding="utf-8") as f:
            return json.load(f)["version"]
    except FileNotFoundError:
        return None


def _latest_committed_version(root: str) -> int | None:
    """Newest version with a snapshot manifest — committed though possibly
    not yet published (writer died between commit and pointer swap)."""
    try:
        names = os.listdir(os.path.join(root, _MANIFEST_DIR))
    except FileNotFoundError:
        return None
    versions = [
        int(f[1:9]) for f in names if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=None)


def read_snapshot(root: str, version: int | None = None) -> Snapshot:
    """Load a snapshot — the current one, or any retained version (time
    travel)."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed table at {root}")
    with open(_snapshot_path(root, version), encoding="utf-8") as f:
        return Snapshot.from_json(f.read())


def read_table(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the table AS OF a snapshot (default: current) — scans exactly
    the files that snapshot lists, nothing else. Stray files from aborted
    writes are invisible because reads never list directories.

    ``merge_schema=True`` unions the file schemas (Spark mergeSchema):
    the lake reality where an append added a column — rows from older
    files read NULL for it. Off by default: schema union costs a footer
    read per file group and most tables are schema-stable."""
    snap = read_snapshot(root, version)
    if not snap.files:
        raise ValueError(f"snapshot v{snap.version} of {root} is empty")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*(os.path.join(root, f) for f in snap.files))


def _list_parquet(prefix_abs: str, root: str) -> list[str]:
    out = [
        os.path.relpath(os.path.join(dirpath, f), root)
        for dirpath, _, files in os.walk(prefix_abs)
        for f in files
        if f.endswith(".parquet")
    ]
    return sorted(out)


def _collect_file_stats(
    root: str, files: list[str], cols: list[str]
) -> tuple[tuple[str, str], ...]:
    """Per-file min/max for ``cols`` from the parquet FOOTERS (driver-side
    metadata read — no data pass; this is what a distributed writer would
    return from each task at scale). Only int/float/str stats are kept;
    a column with no usable stats in some file simply has no entry there
    (that file then never prunes on that column — safe)."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        md = pq.ParquetFile(os.path.join(root, f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for col in cols:
            i = names.get(col)
            if i is None:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins and all(
                isinstance(v, (int, float, str)) and not isinstance(v, bool)
                for v in (min(mins), max(maxs))
            ):
                stats[col] = [min(mins), max(maxs)]
        out.append((f, json.dumps(stats, sort_keys=True)))
    return tuple(sorted(out))


def read_table_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Scan the table with MANIFEST-LEVEL file skipping: only files whose
    committed [min, max] for ``col`` overlaps [lo, hi] are opened, then
    the exact predicate is applied on top (stats prune, they never
    filter). Files committed without stats for ``col`` are always read —
    pruning is an optimization, never a correctness dependency. Combined
    with a Z-order/range layout at write time this is the Iceberg/Delta
    data-skipping path: a predicate on the layout column touches
    O(selectivity) of the files instead of all of them
    (tests/test_table_commit.py asserts both the skip and the equality
    with the unpruned scan)."""
    snap = read_snapshot(root, version)
    stats = snap.stats_map
    keep = [
        f
        for f in snap.files
        if (s := stats.get(f, {}).get(col)) is None
        or (s[1] >= lo and s[0] <= hi)
    ]
    from pyspark.sql import functions as F

    if not keep:
        return (
            read_table(spark, root, version)
            .filter(F.col(col).between(lo, hi))
            .limit(0)
        )
    df = spark.read.parquet(*(os.path.join(root, f) for f in keep))
    return df.filter(F.col(col).between(lo, hi))


def pruned_file_count(root: str, col: str, lo, hi, version: int | None = None) -> int:
    """How many files a [lo, hi] predicate on ``col`` would open."""
    snap = read_snapshot(root, version)
    stats = snap.stats_map
    return sum(
        1
        for f in snap.files
        if (s := stats.get(f, {}).get(col)) is None
        or (s[1] >= lo and s[0] <= hi)
    )


def _swap_pointer(root: str, snap: Snapshot) -> None:
    """Publish ``snap`` to readers, MONOTONICALLY: the pointer never moves
    backwards, so a writer that stalled between commit and publish cannot
    regress visibility past a successor that already published a later
    version. The read-check-replace is serialized with an advisory file
    lock (the local analog of the catalog CAS an object store provides);
    readers never take the lock — they only ever see old-or-new pointer
    contents because ``os.replace`` is atomic."""
    import fcntl

    pointer = _pointer_path(root)
    lock = os.path.join(root, ".pointer.lock")
    with open(lock, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        cur = current_version(root)
        if cur is not None and cur >= snap.version:
            return  # a successor already published past us
        tmp = f"{pointer}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(json.dumps({"version": snap.version}))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, pointer)  # the one atomic step readers observe


def commit(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    _operation: str | None = None,
    txn: tuple[str, int] | None = None,
    stats_cols: list[str] | None = None,
) -> Snapshot:
    """Commit ``df`` as a new table version. ``mode='overwrite'`` makes the
    new snapshot exactly df's files; ``'append'`` carries the parent
    snapshot's files forward plus df's.

    Crash-safety by construction, step order:
      (1) write data to a fresh never-referenced prefix   — crash: stray
          bytes only, table untouched, reads unaffected;
      (2) create the snapshot manifest with PUT-if-absent — THE commit
          point; losing the race aborts cleanly (own prefix removed,
          ``ConcurrentCommitError``), winning makes the version durable;
      (3) swap the pointer (monotonic)                     — publish only;
          crash before it leaves a committed-but-unpublished version that
          the NEXT commit adopts as its parent and publishes.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    # Parent = newest COMMITTED version (adopt an unpublished orphan if a
    # prior writer died after step 2 — its commit is durable history).
    parent = _latest_committed_version(root)
    txns: dict[str, int] = {}
    if parent is not None:
        txns = read_snapshot(root, parent).txn_map
        if txn is not None and txns.get(txn[0], -1) >= txn[1]:
            # This (app, transaction) already landed — a retried streaming
            # micro-batch or speculative re-run. Idempotent no-op.
            return read_snapshot(root, parent)
    if txn is not None:
        txns[txn[0]] = txn[1]
    if parent is None and mode == "append":
        mode = "overwrite"  # first commit: nothing to append to
    new_version = (parent or 0) + 1
    prefix = os.path.join(_DATA_DIR, f"v{new_version:08d}-{uuid.uuid4().hex[:8]}")
    prefix_abs = os.path.join(root, prefix)
    df.write.mode("error").parquet(prefix_abs)  # step 1: fresh prefix only

    files = _list_parquet(prefix_abs, root)
    # Per-file min/max column stats (scan-pruning metadata). New files
    # only — on append, the parent's entries carry forward untouched
    # (files are immutable, so their stats are too).
    stats = _collect_file_stats(root, files, stats_cols) if stats_cols else ()
    if mode == "append":
        parent_snap = read_snapshot(root, parent)
        files = sorted([*parent_snap.files, *files])
        stats = tuple(sorted([*parent_snap.stats, *stats]))
    snap = Snapshot(
        version=new_version,
        files=tuple(files),
        operation=_operation or mode,
        parent=parent,
        txn=tuple(sorted(txns.items())),
        stats=stats,
    )
    try:
        # Step 2: PUT-if-absent on the version — the commit CAS.
        with open(_snapshot_path(root, new_version), "x", encoding="utf-8") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError:
        shutil.rmtree(prefix_abs, ignore_errors=True)  # own artifacts only
        raise ConcurrentCommitError(
            f"table {root}: v{new_version} was committed by another writer"
        ) from None

    _swap_pointer(root, snap)  # step 3: publish
    return snap


def commit_stream_append(
    stream: DataFrame, root: str, checkpoint: str, app_id: str = "stream"
) -> None:
    """Streaming table sink with EXACTLY-ONCE appends: each micro-batch
    commits as a manifest append tagged ``txn=(app_id, batch_id)``. When a
    failed/restarted query re-delivers a micro-batch (foreachBatch is
    at-least-once by contract), the retry sees its (app, batch) already in
    the current snapshot's txn map and no-ops — at-least-once delivery +
    idempotent commit = exactly-once table contents. Drains what's
    available, then returns (AvailableNow)."""
    (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: commit(
                bdf, root, mode="append", txn=(app_id, bid)
            )
            and None
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
) -> Snapshot:
    """Rewrite the current snapshot's many small files as ~target-sized
    ones, committed as a new version (operation='compact'). Readers of the
    old snapshot keep working throughout — data files are immutable, so
    compaction is just a new file list; there is no swap window at all
    (contrast sinks.compact_small_files, the local-FS rename fallback).

    Sizing uses the manifest's own file list (driver-side stat of listed
    files — no directory walk, no data pass), then one shuffle-free
    coalesce when shrinking.
    """
    import math

    snap = read_snapshot(root)
    total = sum(os.path.getsize(os.path.join(root, f)) for f in snap.files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = read_table(spark, root)
    # Guarded probe — never .rdd a plan with a shuffle (AQE double-exec).
    from .readers import safe_num_partitions

    cur = safe_num_partitions(df, default=0)
    out = df.coalesce(n_out) if n_out <= cur else df.repartition(n_out)
    return commit(
        out, root, mode="overwrite", _operation="compact", stats_cols=stats_cols
    )


def vacuum(root: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by snapshots older than the last
    ``keep_last`` — the GC step that makes old versions unreadable.
    Never touches files the retained snapshots still share (append/compact
    lineages overlap). Returns the deleted paths (root-relative)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    # Committed (not merely published) newest — never GC an unpublished
    # orphan a dead writer committed; the next commit will adopt it.
    cur = _latest_committed_version(root)
    if cur is None:
        return []
    versions = sorted(
        int(f[1:9])
        for f in os.listdir(os.path.join(root, _MANIFEST_DIR))
        if f.startswith("v") and f.endswith(".json")
    )
    keep = {v for v in versions if v > cur - keep_last and v <= cur}
    keep.add(cur)
    # The PUBLISHED version can trail the newest committed one (writer died
    # between manifest commit and pointer publish — the crash window
    # tests/test_table_commit.py exercises). Readers resolve through the
    # pointer, so GC'ing the published snapshot would leave MANIFEST.json
    # dangling; always retain it too.
    pub = current_version(root)
    if pub is not None:
        keep.add(pub)
    live: set[str] = set()
    for v in keep:
        live.update(read_snapshot(root, v).files)
    removed: list[str] = []
    for v in versions:
        if v in keep:
            continue
        for f in read_snapshot(root, v).files:
            if f not in live and os.path.exists(os.path.join(root, f)):
                os.remove(os.path.join(root, f))
                removed.append(f)
        os.remove(_snapshot_path(root, v))
    # Drop data prefixes emptied by the removals.
    data_root = os.path.join(root, _DATA_DIR)
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            p = os.path.join(data_root, d)
            if os.path.isdir(p) and not _list_parquet(p, root):
                shutil.rmtree(p)
    return sorted(removed)
