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

import base64
import decimal
import hashlib
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
    operation: str  # "overwrite" | "append" | "compact" | "rename" | "drop"
    parent: int | None
    txn: tuple[tuple[str, int], ...] = ()
    # Per-file column statistics for scan pruning: (file, json-of-
    # {col: [min, max]}) pairs — the Iceberg/Delta manifest-stats shape.
    # Stored as rendered JSON strings so the dataclass stays hashable.
    stats: tuple[tuple[str, str], ...] = ()
    # Logical schema as (field_id, current_name) pairs — Iceberg field-ID
    # semantics: renames rebind a NAME to a stable id; drops remove the id;
    # a re-added name gets a FRESH id, so old files' physical columns can
    # never leak into it. Empty on legacy snapshots (pre-evolution tables).
    schema: tuple[tuple[int, str], ...] = ()
    # Per-file write-time mapping (file, json-of-{physical_name: field_id}):
    # how each immutable file's physical columns bind to field ids. Carried
    # forward like stats; reads resolve through it.
    file_fields: tuple[tuple[str, str], ...] = ()
    # Per-file bloom filters for EQUALITY skipping on high-cardinality
    # columns where min/max can't prune (a uniform id column spans every
    # file's [min,max]): (file, json-of-{col: "m:k:base64(bits)"}).
    # Same carry-forward rules as stats; absent blooms never prune.
    blooms: tuple[tuple[str, str], ...] = ()

    @property
    def txn_map(self) -> dict[str, int]:
        return dict(self.txn)

    @property
    def stats_map(self) -> dict[str, dict]:
        return {f: json.loads(s) for f, s in self.stats}

    @property
    def file_fields_map(self) -> dict[str, dict[str, int]]:
        return {f: json.loads(s) for f, s in self.file_fields}

    @property
    def blooms_map(self) -> dict[str, dict[str, str]]:
        return {f: json.loads(s) for f, s in self.blooms}

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "parent": self.parent,
                "files": list(self.files),
                "txn": dict(self.txn),
                "stats": {f: json.loads(s) for f, s in self.stats},
                "schema": [[i, n] for i, n in self.schema],
                "file_fields": {f: json.loads(s) for f, s in self.file_fields},
                "blooms": {f: json.loads(s) for f, s in self.blooms},
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
            schema=tuple((int(i), n) for i, n in d.get("schema", [])),
            file_fields=tuple(
                sorted(
                    (f, json.dumps(m, sort_keys=True))
                    for f, m in d.get("file_fields", {}).items()
                )
            ),
            blooms=tuple(
                sorted(
                    (f, json.dumps(m, sort_keys=True))
                    for f, m in d.get("blooms", {}).items()
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


def _effective_schema(
    root: str, snap: Snapshot
) -> tuple[tuple[tuple[int, str], ...], tuple[tuple[str, str], ...]]:
    """The snapshot's (schema, file_fields), bootstrapping a LEGACY
    snapshot (pre-evolution, nothing recorded) from its first file's
    footer: ids 1..n in physical order, one epoch covering all its files
    (legacy tables in this repo are schema-stable by construction)."""
    if snap.schema or not snap.files:
        return snap.schema, snap.file_fields
    import pyarrow.parquet as pq

    phys = pq.read_schema(os.path.join(root, snap.files[0])).names
    schema = tuple((i + 1, n) for i, n in enumerate(phys))
    boot = json.dumps({n: i + 1 for i, n in enumerate(phys)}, sort_keys=True)
    return schema, tuple((f, boot) for f in snap.files)


def _metadata_commit(root: str, operation: str, schema_fn) -> Snapshot:
    """Commit a METADATA-ONLY new version: same files/stats/txn as the
    parent, schema transformed by ``schema_fn``. Concurrency-safe the same
    way data commits are — the snapshot manifest is created PUT-if-absent
    (losing the race raises ConcurrentCommitError), then published via the
    monotonic pointer swap. No data is touched, so there is nothing to
    clean up on abort."""
    parent = _latest_committed_version(root)
    if parent is None:
        raise FileNotFoundError(f"no committed table at {root}")
    parent_snap = read_snapshot(root, parent)
    schema, file_fields = _effective_schema(root, parent_snap)
    snap = Snapshot(
        version=parent + 1,
        files=parent_snap.files,
        operation=operation,
        parent=parent,
        txn=parent_snap.txn,
        stats=parent_snap.stats,
        schema=schema_fn(schema),
        file_fields=file_fields,
        blooms=parent_snap.blooms,
    )
    try:
        with open(_snapshot_path(root, snap.version), "x", encoding="utf-8") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError:
        raise ConcurrentCommitError(
            f"table {root}: v{snap.version} was committed by another writer"
        ) from None
    _swap_pointer(root, snap)
    return snap


def rollback(root: str, to_version: int) -> Snapshot:
    """Roll the table back to ``to_version`` — as a NEW commit whose
    content (files/stats/schema) is the old snapshot's, Iceberg
    ``rollback_to_snapshot`` style. History only ever moves forward: the
    pointer stays monotonic, the bad intermediate versions remain
    time-travel-readable (and vacuum-able), and concurrent writers race
    through the same PUT-if-absent CAS as every other commit."""
    old = read_snapshot(root, to_version)  # raises if GC'd/never existed
    parent = _latest_committed_version(root)
    if parent == to_version:
        return old  # already current — no version churn
    schema, file_fields = _effective_schema(root, old)
    cur = read_snapshot(root, parent)
    snap = Snapshot(
        version=parent + 1,
        files=old.files,
        operation="rollback",
        parent=parent,
        txn=cur.txn,  # txn watermarks survive: replayed batches stay no-ops
        stats=old.stats,
        schema=schema,
        file_fields=file_fields,
        blooms=old.blooms,
    )
    try:
        with open(_snapshot_path(root, snap.version), "x", encoding="utf-8") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError:
        raise ConcurrentCommitError(
            f"table {root}: v{snap.version} was committed by another writer"
        ) from None
    _swap_pointer(root, snap)
    return snap


def clone_table(src_root: str, dst_root: str, version: int | None = None) -> Snapshot:
    """SHALLOW (zero-copy) clone — the Delta ``CLONE`` shape: a NEW
    table whose first snapshot lists the SOURCE version's data files by
    ABSOLUTE path. No bytes move; the clone costs one manifest write
    regardless of table size (the 100 TB dev/test-branch primitive).
    Because files are immutable and reads resolve entries through
    ``os.path.join(root, f)`` — a no-op for absolute paths — the clone
    and the source evolve INDEPENDENTLY afterwards: the clone's own
    commits write under ITS root, and neither table's
    rollback/overwrite can touch the other's manifests. The one shared
    fate is retention: vacuuming the SOURCE can delete files a clone
    still references (exactly Delta's documented shallow-clone caveat —
    callers wanting full isolation deep-copy instead).

    Stats/blooms/field-id mappings carry over re-keyed to the absolute
    paths, so file skipping and schema evolution work on the clone
    from the first read. ``txn`` starts EMPTY: the clone is a new
    writer application and must not inherit idempotence watermarks that
    would silently swallow its own first micro-batches."""
    src = read_snapshot(src_root, version)
    schema, file_fields = _effective_schema(src_root, src)

    def _abs(f: str) -> str:
        return f if os.path.isabs(f) else os.path.abspath(
            os.path.join(src_root, f)
        )

    remap = {f: _abs(f) for f in src.files}
    snap = Snapshot(
        version=1,
        files=tuple(sorted(remap.values())),
        operation="clone",
        parent=None,
        txn=(),
        stats=tuple(sorted((remap[f], v) for f, v in src.stats if f in remap)),
        schema=schema,
        file_fields=tuple(
            sorted((remap[f], v) for f, v in file_fields if f in remap)
        ),
        blooms=tuple(
            sorted((remap[f], v) for f, v in src.blooms if f in remap)
        ),
    )
    os.makedirs(os.path.join(dst_root, _MANIFEST_DIR), exist_ok=True)
    try:
        with open(_snapshot_path(dst_root, 1), "x", encoding="utf-8") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError:
        raise ConcurrentCommitError(
            f"table {dst_root}: v1 was committed by another writer"
        ) from None
    _swap_pointer(dst_root, snap)
    return snap


def rename_column(root: str, old: str, new: str) -> Snapshot:
    """Rename a column WITHOUT rewriting any data (Iceberg field-ID
    rename): the field keeps its id, the id binds to the new name, and
    every existing file keeps serving it through its write-time mapping.
    Old snapshots still read under the old name (time travel is
    schema-versioned too)."""

    def fn(schema):
        names = {n for _, n in schema}
        if old not in names:
            raise ValueError(f"no such column: {old!r}")
        if new in names:
            raise ValueError(f"column already exists: {new!r}")
        return tuple((i, new if n == old else n) for i, n in schema)

    return _metadata_commit(root, "rename", fn)


def drop_column(root: str, name: str) -> Snapshot:
    """Drop a column WITHOUT rewriting any data: the field id leaves the
    schema, so reads stop projecting it — the bytes remain in the
    immutable files (and in older snapshots, which still read it). A
    later commit re-adding the same name mints a FRESH field id, so the
    orphaned bytes can never resurface under the new field."""

    def fn(schema):
        if name not in {n for _, n in schema}:
            raise ValueError(f"no such column: {name!r}")
        if len(schema) == 1:
            raise ValueError("cannot drop the only column")
        return tuple((i, n) for i, n in schema if n != name)

    return _metadata_commit(root, "drop", fn)


def _read_files_mapped(
    spark: SparkSession, root: str, snap: Snapshot, files: list[str]
) -> DataFrame:
    """Field-ID-resolved scan of ``files``: group files by their write-time
    {physical_name: field_id} mapping (one EPOCH per distinct write schema
    — renames/drops are rare, so epochs stay few), scan each epoch once
    (pushdown/pruning intact per scan), alias physical → current names,
    and union by name. A field a whole epoch predates null-fills through
    ``allowMissingColumns`` — exactly Iceberg's read-time projection."""
    from pyspark.sql import functions as F

    ff = snap.file_fields_map
    cur_names = dict(snap.schema)  # id -> current name
    epochs: dict[str, list[str]] = {}
    for f in files:
        epochs.setdefault(json.dumps(ff.get(f, {}), sort_keys=True), []).append(f)
    parts = []
    for key, group in sorted(epochs.items()):
        phys_to_id = json.loads(key)
        id_to_phys = {i: p for p, i in phys_to_id.items()}
        df = spark.read.parquet(*(os.path.join(root, f) for f in group))
        cols = [
            F.col(id_to_phys[i]).alias(name)
            for i, name in snap.schema
            if i in id_to_phys
        ]
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    # Fix the column order to the logical schema (union order can differ).
    return out.select(*[name for _, name in snap.schema if name in out.columns])


def read_table(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the table AS OF a snapshot (default: current) — scans exactly
    the files that snapshot lists, nothing else. Stray files from aborted
    writes are invisible because reads never list directories.

    Snapshots that carry a field-ID schema (any table committed since
    schema evolution landed) resolve physical columns through the per-file
    mapping — renamed columns read under their CURRENT name from files
    written under the old one, dropped columns disappear even though the
    bytes remain, and a re-added name never resurrects old data (fresh
    field id). Legacy snapshots read the raw file union as before.

    ``merge_schema=True`` (legacy path only) unions the file schemas
    (Spark mergeSchema): rows from older files read NULL for a column an
    append added. The field-ID path subsumes it."""
    snap = read_snapshot(root, version)
    if not snap.files:
        raise ValueError(f"snapshot v{snap.version} of {root} is empty")
    if snap.schema:
        return _read_files_mapped(spark, root, snap, list(snap.files))
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


# --- per-file bloom filters (equality skipping) ----------------------------
#
# min/max stats prune RANGE predicates but are useless for point lookups on
# a high-cardinality unclustered column (every file's [min,max] spans the
# whole id space). The Delta/Iceberg answer is a tiny per-file bloom filter
# in the manifest: a definite "value not in this file" skips the file, a
# maybe opens it — false positives only cost a read, never correctness.

BLOOM_MIN_M_BITS = 8192  # floor: 1 KiB/bitset
BLOOM_MAX_M_BITS = 1 << 22  # cap: 512 KiB/bitset (manifest-size guard)
BLOOM_K = 6


def _bloom_m_bits(n_values: int) -> int:
    """Bitset size for ~1% FP at k=6: m ≈ 10·n, rounded up to a power of
    two, clamped to [1 KiB, 512 KiB]. Sizing from the FILE'S OWN value
    count matters: a fixed m saturates on big files (at m=8192 a file
    with ~19k values probes ~100% positive — the bloom silently stops
    pruning while looking healthy; review catch r5)."""
    m = BLOOM_MIN_M_BITS
    while m < 10 * max(n_values, 1) and m < BLOOM_MAX_M_BITS:
        m <<= 1
    return m


def _bloom_key(v) -> bytes:
    """Canonical hash input for a value. ALL numeric-like representations
    of one value must hash identically — a parquet DECIMAL(12,2) file
    stores ``Decimal('42.00')`` while the probe passes int ``42``, and a
    mismatch here is a bloom FALSE NEGATIVE: the file is silently skipped
    although it holds matching rows, violating the "false positives only
    cost a read, never correctness" contract (ADVICE r5). So: numpy
    scalars unwrap to Python, Decimals collapse to int (integral) or the
    nearest double (fractional — both sides round-trip through the same
    float64, so equal values still collide), integral floats collapse to
    int. date/datetime str() forms are already canonical ISO text and
    match string probes."""
    if isinstance(v, bool):
        return f"b:{v}".encode()
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    return str(v).encode()


def _bloom_indices(v, m: int, k: int = BLOOM_K) -> list[int]:
    d = hashlib.md5(_bloom_key(v)).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_encode(bits: bytearray, m: int, k: int) -> str:
    return f"{m}:{k}:" + base64.b64encode(bytes(bits)).decode()


def _bloom_might_contain(encoded: str, v) -> bool:
    m_s, k_s, b64 = encoded.split(":", 2)
    m, k = int(m_s), int(k_s)
    bits = base64.b64decode(b64)
    for i in _bloom_indices(v, m, k):
        if not (bits[i // 8] >> (i % 8)) & 1:
            return False
    return True


def _collect_file_blooms(
    root: str, files: list[str], cols: list[str]
) -> tuple[tuple[str, str], ...]:
    """Per-file bloom bitsets over each column's values. Locally this is a
    driver-side pyarrow column read per new file; at scale it is computed
    by the WRITING task (which already has the rows in hand) and returned
    with the file's stats — same posture as ``_collect_file_stats``.
    Columns absent from a file simply get no bloom there (never prunes)."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        pf = pq.ParquetFile(os.path.join(root, f))
        present = [c for c in cols if c in pf.schema_arrow.names]
        blooms: dict[str, str] = {}
        if present:
            tbl = pf.read(columns=present)
            for c in present:
                vals = [v for v in tbl.column(c).to_pylist() if v is not None]
                m = _bloom_m_bits(len(vals))
                bits = bytearray(m // 8)
                for v in vals:
                    for i in _bloom_indices(v, m):
                        bits[i // 8] |= 1 << (i % 8)
                blooms[c] = _bloom_encode(bits, m, BLOOM_K)
        out.append((f, json.dumps(blooms, sort_keys=True)))
    return tuple(sorted(out))


def _phys_name_resolver(snap: "Snapshot", col: str):
    """file → the physical column name that binds to ``col``'s field id in
    that file (identity on legacy snapshots without field-ID schemas)."""
    if snap.schema:
        field_id = {n: i for i, n in snap.schema}.get(col)
        ff = snap.file_fields_map

        def phys_name(f: str) -> str:
            inv = {i: p for p, i in ff.get(f, {}).items()}
            return inv.get(field_id, col)

        return phys_name
    return lambda f: col


def _bloom_pruned_files(snap: "Snapshot", col: str, value) -> list[str]:
    blooms = snap.blooms_map
    phys = _phys_name_resolver(snap, col)
    return [
        f
        for f in snap.files
        if (b := blooms.get(f, {}).get(phys(f))) is None
        or _bloom_might_contain(b, value)
    ]


def bloom_pruned_file_count(
    root: str, col: str, value, version: int | None = None
) -> int:
    """How many files an equality probe on ``col`` would open."""
    snap = read_snapshot(root, version)
    return len(_bloom_pruned_files(snap, col, value))


def read_table_bloom_probe(
    spark: SparkSession,
    root: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point-lookup scan with BLOOM file skipping: files whose committed
    bloom definitively excludes ``value`` are never opened; files without
    a bloom for ``col`` are always read (pruning is an optimization, never
    a correctness dependency — bloom false positives just mean an extra
    file read, filtered exactly on top). Resolves physical names per
    write-schema epoch like ``read_table_pruned``, so probes keep skipping
    across column renames."""
    snap = read_snapshot(root, version)
    keep = _bloom_pruned_files(snap, col, value)
    from pyspark.sql import functions as F

    if not keep:
        return read_table(spark, root, version).filter(F.col(col) == value).limit(0)
    if snap.schema:
        df = _read_files_mapped(spark, root, snap, keep)
    else:
        df = spark.read.parquet(*(os.path.join(root, f) for f in keep))
    return df.filter(F.col(col) == value)


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
    with the unpruned scan). ``col`` is the CURRENT logical name; on a
    field-ID snapshot each file's stats are consulted under the physical
    name that file was written with, so pruning keeps working across
    renames."""
    snap = read_snapshot(root, version)
    keep = _pruned_files(snap, col, lo, hi)
    from pyspark.sql import functions as F

    if not keep:
        return (
            read_table(spark, root, version)
            .filter(F.col(col).between(lo, hi))
            .limit(0)
        )
    if snap.schema:
        df = _read_files_mapped(spark, root, snap, keep)
    else:
        df = spark.read.parquet(*(os.path.join(root, f) for f in keep))
    return df.filter(F.col(col).between(lo, hi))


def _pruned_files(snap: Snapshot, col: str, lo, hi) -> list[str]:
    stats = snap.stats_map
    phys_name = _phys_name_resolver(snap, col)
    return [
        f
        for f in snap.files
        if (s := stats.get(f, {}).get(phys_name(f))) is None
        or (s[1] >= lo and s[0] <= hi)
    ]


def pruned_file_count(root: str, col: str, lo, hi, version: int | None = None) -> int:
    """How many files a [lo, hi] predicate on ``col`` would open."""
    snap = read_snapshot(root, version)
    return len(_pruned_files(snap, col, lo, hi))


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
    bloom_cols: list[str] | None = None,
    _replace_files: frozenset[str] | None = None,
) -> Snapshot:
    """Commit ``df`` as a new table version. ``mode='overwrite'`` makes the
    new snapshot exactly df's files; ``'append'`` carries the parent
    snapshot's files forward plus df's. ``stats_cols`` records per-file
    min/max (range skipping); ``bloom_cols`` records per-file bloom
    bitsets (equality skipping for high-cardinality columns min/max
    can't prune).

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
    parent_snap = read_snapshot(root, parent) if parent is not None else None
    txns: dict[str, int] = {}
    if parent_snap is not None:
        txns = parent_snap.txn_map
        if txn is not None and txns.get(txn[0], -1) >= txn[1]:
            # This (app, transaction) already landed — a retried streaming
            # micro-batch or speculative re-run. Idempotent no-op.
            return parent_snap
    if txn is not None:
        txns[txn[0]] = txn[1]
    if parent is None and mode == "append":
        mode = "overwrite"  # first commit: nothing to append to
    if _replace_files:
        # The rewrite set must still be LIVE in the parent this commit
        # actually lands on (r15 ADVICE): migrate_layout resolved it from
        # read_snapshot(), but a writer landing in between (e.g. compact()
        # rewriting one of the same files) would make the drop a silent
        # no-op for files no longer in the parent — the migration would
        # commit cleanly with those rows DUPLICATED (the racer's copy +
        # our rewrite). Iceberg's rewrite_data_files validates the same
        # way. TOCTOU after this check is closed by the CAS itself: any
        # later-landing writer bumps the version, so our PUT-if-absent
        # fails and we abort in step 2.
        if mode != "append" or parent_snap is None:
            raise ValueError(
                "_replace_files requires mode='append' on an existing "
                "table: replacement is an edit of the parent manifest, "
                "and overwrite/first-commit would silently ignore it"
            )
        gone = _replace_files - set(parent_snap.files)
        if gone:
            raise ConcurrentCommitError(
                f"table {root}: {len(gone)} file(s) to be replaced are no "
                f"longer in parent v{parent_snap.version} (concurrent "
                f"rewrite landed); aborting instead of duplicating rows: "
                f"{sorted(gone)[:3]}"
            )

    # Field-ID bookkeeping (Iceberg semantics): a df column whose name
    # matches the parent schema keeps that field's id; an unknown name is
    # a NEW field with a fresh id — even if a same-named column existed
    # once and was dropped, old bytes can't bind to the new field.
    if parent_snap is not None:
        parent_schema, parent_file_fields = _effective_schema(root, parent_snap)
    else:
        parent_schema, parent_file_fields = (), ()
    name_to_id = {n: i for i, n in parent_schema}
    # Fresh ids must dodge every id ANY retained file still binds — a
    # dropped field leaves the schema but its id lives on in old files'
    # mappings, and reusing it would rebind those orphaned bytes to the
    # new field (exactly the leak field ids exist to prevent).
    used_ids = {i for i, _ in parent_schema}
    for _, s in parent_file_fields:
        used_ids.update(json.loads(s).values())
    next_id = max(used_ids, default=0) + 1
    mapping: dict[str, int] = {}
    for c in df.columns:
        if c in name_to_id:
            mapping[c] = name_to_id[c]
        else:
            mapping[c] = next_id
            next_id += 1
    if mode == "overwrite":
        schema = tuple((mapping[c], c) for c in df.columns)
    else:
        schema = parent_schema + tuple(
            (mapping[c], c) for c in df.columns if c not in name_to_id
        )

    new_version = (parent or 0) + 1
    prefix = os.path.join(_DATA_DIR, f"v{new_version:08d}-{uuid.uuid4().hex[:8]}")
    prefix_abs = os.path.join(root, prefix)
    df.write.mode("error").parquet(prefix_abs)  # step 1: fresh prefix only

    files = _list_parquet(prefix_abs, root)
    # Per-file min/max column stats (scan-pruning metadata). New files
    # only — on append, the parent's entries carry forward untouched
    # (files are immutable, so their stats are too).
    stats = _collect_file_stats(root, files, stats_cols) if stats_cols else ()
    blooms = _collect_file_blooms(root, files, bloom_cols) if bloom_cols else ()
    new_ff_json = json.dumps(mapping, sort_keys=True)
    file_fields = tuple((f, new_ff_json) for f in files)
    if mode == "append":
        # _replace_files (internal, used by migrate_layout): parent
        # entries for these files do NOT carry forward — the new files
        # REPLACE them in the child manifest. The data files themselves
        # stay on disk, still referenced by every older version, so time
        # travel keeps reading the pre-replacement layout.
        drop = _replace_files or frozenset()
        files = sorted(
            [*(f for f in parent_snap.files if f not in drop), *files]
        )
        stats = tuple(
            sorted([*(s for s in parent_snap.stats if s[0] not in drop), *stats])
        )
        blooms = tuple(
            sorted(
                [*(b for b in parent_snap.blooms if b[0] not in drop), *blooms]
            )
        )
        file_fields = tuple(
            sorted(
                [
                    *(ff for ff in parent_file_fields if ff[0] not in drop),
                    *file_fields,
                ]
            )
        )
    snap = Snapshot(
        version=new_version,
        files=tuple(files),
        operation=_operation or mode,
        parent=parent,
        txn=tuple(sorted(txns.items())),
        stats=stats,
        schema=schema,
        file_fields=file_fields,
        blooms=blooms,
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


class NonAppendChangeError(RuntimeError):
    """The table history between two consumed versions contains a
    non-append operation (overwrite/compact/rollback) — an incremental
    reader would re-deliver rewritten rows. Pass ``ignore_changes=True``
    to consume the file diff anyway (Delta's ``ignoreChanges``)."""


def process_table_appends(
    spark: SparkSession,
    root: str,
    checkpoint_file: str,
    handle,
    ignore_changes: bool = False,
) -> int:
    """Incremental consumption of a managed table — the Delta streaming-
    source shape, as an explicit AvailableNow-style drain: each call
    diffs the current PUBLISHED snapshot's file list against the last
    checkpointed version, reads only the NEW files as one batch
    DataFrame (field-ID-resolved, so renames don't break consumers), and
    invokes ``handle(batch_df, version)``. The checkpoint (a tiny json,
    atomically replaced) advances only after ``handle`` returns.

    Delivery is AT-LEAST-ONCE across crashes (a death between handle and
    checkpoint replays the batch); composing with ``commit(...,
    txn=(app_id, version))`` in the handler makes the PIPELINE exactly-
    once — the replayed version no-ops at the sink, the same contract as
    commit_stream_append. History walking: every version between the
    checkpoint and the head must still have its manifest (vacuum can
    remove them — reset the checkpoint if so) and must be an append,
    unless ``ignore_changes`` accepts re-delivery of rewritten files.

    Returns the number of NEW files processed (0 = nothing to do;
    an empty diff after a non-append change still advances the
    checkpoint)."""
    cur = current_version(root)
    if cur is None:
        return 0
    last = 0
    try:
        with open(checkpoint_file, encoding="utf-8") as f:
            last = json.load(f)["version"]
    except FileNotFoundError:
        pass
    if cur <= last:
        return 0
    snap = read_snapshot(root, cur)
    if last > 0 and not ignore_changes:
        v = cur
        while v is not None and v > last:
            step = read_snapshot(root, v)  # FileNotFoundError if vacuumed
            if step.operation != "append":
                raise NonAppendChangeError(
                    f"v{v} is {step.operation!r}, not append — rewritten "
                    "files would be re-delivered; pass ignore_changes=True "
                    "to accept that"
                )
            v = step.parent
    prev_files = set(read_snapshot(root, last).files) if last > 0 else set()
    new_files = [f for f in snap.files if f not in prev_files]
    if new_files:
        batch = (
            _read_files_mapped(spark, root, snap, new_files)
            if snap.schema
            else spark.read.parquet(*(os.path.join(root, f) for f in new_files))
        )
        handle(batch, cur)
    tmp = f"{checkpoint_file}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(json.dumps({"version": cur}))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, checkpoint_file)
    return len(new_files)


def compact(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
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
        out,
        root,
        mode="overwrite",
        _operation="compact",
        stats_cols=stats_cols,
        bloom_cols=bloom_cols,
    )


def migrate_layout(
    spark: SparkSession,
    root: str,
    layout_cols: list[str],
    n_files: int,
    files: list[str] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> Snapshot:
    """LAYOUT-MIGRATION COMPACTION (r15 — the write path of partition
    evolution; Iceberg's ``rewrite_data_files`` with a target spec):
    rewrite ``files`` (root-relative paths from the CURRENT snapshot;
    default all of them) under a new physical layout —
    ``repartitionByRange(n_files, *layout_cols)`` — and commit the
    result as one new version whose manifest carries every untouched
    file forward unchanged.

    Properties, all inherited from the manifest machinery rather than
    re-implemented:
      - ATOMIC: the rewrite is a single PUT-if-absent manifest commit
        (``commit``'s CAS); readers see either the old layout or the
        new one, never a mix, and a racing writer aborts cleanly.
      - TIME TRAVEL PRESERVED: data files are immutable and the old
        epoch's files stay on disk, still listed by every pre-migration
        manifest — ``read_table(root, version=v_old)`` keeps reading
        the OLD layout byte-for-byte. Only ``vacuum`` (with its
        retention window) ever reclaims them.
      - LOGICALLY INVARIANT: the child snapshot lists the same rows in
        differently-shaped files; a full read before and after must be
        row-identical (the registry query's hash oracle certifies it).
      - FIELD-ID EXACT: the rewritten files are read through the
        per-file field-id mapping (``_read_files_mapped``), so a table
        that was renamed/evolved mid-history migrates under its
        CURRENT logical schema and the new files bind current ids.

    Scale shape: the rewrite reads ONLY the files being migrated (an
    O(migrated-bytes) job, not O(table)) and shuffles once into the
    target range layout — exactly the amortized write-side shuffle the
    read-side pruning pays for. Old-epoch reads during the rewrite are
    untouched; the commit point is metadata-only."""
    snap = read_snapshot(root)
    target = set(snap.files) if files is None else set(files)
    unknown = target - set(snap.files)
    if unknown:
        raise ValueError(
            f"migrate_layout: not in the current snapshot: {sorted(unknown)}"
        )
    rewrite = [f for f in snap.files if f in target]
    if not rewrite:
        raise ValueError("migrate_layout: no files to migrate")
    if snap.schema:
        src = _read_files_mapped(spark, root, snap, rewrite)
    else:
        src = spark.read.parquet(*(os.path.join(root, f) for f in rewrite))
    out = src.repartitionByRange(n_files, *layout_cols)
    return commit(
        out,
        root,
        mode="append",
        _operation="migrate-layout",
        stats_cols=stats_cols,
        bloom_cols=bloom_cols,
        _replace_files=frozenset(rewrite),
    )


VACUUM_DEFAULT_MIN_AGE_S = 7 * 24 * 3600.0  # Delta's default retention window


def vacuum(
    root: str,
    keep_last: int = 1,
    min_age_seconds: float = VACUUM_DEFAULT_MIN_AGE_S,
) -> list[str]:
    """Delete data files referenced ONLY by snapshots older than the last
    ``keep_last`` — the GC step that makes old versions unreadable.
    Never touches files the retained snapshots still share (append/compact
    lineages overlap). Returns the deleted paths (root-relative).

    RETENTION WINDOW (Delta ``VACUUM`` safety check): a snapshot whose
    manifest is younger than ``min_age_seconds`` is retained regardless of
    ``keep_last`` — a concurrent time-travel reader resolves a version and
    opens its files NON-atomically, so GC'ing anything a recently-live
    reader could have resolved would hand it FileNotFound mid-scan. The
    7-day default mirrors Delta; tests and offline maintenance pass
    ``min_age_seconds=0.0`` explicitly to opt out of the guard the way
    Delta's ``retentionDurationCheck.enabled=false`` does."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import time

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
    if min_age_seconds > 0:
        horizon = time.time() - min_age_seconds
        keep.update(
            v for v in versions if os.path.getmtime(_snapshot_path(root, v)) > horizon
        )
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
