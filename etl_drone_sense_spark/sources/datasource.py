"""Custom Python DataSource for drone-telemetry landings (PySpark 4 API).

The reference's source is one HTTPS GET per scheduled run (task.ts:112-117)
— fine driver-side at one-tenant scale. The scale path declared in SURVEY
§2 A1 is a proper Spark data source: this module implements it with the
PySpark 4 ``DataSource`` API so a landing directory of JSON-line files
reads as ``spark.read.format("dronesense").load(path)`` with

* one partition per landing file (executor-parallel ingest — the driver
  never touches payload bytes);
* the declared DroneSenseLocation schema (decode-or-throw per record,
  reference task.ts:119-121 semantics).

For a live feed, ``partitions()`` would enumerate API pages/tenants
instead of files — the read path is identical.

STREAMING: the same format also reads as
``spark.readStream.format("dronesense").load(path)`` — the reference is a
*scheduled* poll (task.ts:86-87 ``InvocationType.Schedule``), and a
``DataSourceStreamReader`` models exactly that natively: the offset is
the count of landing files ingested (files are append-only and sorted by
name, the object-store landing convention), each micro-batch plans one
partition per NEW file, and executors decode the payloads. Checkpointed
offsets give exactly-once across restarts for free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..schemas import DRONE_LOCATION_SCHEMA


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _landing_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".json", ".jsonl"))
        )
    return [path]


def _read_jsonl(path: str):
    """Decode-or-throw generator over one landing file (task.ts:119-121
    semantics) — shared by the batch and streaming read paths."""
    fields = [f.name for f in DRONE_LOCATION_SCHEMA.fields]
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)  # malformed line raises: decode-or-throw
            sensors = [
                (
                    s["id"],
                    s["name"],
                    s.get("video_url"),
                    s.get("rtsp_url"),
                )
                for s in rec.get("sensors", [])
            ]
            yield tuple(sensors if f == "sensors" else rec[f] for f in fields)


class DroneSenseDataSource(DataSource):
    """``format("dronesense")`` — JSON-line drone telemetry landings."""

    @classmethod
    def name(cls) -> str:
        return "dronesense"

    def schema(self):
        return DRONE_LOCATION_SCHEMA

    def reader(self, schema) -> "DroneSenseReader":
        return DroneSenseReader(self.options)

    def streamReader(self, schema) -> "DroneSenseStreamReader":
        return DroneSenseStreamReader(self.options)


class DroneSenseReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dronesense source requires a path")

    def partitions(self):
        return [_FilePartition(p) for p in _landing_files(self.path)]

    def read(self, partition: _FilePartition):
        yield from _read_jsonl(partition.path)


class AppendOnlyLandingStreamReader(DataSourceStreamReader):
    """GENERIC micro-batch reader over an append-only landing directory
    (r7: extracted from the dronesense reader so every landing-zone
    format — JSON lines, Avro containers — shares ONE hardened offset
    protocol instead of re-implementing it).

    Offsets are ``{"idx": n, "last": name}`` = number of (name-sorted)
    landing files consumed plus the NAME of the last one; landings must
    be append-only with monotonically-named files (``part-000001.jsonl``
    …), the standard object-store drop convention. The convention is
    ENFORCED, not trusted: if a file ever lands with a lexically earlier
    name than an already-consumed file, a bare index slice would silently
    re-read a consumed file and skip the newcomer (duplicate + data
    loss, ADVICE r5) — so planning asserts the current sorted listing is
    a prefix-extension of what was consumed and raises loudly otherwise.
    Planning is driver-side metadata only; payload decode happens on
    executors, one partition per new file — identical scale posture to
    the batch readers.

    Subclasses provide ``_list()`` (the sorted landing listing) and
    ``_rows(path)`` (the per-file row iterator)."""

    def _list(self) -> list[str]:  # pragma: no cover - abstract
        raise NotImplementedError

    def _rows(self, path: str):  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def _prefix_hash(files: list[str], n: int) -> str:
        import hashlib

        names = "\n".join(os.path.basename(f) for f in files[:n])
        return hashlib.md5(names.encode()).hexdigest()

    @classmethod
    def _check_prefix(cls, files: list[str], offset: dict) -> None:
        """The current listing's first idx names must hash to exactly the
        consumed prefix recorded in the offset. A bare last-name check
        misses the removal+insertion combination (retention deletes a
        consumed file while a lexically-earlier one lands: position idx-1
        still shows the right name, but position 0 now holds an unread
        file the index slice will never visit — review catch r6); the
        prefix hash catches any reshuffle of the consumed range."""
        idx = offset.get("idx", 0)
        if idx == 0:
            return
        h = offset.get("h")
        ok = (
            len(files) >= idx
            and (h is None or cls._prefix_hash(files, idx) == h)
            # legacy offsets (no hash) keep the last-name check
            and (
                h is not None
                or offset.get("last") is None
                or os.path.basename(files[idx - 1]) == offset.get("last")
            )
        )
        if not ok:
            raise RuntimeError(
                "dronesense landing violated the monotonic-naming "
                f"convention: offset {idx} no longer names the same "
                "consumed prefix in the sorted listing — a "
                "lexically-earlier file arrived after consumption or a "
                "consumed file was removed. Refusing to plan a batch "
                "that would duplicate/skip data."
            )

    def initialOffset(self) -> dict:
        # h is None, not a hash of the empty prefix: nothing was consumed,
        # and _check_prefix never reads h at idx 0 anyway
        return {"idx": 0, "last": None, "h": None}

    def latestOffset(self) -> dict:
        files = self._list()
        return {
            "idx": len(files),
            "last": os.path.basename(files[-1]) if files else None,
            "h": self._prefix_hash(files, len(files)),
        }

    def partitions(self, start: dict, end: dict):
        files = self._list()
        self._check_prefix(files, start)
        self._check_prefix(files, end)
        return [
            _FilePartition(p) for p in files[start["idx"] : end["idx"]]
        ]

    def read(self, partition: _FilePartition):
        yield from self._rows(partition.path)

    def commit(self, end: dict) -> None:
        # Landing files are immutable; nothing to clean up. A production
        # variant would age out files older than the committed offset.
        pass


class DroneSenseStreamReader(AppendOnlyLandingStreamReader):
    """The drone-telemetry landing stream (JSON lines), on the shared
    append-only offset protocol."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dronesense source requires a path")

    def _list(self) -> list[str]:
        return _landing_files(self.path)

    def _rows(self, path: str):
        yield from _read_jsonl(path)


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(DroneSenseDataSource)
