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
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import DRONE_LOCATION_SCHEMA


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DroneSenseDataSource(DataSource):
    """``format("dronesense")`` — JSON-line drone telemetry landings."""

    @classmethod
    def name(cls) -> str:
        return "dronesense"

    def schema(self):
        return DRONE_LOCATION_SCHEMA

    def reader(self, schema) -> "DroneSenseReader":
        return DroneSenseReader(self.options)


class DroneSenseReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dronesense source requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".json", ".jsonl"))
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        fields = [f.name for f in DRONE_LOCATION_SCHEMA.fields]
        with open(partition.path) as fh:
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
                yield tuple(
                    sensors if f == "sensors" else rec[f] for f in fields
                )


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(DroneSenseDataSource)
