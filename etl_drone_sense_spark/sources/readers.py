"""Source adapters.

Covers SURVEY §2 A1/A2 (HTTP source + typed decode) and Part B file-format
scans. All file readers take an explicit schema: at 100 TB schema inference
is a full extra pass, and a declared schema is what lets Catalyst prune
columns and push filters into the parquet footer.

Decode modes mirror the reference's decode-or-throw (task.ts:119-121):
* FAILFAST  — any malformed record aborts the job (reference behavior);
* PERMISSIVE — malformed rows land in ``_corrupt_record`` and can be routed
  to a quarantine sink (the scale-friendly default: one bad record out of
  10^11 should not kill a 6-hour job).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DRONE_LOCATION_SCHEMA, TPCH_SCHEMAS


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine's semantics depend on, set idempotently so
    queries behave identically under any host-created SparkSession:
    UTC session timezone (timestamp parity with the naive-UTC oracle)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def fixture_fingerprint(path: str) -> tuple[str, int, int]:
    """(probe file, mtime_ns, size) of a fixture's first parquet footer.
    The driver regenerates /root/testdata between rounds — any cache keyed
    on the PATH alone would serve stale decisions (ts unit, derived landing
    dirs) across a regeneration and corrupt every downstream timestamp by
    1000×. Keying on the footer's stat makes every such cache self-heal."""
    import os

    probe = path
    if os.path.isdir(path):
        probe = next(
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    st = os.stat(probe)
    return (probe, st.st_mtime_ns, st.st_size)


_TS_UNIT_CACHE: dict[tuple[str, int, int], str] = {}


def _events_ts_unit(path: str) -> str:
    """Parquet footer probe for the events ``ts`` physical unit ('us'/'ns').
    Fixture generations have shipped BOTH encodings (TIMESTAMP(NANOS)
    through round 3, TIMESTAMP(MICROS) from round 4) — trusting a doc
    instead of the footer silently corrupts every timestamp by 1000×.
    Driver-side metadata read of one footer, cached per footer stat (not
    per path: a mid-process fixture regeneration must re-probe)."""
    key = fixture_fingerprint(path)
    unit = _TS_UNIT_CACHE.get(key)
    if unit is None:
        import pyarrow.parquet as pq

        unit = pq.read_schema(key[0]).field("ts").type.unit
        _TS_UNIT_CACHE[key] = unit
    return unit


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema (TESTDATA.md)."""
    _ensure_session_confs(spark)
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        fields = [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
        if _events_ts_unit(path) == "ns":
            # TIMESTAMP(NANOS): Spark has no nanos type — read raw ns as
            # long, truncate to µs with integer `div` (a double division
            # would lose µs precision at 1e18), exactly as DuckDB's reader
            # does. Needs the legacy nanos-as-long read conf.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            fields[1] = T.StructField("ts", T.LongType())
            raw = spark.read.schema(T.StructType(fields)).parquet(path)
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return spark.read.schema(T.StructType(fields)).parquet(path)
    return spark.read.schema(TPCH_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


_SPLIT_DECISIONS: dict[str, bool] = {}

# A SHUFFLE exchange node prints as a standalone word ('Exchange
# hashpartitioning(...)', 'Exchange RoundRobinPartitioning(...)'); a
# broadcast build prints as the single token 'BroadcastExchange', which \b
# does not split. Matching the bare word keeps scan+broadcast-join plans —
# whose big side is NOT spread by the broadcast — eligible for rebalancing.
_SHUFFLE_EXCHANGE_RE = None  # compiled lazily to keep `re` out of import hot path


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange or a cache
    scan — i.e. converting plan→RDD under AQE would EXECUTE upstream
    stages (measured: 6.6 s of silent double execution probing a windowed
    subtree). BroadcastExchange alone does NOT count: its build side is a
    small dim and the probed big side stays stage-free."""
    global _SHUFFLE_EXCHANGE_RE
    if _SHUFFLE_EXCHANGE_RE is None:
        import re

        _SHUFFLE_EXCHANGE_RE = re.compile(r"\bExchange\b")
    # executedPlan, not sparkPlan: EnsureRequirements inserts the implicit
    # exchanges (groupBy/join shuffles) only at the preparation step, and
    # under AQE stringifying the un-executed AdaptiveSparkPlan prints the
    # initial plan without running any stage — planning cost only.
    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(_SHUFFLE_EXCHANGE_RE.search(plan)) or "InMemoryTableScan" in plan


def safe_num_partitions(df: DataFrame, default: int | None = None) -> int | None:
    """Partition count via ``df.rdd`` ONLY when the plan is shuffle-free
    (cheap driver-side conversion); otherwise returns ``default`` rather
    than silently double-executing shuffle stages under AQE. Every
    partition-count probe in the repo must go through here."""
    if plan_has_shuffle(df):
        return default
    return df.rdd.getNumPartitions()


def rebalance_for_compute(
    df: DataFrame, target: int | None = None, cache_key: str | None = None
) -> DataFrame:
    """Spread rows before a compute-heavy stage IF the source under-splits.

    Spark parallelizes a parquet scan at row-group granularity; a source
    laid out as few/huge row groups (the fixtures are one row group per
    table) pins the whole fused scan→project→partial-agg pipeline to one
    core. When the scan yields fewer partitions than ``target`` (default:
    cluster parallelism), a round-robin repartition buys full parallelism
    for the downstream compute at the cost of shuffling the (filtered,
    pruned) input once. On a production lake with many splittable files the
    condition is false and this is a NO-OP — the plan keeps its free
    map-side pipeline with no extra exchange.

    The probe only applies to SHUFFLE-FREE plans (a raw scan, narrow maps
    on top of one, possibly joined to a BROADCAST dim — a broadcast join
    leaves the big side's partitioning untouched, so such plans stay
    eligible): if the physical plan already contains a shuffle Exchange or
    a cache scan, the input is spread by that shuffle's partitioning and
    the function is a no-op WITHOUT touching ``df.rdd`` — under AQE,
    plan→RDD conversion EXECUTES every upstream shuffle stage (measured:
    6.6 s of silent double execution probing a windowed subtree in the
    corpus pipeline). Both checks live in ``safe_num_partitions``.

    ``cache_key`` memoizes the probe for repeated runs over the same
    source, e.g. the bench loop.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    need = _SPLIT_DECISIONS.get(cache_key) if cache_key else None
    if need is None:
        n = safe_num_partitions(df)
        # n is None ⇔ already spread (or cached) by an upstream shuffle
        need = n is not None and n < target
        if cache_key:
            _SPLIT_DECISIONS[cache_key] = need
    return df.repartition(target) if need else df


def read_json_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced JSON-lines scan (A2 typed decode over landed files)."""
    if mode == "PERMISSIVE":
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
    header: bool = True,
) -> DataFrame:
    """Schema-enforced CSV scan (same decode-mode contract as JSON)."""
    if mode == "PERMISSIVE":
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_orc_records(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (columnar like parquet: predicate pushdown + column
    pruning reach the stripe footers). Schema optional — ORC embeds it —
    but declaring one skips the footer-sample pass on wide directories."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_avro_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Avro scan. Preferred path: the JVM ``spark-avro`` connector (an
    external module — submit with ``--packages
    org.apache.spark:spark-avro_2.13:<spark-version>``). Where that
    module is absent (this container), falls back to the engine's own
    dependency-free ``format("avrolite")`` Python DataSource
    (sources/avrolite.py — full object-container decode for the
    primitive/nullable/timestamp-micros record subset), so Avro landings
    are readable out of the box instead of import-gated.

    ``options`` pass through to whichever source serves the scan (each
    ignores options it doesn't know — e.g. avrolite's
    ``split_target_bytes`` block-split knob is a no-op under the JVM
    connector, which has its own splitting)."""
    reader = spark.read.options(**(options or {}))
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as e:
        # Fall back ONLY on the connector-absent error — any other
        # failure (corrupt file, schema mismatch) on a cluster that HAS
        # spark-avro must surface as-is, not be masked by a retry through
        # the limited avrolite subset (review catch r6).
        msg = str(e)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
        ):
            raise
        from . import avrolite

        avrolite.register(spark)
        fallback = spark.read.options(**(options or {}))
        if schema is not None:
            fallback = fallback.schema(schema)
        return fallback.format("avrolite").load(path)


def read_text_lines(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text corpus ingestion: one row per line (``value`` string), or
    one row per FILE with ``whole_file=True`` (document-per-file corpora).
    Line mode splits at newlines inside Hadoop's splittable readers, so a
    100 TB directory parallelizes by block; whole-file mode cannot split
    (one task per file) — acceptable only when files are document-sized."""
    return spark.read.text(path, wholetext=whole_file)


def decode_json_column(
    df: DataFrame, col: str, schema: T.StructType, mode: str = "FAILFAST"
) -> DataFrame:
    """``from_json`` typed decode of an embedded JSON string column (A2)."""
    return df.withColumn(col, F.from_json(F.col(col), schema, {"mode": mode}))


_QUARANTINE_SEQ = 0


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) split of a PERMISSIVE read.

    The parsed relation is cached first: Spark disallows queries that touch
    only ``_corrupt_record`` on a raw file scan (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), and both branches scan it anyway — cache once, filter twice.
    The scoped-cache key is unique per call: a fixed key would let a later
    ``quarantine_split`` release an earlier call's cache while its ``bad``
    branch is still unconsumed, and that branch would then fail with
    QUERY_ONLY_CORRUPT_RECORD_COLUMN on the raw scan. Per-call caches are
    reclaimed by ``caching.release_caches()`` (bench/sweep loops call it)."""
    from ..caching import scoped_persist

    global _QUARANTINE_SEQ
    _QUARANTINE_SEQ += 1
    df = scoped_persist(f"readers.quarantine.{_QUARANTINE_SEQ}", df)
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def fetch_drone_records(
    spark: SparkSession,
    url: str = "https://external.dronesense.com/v1/drones/with-sensors",
    api_key: str = "",
    timeout: float = 30.0,
    _payload: list | None = None,
) -> DataFrame:
    """HTTP source (A1, task.ts:112-117): GET + X-API-KEY auth → DataFrame.

    The fetch itself is driver-side (the reference's payload is one tenant's
    active drones — small by construction); the DataFrame is the distributed
    hand-off point. For a firehose-scale feed the right shape is
    land-to-object-store + ``read_json_records`` (or a streaming source),
    not a bigger driver fetch. ``_payload`` injects a pre-fetched body for
    tests/offline runs.
    """
    if _payload is None:
        req = urllib.request.Request(url, headers={"X-API-KEY": api_key})
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # pragma: no cover
            _payload = json.loads(resp.read())
    if not isinstance(_payload, list):
        raise ValueError("drone payload must be a JSON array (task.ts:119)")
    # createDataFrame with the declared schema is the decode-or-throw step.
    return spark.createDataFrame(_payload, schema=DRONE_LOCATION_SCHEMA)
