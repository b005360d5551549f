"""Multimodal (binary) column plumbing (SURVEY §2 Part C5).

Images / audio / video travel as opaque ``binary`` payloads plus a typed
metadata struct. The Spark-side machinery — schema, partition-sized Arrow
batches, ``mapInPandas`` signatures — is real and tested; the actual codec
step is stubbed (decode libraries are not in this container) behind
``decode_stub``: a deterministic fake so tests exercise the full path.

Scale notes: binary rows are large → keep ``spark.sql.files.maxPartitionBytes``
bounded and never ``collect`` payloads; feature extraction emits small typed
rows so downstream stages shed the heavy column immediately (column pruning
drops the binary once ``payload`` is no longer referenced).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def real_decode(payload: bytes) -> object:
    """Placeholder for the real codec (PIL / libav / ffmpeg).

    Not available in this container — the Spark plumbing around it is what
    this module implements and tests."""
    raise NotImplementedError("media codecs are not installed in this environment")


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': fixed-dim feature from byte statistics.

    Stands in for decode→resize→embed so the distributed path (Arrow batch
    shapes, schema, partitioning) is fully exercised."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [a / n for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Binary → feature rows via ``mapInPandas`` (Arrow-batched).

    One narrow pass; each Arrow batch holds whole payloads, Python touches
    bytes only inside the batch loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                    "byte_sum": payloads.map(
                        lambda p: 0 if p is None else int(sum(p))
                    ),
                    "feature": payloads.map(lambda p: decode_stub(p, dim)),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps from metadata.

    The decode of each sampled frame is the stubbed step; the exploded
    (media_id, sample_ms) rows are the real distributed work list, sized
    by ``duration_ms`` so Catalyst can estimate cardinality."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the UTF-8
    text bytes become the payload. Deterministic, so oracle-checkable."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length("text") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
