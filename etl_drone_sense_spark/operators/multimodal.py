"""Multimodal (binary) column plumbing (SURVEY §2 Part C5).

Images / audio / video travel as opaque ``binary`` payloads plus a typed
metadata struct. The Spark-side machinery — schema, partition-sized Arrow
batches, ``mapInPandas`` signatures — is real and tested. The codec layer
has two tiers:

* ``parse_ppm`` / ``decode_image_features`` — a REAL, dependency-free
  decoder for uncompressed binary PPM (P6) images: header parse (with
  comment handling), raster extraction, per-channel statistics. This is
  the honest end-to-end path a user gets without external libraries.
* ``decode_stub`` — a deterministic fake standing in for compressed
  codecs (JPEG/H.264 need PIL/libav, not in this container); it keeps the
  full Arrow path exercised for those formats' plumbing.

Scale notes: binary rows are large → keep ``spark.sql.files.maxPartitionBytes``
bounded and never ``collect`` payloads; feature extraction emits small typed
rows so downstream stages shed the heavy column immediately (column pruning
drops the binary once ``payload`` is no longer referenced).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("resize_ok", T.BooleanType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def _ppm_header_tokens(buf: bytes, count: int) -> tuple[list[bytes], int]:
    """First ``count`` whitespace-delimited header tokens (``#`` comments
    skipped to end-of-line, per the netpbm spec); returns (tokens, end index
    just past the last token)."""
    toks: list[bytes] = []
    i, n = 0, len(buf)
    while len(toks) < count:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(buf[i:j])
        i = j
    return toks, i


def parse_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed binary PPM (P6) image — dependency-free.

    Returns ``(width, height, raster)`` where ``raster`` is the
    ``width*height*3`` interleaved-RGB byte string. Exactly one whitespace
    byte separates the maxval token from the raster (netpbm spec). Only
    maxval 255 (1 byte/sample) is supported. Malformed, truncated, or
    non-P6 payloads raise ``ValueError`` — compressed formats (JPEG/PNG)
    need external codec libraries, which this container doesn't ship.
    """
    if payload is None or len(payload) < 2 or bytes(payload[:2]) != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    buf = bytes(payload)
    (magic, w_tok, h_tok, maxval_tok), end = _ppm_header_tokens(buf, 4)
    if magic != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    try:
        width, height, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    except ValueError as exc:
        raise ValueError(f"non-numeric PPM header token: {exc}") from exc
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PPM dimensions {width}x{height}")
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    start = end + 1  # the single whitespace byte after maxval
    need = width * height * 3
    raster = buf[start : start + need]
    if len(raster) < need:
        raise ValueError(
            f"truncated PPM raster: need {need} bytes, have {len(raster)}"
        )
    return width, height, raster


def decode_image_features(media: DataFrame) -> DataFrame:
    """PPM payloads → per-image features via ``mapInPandas`` (Arrow-batched).

    Emits (media_id, decode_ok, width, height, mean_r/g/b). Channel means
    are exact-integer sums (numpy int64) divided once in double — the same
    IEEE op an SQL oracle performs, so results are bit-comparable.
    Undecodable payloads yield ``decode_ok=false`` with null features
    instead of failing the batch (quarantine-friendly: one corrupt blob
    must not kill a 100 TB scan)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in IMAGE_FEATURE_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, raster = parse_ppm(payload)
                    sums = (
                        np.frombuffer(raster, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(-1, 3)
                        .sum(axis=0)
                    )
                    px = w * h
                    vals = (True, w, h, sums[0] / px, sums[1] / px, sums[2] / px)
                except ValueError:
                    vals = (False, None, None, None, None, None)
                out["media_id"].append(mid)
                for k, v in zip(
                    ("decode_ok", "width", "height", "mean_r", "mean_g", "mean_b"),
                    vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def resize_image_features(
    media: DataFrame, out_w: int = 2, out_h: int = 2
) -> DataFrame:
    """PPM payloads → nearest-neighbor RESIZE → per-channel means of the
    resized raster, via ``mapInPandas`` (Arrow-batched) — the resize step
    of a decode→resize→embed vision pipeline, with REAL raster math
    (numpy fancy-indexing selects source pixel (ty·h//out_h, tx·w//out_w)
    for each target pixel; compressed-codec resizes stay the declared
    import-gated extension). Undecodable payloads yield
    ``resize_ok=false`` instead of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, raster = parse_ppm(payload)
                    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
                    ry = (np.arange(out_h) * h) // out_h
                    rx = (np.arange(out_w) * w) // out_w
                    small = arr[ry][:, rx].astype(np.int64)
                    sums = small.reshape(-1, 3).sum(axis=0)
                    px = out_w * out_h
                    vals = (
                        True, out_w, out_h,
                        sums[0] / px, sums[1] / px, sums[2] / px,
                    )
                except ValueError:
                    vals = (False, None, None, None, None, None)
                out["media_id"].append(mid)
                for k, v in zip(
                    ("resize_ok", "out_w", "out_h", "mean_r", "mean_g", "mean_b"),
                    vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def synth_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic PPM payloads keyed by doc id (fixture for
    the decode path — REAL P6 bytes, arithmetically predictable content so
    a SQL oracle can derive the expected features without a decoder):
    ``width = 4 + doc_id % 5``, ``height = 3 + doc_id % 4``, raster byte
    ``i`` = ``(doc_id*31 + i) % 256``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                raster = bytes((did * 31 + i) % 256 for i in range(w * h * 3))
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + raster)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id long, payload binary"
    )


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
