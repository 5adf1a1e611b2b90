"""Multimodal columns: opaque binary payloads with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind ``decode_image``; the real-codec path raises
NotImplementedError) — but the Spark-side plumbing is real and tested:
binary column construction, Arrow batch shape through mapInPandas
(bytes arrive as Python bytes per element), schema declaration, and
shard-friendly partitioning.

Container format (fake, fixed): 4-byte ASCII magic "IMG0" + payload
(utf-8 bytes of the doc text standing in for pixel data).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MAGIC = b"IMG0"


def with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a synthesized binary column (magic header + payload)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.withColumn(
        "blob", F.concat(F.lit(MAGIC), F.encode("text", "utf-8"))
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL image decode — unavailable in this container (no PIL/cv2).
    Deliberately gated; the pipeline uses fake_decode_meta instead."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_meta (deterministic stub) for pipeline tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derives (width, height) from
    the payload length so downstream plumbing has realistic shapes (and
    the oracle can recompute it with pure arithmetic)."""
    n = len(payload)
    return 64 + (n * 7) % 192, 64 + n % 192


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode metadata from the binary column via mapInPandas (the
    plumbing that real codecs would use): magic, payload length, md5
    checksum, fake-decoded dimensions."""
    df = with_blob(spark, sf_dir).select("doc_id", "blob")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            magic = blobs.map(lambda b: b[:4].decode("ascii", errors="replace"))
            payloads = blobs.map(lambda b: b[4:])
            dims = payloads.map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "magic": magic,
                    "n_bytes": blobs.map(len),
                    "payload_md5": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return df.mapInPandas(
        _decode,
        schema="doc_id long, magic string, n_bytes long, payload_md5 string, width int, height int",
    )


# Oracle recomputes the same metadata straight from text (DuckDB has no
# codecs either — the fake decode is pure arithmetic on bytes).
SQL_MULTIMODAL_META = """
SELECT doc_id,
       'IMG0' AS magic,
       4 + octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       64 + (octet_length(encode(text)) * 7) % 192 AS width,
       64 + (octet_length(encode(text)) % 192) AS height
FROM documents
"""
