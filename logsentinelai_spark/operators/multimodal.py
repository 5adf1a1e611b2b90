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

import numpy as np
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
            # vectorized: lengths + header slice via pandas .str (C loop);
            # the fake dims are pure numpy arithmetic on the lengths.
            # Only the md5 stays per-payload — that IS the codec-shaped
            # step (a real decoder is per-payload C work anyway).
            n = blobs.str.len().to_numpy(dtype=np.int64)
            pn = n - 4
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "magic": blobs.str[:4].str.decode("ascii", errors="replace"),
                    "n_bytes": n,
                    "payload_md5": [hashlib.md5(b[4:]).hexdigest() for b in blobs],
                    "width": (64 + (pn * 7) % 192).astype(np.int32),
                    "height": (64 + pn % 192).astype(np.int32),
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


def fake_resize(width: int, height: int, max_side: int = 128) -> tuple[int, int]:
    """Deterministic stand-in for a resize kernel: scale the longer side
    to max_side preserving aspect ratio (integer floor), never upscale.
    Pure arithmetic so the oracle reproduces it."""
    longer = max(width, height)
    if longer <= max_side:
        return width, height
    return (width * max_side) // longer, (height * max_side) // longer


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-then-resize plumbing: mapInPandas batch in, per-row dims
    out — the batch shape a real thumbnailer (PIL/cv2) would use, with
    the kernel stubbed to deterministic arithmetic."""
    df = with_blob(spark, sf_dir).select("doc_id", "blob")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fully vectorized — no per-element Python at all: the stub
            # kernel is arithmetic on payload lengths (numpy), matching
            # fake_decode_meta/fake_resize element-wise.
            pn = pdf["blob"].str.len().to_numpy(dtype=np.int64) - 4
            w = 64 + (pn * 7) % 192
            h = 64 + pn % 192
            longer = np.maximum(w, h)
            scale = longer > 128
            ow = np.where(scale, (w * 128) // longer, w)
            oh = np.where(scale, (h * 128) // longer, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "out_width": ow.astype(np.int32),
                    "out_height": oh.astype(np.int32),
                }
            )

    return df.mapInPandas(
        _resize, schema="doc_id long, width int, height int, out_width int, out_height int")


SQL_MULTIMODAL_RESIZE = """
WITH dims AS (
  SELECT doc_id,
         64 + (octet_length(encode(text)) * 7) % 192 AS width,
         64 + (octet_length(encode(text)) % 192) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= 128 THEN width
            ELSE (width * 128) // greatest(width, height) END AS out_width,
       CASE WHEN greatest(width, height) <= 128 THEN height
            ELSE (height * 128) // greatest(width, height) END AS out_height
FROM dims
"""

FRAME_BYTES = 256  # fake fixed-size frame
FRAME_STRIDE = 4   # sample every 4th frame


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: the payload is
    treated as fixed-size frames; every FRAME_STRIDE-th frame is emitted
    as (doc_id, frame_no, frame_md5) — one input row fans out to many
    (the mapInPandas-as-UDTF shape a real ffmpeg sampler would use)."""
    df = with_blob(spark, sf_dir).select("doc_id", "blob")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized 1->N fan-out: per-row sampled-frame counts from
            # payload lengths, then one np.repeat + segmented arange for
            # (doc_id, frame_no). Only the per-frame md5 slice+hash is
            # Python — the stand-in for the per-frame codec kernel.
            blobs = pdf["blob"]
            pn = blobs.str.len().to_numpy(dtype=np.int64) - 4
            n_frames = (pn + FRAME_BYTES - 1) // FRAME_BYTES
            n_sampled = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
            total = int(n_sampled.sum())
            ids = np.repeat(pdf["doc_id"].to_numpy(), n_sampled)
            starts = np.concatenate(([0], np.cumsum(n_sampled)[:-1]))
            frame_no = (np.arange(total) - np.repeat(starts, n_sampled)) * FRAME_STRIDE
            payloads = np.repeat(blobs.to_numpy(), n_sampled)
            md5s = [
                hashlib.md5(b[4 + f * FRAME_BYTES:4 + (f + 1) * FRAME_BYTES]).hexdigest()
                for b, f in zip(payloads, frame_no)
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frame_no.astype(np.int32), "frame_md5": md5s})

    return df.mapInPandas(_sample, schema="doc_id long, frame_no int, frame_md5 string")


# The engine truth is BYTE slicing (above). DuckDB substring() is
# VARCHAR-only, so the oracle slices characters — equivalent here
# because the driver documents fixture is pure ASCII (all 500 rows have
# octet_length(encode(text)) == length(text); verified at sf0.01).
SQL_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, text AS payload,
         (octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS n_frames
  FROM documents
)
SELECT doc_id, g.f AS frame_no,
       md5(substring(payload, g.f * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM f, generate_series(0, 100000) g(f)
WHERE g.f < n_frames AND g.f % {FRAME_STRIDE} = 0
"""
