"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The media decode itself is STUBBED (image/audio libs are not available
in this container): `decode_media` routes to a deterministic fake
decoder so the Spark-side plumbing — schema, partitioning, Arrow UDF
signature, batch shape, frame fan-out — is real and tested, and a real
decoder (PIL/ffmpeg) drops into `_decode_real`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, media_type string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

DECODED_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "width int, height int, n_frames int, mean_luma double, decode_ok boolean"
)

FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, ts_ms int, frame_fingerprint string"
)


def _decode_real(content: bytes, media_type: str) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg — not available in this "
        "container; the deterministic fake below exercises the plumbing"
    )


def _decode_fake(content: bytes, media_type: str) -> dict:
    """Deterministic fake decode: dimensions/stats derived from the
    content hash so tests are reproducible."""
    h = hashlib.md5(content or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 if media_type == "image" else 1 + h[2] % 30,
        "mean_luma": h[3] / 255.0,
        "decode_ok": True,
    }


def decode_media(df: DataFrame, use_real: bool = False) -> DataFrame:
    """mapInPandas over media rows → decoded feature rows. Batches are
    Arrow-transferred; a real decoder would chunk large blobs via
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    decode = _decode_real if use_real else _decode_fake

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                d = decode(r.content, r.media_type)
                recs.append(
                    (r.doc_id, r.media_ref, r.media_type,
                     d["width"], d["height"], d["n_frames"], d["mean_luma"], d["decode_ok"])
                )
            yield pd.DataFrame(
                recs,
                columns=["doc_id", "media_ref", "media_type", "width", "height",
                         "n_frames", "mean_luma", "decode_ok"],
            )

    return df.select("doc_id", "media_ref", "media_type", "content").mapInPandas(
        _run, DECODED_SCHEMA
    )


def sample_frames(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame fan-out: one row per sampled frame index (pure Catalyst
    explode over a sequence — the decode already counted frames)."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return decoded.select(
        "doc_id", "media_ref", F.explode(idx).alias("frame_idx")
    ).select(
        "doc_id", "media_ref", "frame_idx",
        (F.col("frame_idx") * 33).alias("ts_ms"),
        F.md5(F.concat_ws("|", "media_ref", "frame_idx")).alias("frame_fingerprint"),
    )


def media_refs_from_spans(docs: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved documents table (typed
    leaf nodes per input_hint) → one row per media_ref, with a
    deterministic synthetic payload standing in for object-store bytes."""
    media = docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"),
    ).select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("s.media_ref"), "utf-8").cast("binary").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )
    return media
