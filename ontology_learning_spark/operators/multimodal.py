"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Header-level media decode is REAL and pure-stdlib (``struct`` over the
container headers): PNG IHDR, JPEG SOF0/1/2 scan, GIF logical screen
descriptor, WAV RIFF fmt/data chunks. Pixel/sample-level work
(mean_luma, frame extraction from actual video streams) still needs
PIL/ffmpeg, which are not in this container — those fields come back
NULL from the header decoder, and ``_decode_fake`` remains the
deterministic stand-in for unrecognized payloads so the Arrow plumbing
(schema, partitioning, UDF signature, batch shape, frame fan-out)
stays exercised end-to-end either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, media_type string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

DECODED_SCHEMA = (
    "doc_id string, media_ref string, media_type string, codec string, "
    "width int, height int, n_frames int, mean_luma double, "
    "channels int, sample_rate int, duration_ms int, decode_ok boolean"
)

FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, ts_ms int, frame_fingerprint string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_WAV_RATES = (8000, 16000, 44100, 48000)


def _empty() -> dict:
    return {"codec": None, "width": None, "height": None, "n_frames": None,
            "mean_luma": None, "channels": None, "sample_rate": None,
            "duration_ms": None}


def decode_media_header(content: bytes) -> dict | None:
    """Parse real container headers with stdlib ``struct`` — no media
    libraries. Returns None when the payload is not a recognized
    PNG/JPEG/GIF/WAV container (caller falls back to the deterministic
    fake so the pipeline never dies on junk bytes — at 100 TB some
    fraction of any crawl's media blobs is corrupt)."""
    if not content:
        return None
    d = _empty()
    if content[:8] == _PNG_SIG and len(content) >= 24 and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        d.update(codec="png", width=int(w), height=int(h), n_frames=1)
        return d
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        d.update(codec="gif", width=int(w), height=int(h), n_frames=1)
        return d
    if content[:2] == b"\xff\xd8":
        # scan segment markers for a start-of-frame (SOF0/1/2): each
        # non-standalone segment is FF <marker> <len:2 BE incl. itself>
        i = 2
        while i + 4 <= len(content):
            if content[i] != 0xFF:
                return None
            marker = content[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                if i + 9 > len(content):
                    return None
                h, w = struct.unpack(">HH", content[i + 5:i + 9])
                d.update(codec="jpeg", width=int(w), height=int(h), n_frames=1)
                return d
            i += 2 + seg_len
        return None
    if content[:4] == b"RIFF" and len(content) >= 12 and content[8:12] == b"WAVE":
        # chunk walk: [id:4][size:4 LE][payload...]; only the declared
        # sizes are read, so a header-only blob (object-store range
        # request of the first KB) decodes without fetching samples
        i = 12
        channels = rate = bits = None
        data_size = None
        while i + 8 <= len(content):
            cid = content[i:i + 4]
            size = struct.unpack("<I", content[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(content):
                channels, rate = struct.unpack("<HI", content[i + 10:i + 16])
                bits = struct.unpack("<H", content[i + 22:i + 24])[0]
            if cid == b"data":
                data_size = size
                break  # samples follow; nothing after matters
            i += 8 + size + (size & 1)
        if not channels or not rate or not bits or data_size is None:
            return None
        n_samples = data_size // (channels * (bits // 8))
        d.update(codec="wav", n_frames=1, channels=int(channels),
                 sample_rate=int(rate),
                 duration_ms=int(n_samples * 1000 // rate))
        return d
    return None


def _decode_fake(content: bytes, media_type: str) -> dict:
    """Deterministic fallback for unrecognized payloads: dimensions /
    stats derived from the content hash so tests are reproducible."""
    h = hashlib.md5(content or b"").digest()
    d = _empty()
    d.update(
        codec=None,
        width=64 + h[0] % 192,
        height=64 + h[1] % 192,
        n_frames=1 if media_type == "image" else 1 + h[2] % 30,
        mean_luma=h[3] / 255.0,
    )
    return d


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas over media rows → decoded feature rows. Real header
    parse first; deterministic fake for unrecognized bytes. Batches are
    Arrow-transferred; large blobs chunk via
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    cols = ["doc_id", "media_ref", "media_type", "codec", "width", "height",
            "n_frames", "mean_luma", "channels", "sample_rate",
            "duration_ms", "decode_ok"]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                d = decode_media_header(r.content)
                if d is None:
                    d = _decode_fake(r.content, r.media_type)
                recs.append(
                    (r.doc_id, r.media_ref, r.media_type, d["codec"],
                     d["width"], d["height"], d["n_frames"], d["mean_luma"],
                     d["channels"], d["sample_rate"], d["duration_ms"], True)
                )
            yield pd.DataFrame(recs, columns=cols)

    return df.select("doc_id", "media_ref", "media_type", "content").mapInPandas(
        _run, DECODED_SCHEMA
    )


def decode_media_refs(docs: DataFrame) -> DataFrame:
    """Plan fusion of ``decode_media(media_refs_from_spans(docs))`` for
    the planted-payload path: ONE mapInPandas pass that builds the real
    container bytes (``make_media_bytes``) and header-parses them
    (``decode_media_header`` / ``_decode_fake``) without shipping the
    payload JVM→Python→JVM→Python (guide §4.1: every boundary crossing
    costs a transpose + serialization of the binary column — ~50 MB
    each way at 50k refs). Same functions, same rows; only the bytes'
    travel is removed. Real object-store media uses ``decode_media``
    on fetched content as before."""
    refs = docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    return decode_media_ref_rows(refs)


def decode_media_ref_rows(refs: DataFrame) -> DataFrame:
    """The plant+decode pass of ``decode_media_refs`` over an already-
    projected (doc_id, media_ref) frame. Split out so callers that can
    DERIVE the refs without building span arrays (``to_spans`` emits
    exactly one media span per doc with ref ``img://<doc_id>/0``, so
    the refs frame is a plain projection of the flat table) skip the
    interpreted chunk-transform chain that only existed to produce the
    text spans this consumer discards (guide §1.2)."""

    cols = ["doc_id", "media_ref", "media_type", "codec", "width", "height",
            "n_frames", "mean_luma", "channels", "sample_rate",
            "duration_ms", "decode_ok"]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                media_type, content = make_media_bytes(ref)
                d = decode_media_header(content)
                if d is None:
                    d = _decode_fake(content, media_type)
                recs.append(
                    (doc_id, ref, media_type, d["codec"],
                     d["width"], d["height"], d["n_frames"], d["mean_luma"],
                     d["channels"], d["sample_rate"], d["duration_ms"], True)
                )
            yield pd.DataFrame(recs, columns=cols)

    return refs.mapInPandas(_run, DECODED_SCHEMA)


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


def make_media_bytes(ref: str) -> tuple[str, bytes]:
    """(media_type, content): a REAL minimal container whose header
    fields are planted deterministically from md5(ref) — the synthetic
    stand-in for object-store bytes. Format cycles PNG/JPEG/GIF/WAV on
    hash byte 4; dimensions reuse the legacy 64 + h[i] % 192 formula so
    the DuckDB oracle can recompute every planted field from the ref
    alone, which makes the round-trip (plant → bytes → struct parse) a
    cross-engine-checked path."""
    h = hashlib.md5(ref.encode()).digest()
    fmt = h[4] % 4
    w = 64 + h[0] % 192
    hh = 64 + h[1] % 192
    if fmt == 0:
        ihdr = struct.pack(">II", w, hh) + b"\x08\x02\x00\x00\x00"
        return "image", _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    if fmt == 1:
        sof = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, hh, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        return "image", b"\xff\xd8" + sof + b"\xff\xd9"
    if fmt == 2:
        return "image", b"GIF89a" + struct.pack("<HH", w, hh) + b"\xf7\x00\x00"
    channels = 1 + h[0] % 2
    rate = _WAV_RATES[h[1] % 4]
    dur_ms = 100 * (1 + h[2] % 50)
    n_samples = rate * dur_ms // 1000
    data_size = n_samples * channels * 2
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                      rate * channels * 2, channels * 2, 16)
    # header-only payload: the data chunk declares its size but carries
    # no samples (the decoder never reads past the declared header)
    riff_size = 4 + len(fmt_chunk) + 8 + data_size
    content = (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
               + fmt_chunk + b"data" + struct.pack("<I", data_size))
    return "audio", content


def media_refs_from_spans(docs: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved documents table (typed
    leaf nodes per input_hint) → one row per media_ref with a planted
    REAL container payload (``make_media_bytes``)."""
    payload_schema = T.StructType([
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    @F.pandas_udf(payload_schema)
    def payload_udf(refs: pd.Series) -> pd.DataFrame:
        rows = [make_media_bytes(r) for r in refs]
        return pd.DataFrame(rows, columns=["media_type", "content"])

    media = docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"),
    ).select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        payload_udf(F.col("s.media_ref")).alias("p"),
    ).select(
        "doc_id", "media_ref",
        F.col("p.media_type").alias("media_type"),
        F.col("p.content").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )
    return media
