"""Round-6 optimization guard: the fused plant+decode pass must be
row-identical to decode_media(media_refs_from_spans(docs)) — it calls
the same make_media_bytes / decode_media_header functions, only the
payload's JVM↔Python round trip is removed."""

from __future__ import annotations

from ontology_learning_spark.operators.multimodal import (
    decode_media,
    decode_media_refs,
    media_refs_from_spans,
)

COLS = ["doc_id", "media_ref", "media_type", "codec", "width", "height",
        "n_frames", "mean_luma", "channels", "sample_rate", "duration_ms",
        "decode_ok"]


def test_fused_decode_equals_two_pass(spark):
    from ontology_learning_spark.sources.adapters import to_spans

    docs = to_spans(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
    ref = decode_media(media_refs_from_spans(docs)).select(*COLS)
    opt = decode_media_refs(docs).select(*COLS)
    a = {tuple(r) for r in ref.collect()}
    b = {tuple(r) for r in opt.collect()}
    assert a == b
    assert len(a) == ref.count()
