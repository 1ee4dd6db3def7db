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


def test_direct_ref_projection_equals_span_refs(spark):
    """The flat projection ("img://<doc_id>/0" per doc) used by the
    multimodal_decode query is row-identical to exploding to_spans'
    media spans — to_spans emits exactly one media span per doc with
    that ref expression."""
    from pyspark.sql import functions as F

    from ontology_learning_spark.operators.multimodal import decode_media_ref_rows
    from ontology_learning_spark.sources.adapters import to_spans

    flat = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    spans = to_spans(flat)
    via_spans = spans.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    direct = flat.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/0")).alias("media_ref"),
    )
    assert via_spans.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_spans).count() == 0
    # and the decode over the direct refs matches the span-docs form
    a = {tuple(r) for r in decode_media_refs(spans).select(*COLS).collect()}
    b = {tuple(r) for r in decode_media_ref_rows(direct).select(*COLS).collect()}
    assert a == b
