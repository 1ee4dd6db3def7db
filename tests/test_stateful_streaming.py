"""Stateful streaming ops: cross-batch exact dedup
(applyInPandasWithState) and watermarked windowed counts.

Both tests drive real multi-run availableNow streams against one
checkpoint, so the state-store restore path (not just in-run state) is
what's exercised."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ontology_learning_spark.streaming.stateful import (
    batch_exact_dedup_equivalent,
    streaming_exact_dedup,
    streaming_windowed_doc_counts,
)

DOC_SCHEMA = "doc_id string, text string"
TS_SCHEMA = "doc_id string, event_time timestamp"


def _write(spark, path, rows, schema):
    # append flat into the watched dir: the file stream source does not
    # recurse into subdirectories
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_streaming_exact_dedup_suppresses_across_runs(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    _write(spark, in_dir, [("d1", "alpha"), ("d2", "alpha"), ("d3", "beta")], DOC_SCHEMA)
    streaming_exact_dedup(spark, in_dir, out_dir, ckpt, DOC_SCHEMA)
    out1 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(out1) == {"d1", "d3"}, "min-id representative per hash within the batch"
    assert out1["d1"]["batch_dups"] == 2

    # no new files -> no new rows
    streaming_exact_dedup(spark, in_dir, out_dir, ckpt, DOC_SCHEMA)
    assert spark.read.parquet(out_dir).count() == 2

    # d4 repeats alpha (suppressed by restored state), d0 repeats beta
    # (suppressed even though d0 < d3: arrival order wins), d5 is new
    _write(spark, in_dir, [("d4", "alpha"), ("d0", "beta"), ("d5", "gamma")], DOC_SCHEMA)
    streaming_exact_dedup(spark, in_dir, out_dir, ckpt, DOC_SCHEMA)
    out2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert out2 == {"d1", "d3", "d5"}

    # content-key parity with the batch operator over the union: the
    # streaming run saw exactly the hashes one batch exact_dedup finds
    batch = batch_exact_dedup_equivalent(spark, in_dir, DOC_SCHEMA)
    stream_hashes = {
        r["content_hash"] for r in spark.read.parquet(out_dir).collect()
    }
    assert stream_hashes == {r["content_hash"] for r in batch.collect()}


def test_streaming_windowed_counts_watermark(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: two docs in [00:00,00:10), one in [00:10,00:20), and a
    # 01:00 doc that pushes the watermark to 00:45 (15 min delay)
    _write(
        spark, in_dir,
        [("a", ts(1)), ("b", ts(5)), ("c", ts(12)), ("d", ts(60))],
        TS_SCHEMA,
    )
    streaming_windowed_doc_counts(spark, in_dir, out_dir, ckpt, TS_SCHEMA)

    # batch 2: a beyond-watermark straggler at 00:03 (dropped — its
    # window may already be emitted) and a 02:00 doc that advances the
    # watermark past 01:10, closing the [01:00,01:10) window
    _write(spark, in_dir, [("late", ts(3)), ("e", ts(120))], TS_SCHEMA)
    streaming_windowed_doc_counts(spark, in_dir, out_dir, ckpt, TS_SCHEMA)

    rows = spark.read.parquet(out_dir).collect()
    got = {r["window_start"].minute + 60 * r["window_start"].hour: r["n_docs"] for r in rows}
    # closed windows, each exactly once, late straggler not counted
    assert got == {0: 2, 10: 1, 60: 1}, rows
    # [02:00,02:10) is still open at drain: correctly NOT emitted
    assert len(rows) == 3


def test_streaming_concept_saturation(spark, tmp_path, fixture_docs):
    from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA
    from ontology_learning_spark.operators import extraction as E
    from ontology_learning_spark.streaming.stateful import (
        saturation_curve,
        streaming_concept_saturation,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    surfaces = ("resistor", "antenna", "capacitor", "diode", "sensor")

    spark.createDataFrame(fixture_docs[:50], DOCUMENT_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    streaming_concept_saturation(spark, in_dir, out_dir, ckpt, surfaces)
    c1 = saturation_curve(spark, out_dir).collect()
    assert len(c1) >= 1 and all(r["new_concepts"] > 0 for r in c1)

    spark.createDataFrame(fixture_docs[50:], DOCUMENT_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    streaming_concept_saturation(spark, in_dir, out_dir, ckpt, surfaces)
    curve = saturation_curve(spark, out_dir).collect()

    # cumulative is monotone and the final total equals the BATCH
    # distinct-concept count over the union (first-seen across the
    # whole stream == distinct across the whole corpus)
    cums = [r["cumulative_concepts"] for r in curve]
    assert cums == sorted(cums)
    all_docs = spark.createDataFrame(fixture_docs, DOCUMENT_SCHEMA)
    batch_distinct = (
        E.extract(E.preprocess(E.concat_text_spans(all_docs)), surfaces)
        .select(F.explode("mentions").alias("m"))
        .select("m.norm_surface").distinct().count()
    )
    assert cums[-1] == batch_distinct
    # later batches introduce strictly fewer new concepts than the
    # first (saturation) — and a re-run with no new files adds nothing
    assert curve[-1]["new_concepts"] <= curve[0]["new_concepts"]
    streaming_concept_saturation(spark, in_dir, out_dir, ckpt, surfaces)
    assert [tuple(r) for r in saturation_curve(spark, out_dir).collect()] == [
        tuple(r) for r in curve
    ]
