"""Streaming graph maintenance: per-batch triple extraction folded
through merge_graph equals one batch-mode merge over the union —
node sets exactly, edge sets up to run_id (which records the
introducing batch by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_learning_spark.fixtures import baseline
from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA
from ontology_learning_spark.streaming.incremental import (
    fold_graph,
    run_incremental_triples,
)

SURFACES = ("resistor", "antenna", "capacitor", "diode", "sensor")


def _node_set(nodes):
    return {tuple(r) for r in nodes.collect()}


def _edge_set(edges):
    return {(r["src"], r["rel_type"], r["dst"], r["source"]) for r in edges.collect()}


def test_streaming_fold_equals_batch_merge(spark, tmp_path, fixture_docs):
    from ontology_learning_spark.operators import extraction as E
    from ontology_learning_spark.sources.tables import baseline_graph, merge_graph

    in_dir, groot, ckpt = (str(tmp_path / d) for d in ("in", "graph", "ckpt"))
    hierarchy = baseline.ONTOLOGY_HIERARCHY

    # two file drops, two availableNow runs against one checkpoint
    spark.createDataFrame(fixture_docs[:60], DOCUMENT_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    run_incremental_triples(spark, in_dir, groot, ckpt, SURFACES)
    spark.createDataFrame(fixture_docs[60:], DOCUMENT_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    run_incremental_triples(spark, in_dir, groot, ckpt, SURFACES)

    s_nodes, s_edges = fold_graph(spark, groot, hierarchy)

    # batch twin: one extraction over the union, one merge
    all_docs = spark.createDataFrame(fixture_docs, DOCUMENT_SCHEMA)
    _, doc_triples, _ = E.extract_pipeline(all_docs, SURFACES, pin=False)
    b_nodes, b_edges = baseline_graph(spark, hierarchy)
    empty_tasks = spark.createDataFrame([], "name string, parent_class string, status string")
    b_nodes, b_edges = merge_graph(
        b_nodes, b_edges, empty_tasks,
        doc_triples.select("subj", "pred", "obj").distinct(), run_id="batch",
    )

    assert _node_set(s_nodes) == _node_set(b_nodes)
    assert _edge_set(s_edges) == _edge_set(b_edges)
    # the streamed graph actually learned something beyond baseline
    assert s_edges.where("source = 'learned_from_dataset'").count() > 0

    # no new files -> re-running the stream + fold is a no-op
    run_incremental_triples(spark, in_dir, groot, ckpt, SURFACES)
    s_nodes2, s_edges2 = fold_graph(spark, groot, hierarchy)
    assert _node_set(s_nodes2) == _node_set(s_nodes)
    assert _edge_set(s_edges2) == _edge_set(s_edges)


def test_fold_canonical_mapping_parity(spark, tmp_path):
    """Folding alias-edge batches through incremental_components must
    equal one CC over the concatenated edges — including brand-new
    nodes arriving in a later batch — and an empty root folds to an
    empty mapping."""
    import random

    from ontology_learning_spark.operators import canonicalize as CC
    from ontology_learning_spark.streaming.incremental import fold_canonical_mapping

    rng = random.Random(77)
    nodes = [f"c{i:03d}" for i in range(40)]
    batches = []
    for _ in range(3):
        edges = [(a, b) for a, b in
                 {(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)}
                 if a != b]
        batches.append(edges)
    batches[2] = batches[2] + [("zz1", "zz2")]

    root = tmp_path / "aliases"
    for b, edges in enumerate(batches):
        spark.createDataFrame(edges, "src string, dst string") \
            .write.parquet(str(root / f"batch_id={b}"))

    folded = {tuple(r) for r in fold_canonical_mapping(spark, str(root)).collect()}
    all_edges = [e for es in batches for e in es]
    full = {tuple(r) for r in CC.connected_components(
        spark.createDataFrame(all_edges, "src string, dst string")).collect()}
    assert folded == full

    assert fold_canonical_mapping(spark, str(tmp_path / "nothing")).count() == 0


def test_streaming_near_dedup_parity_and_idempotent_fold(spark, tmp_path):
    """The streamed near-dup state after draining all batches must
    equal the one-shot pipeline over every doc; and re-folding an
    already-folded batch's edges is a no-op (the replay-safety
    argument)."""
    import random

    from ontology_learning_spark.operators import dedup as DD
    from ontology_learning_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )
    from ontology_learning_spark.streaming.incremental import run_streaming_near_dedup

    rng = random.Random(13)
    words = [f"w{i}" for i in range(60)]

    def mk():
        return " ".join(rng.choice(words) for _ in range(25))

    rows = [(str(i), mk()) for i in range(60)]
    rows[7] = ("7", rows[0][1])                     # dup inside file 0's range
    rows[45] = ("45", rows[2][1])                   # dup across batches
    rows[50] = ("50", rows[45][1])                  # 3-chain across batches
    in_dir = tmp_path / "in"
    for b in range(3):                              # 3 part files, flat in in_dir
        chunk = rows[b * 20:(b + 1) * 20]
        spark.createDataFrame(chunk, "doc_id string, text string") \
            .coalesce(1).write.mode("append").parquet(str(in_dir))

    state = str(tmp_path / "state")
    run_streaming_near_dedup(spark, str(in_dir), state, str(tmp_path / "ckpt"),
                             threshold=0.9, max_files_per_trigger=1)

    from pathlib import Path as P
    versions = sorted(int(p.name[1:]) for p in (P(state) / "mapping").glob("v*"))
    assert versions, "no mapping versions written"
    final = spark.read.parquet(f"{state}/mapping/v{versions[-1]}")

    all_df = spark.createDataFrame(rows, "doc_id string, text string")
    full_pairs = DD.ngram_jaccard_pairs(all_df, threshold=0.9)
    full = connected_components(
        full_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    got = {tuple(r) for r in final.collect()}
    assert got == {tuple(r) for r in full.collect()}
    assert {"0", "7"} <= {r[0] for r in got}        # planted dups mapped

    # idempotent fold: re-folding the FULL pair set into the final
    # mapping changes nothing
    refold = incremental_components(
        final, full_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    assert {tuple(r) for r in refold.collect()} == got

    # Torn-write recovery (ADVICE r5): a crash mid-write leaves a
    # newest mapping/vN directory with no _SUCCESS marker. The next
    # run must skip it and fold onto the previous committed version
    # instead of wedging on schema inference (empty dir) or silently
    # reading a partial mapping.
    torn = P(state) / "mapping" / f"v{versions[-1] + 7}"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet.tmp").write_bytes(b"not parquet")
    extra = [(str(1000 + i), mk()) for i in range(20)]
    extra[3] = ("1003", rows[0][1])                 # joins an existing cluster
    spark.createDataFrame(extra, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(str(in_dir))
    run_streaming_near_dedup(spark, str(in_dir), state, str(tmp_path / "ckpt"),
                             threshold=0.9, max_files_per_trigger=1)
    versions2 = sorted(int(p.name[1:]) for p in (P(state) / "mapping").glob("v*")
                       if (P(state) / "mapping" / p.name / "_SUCCESS").exists())
    final2 = spark.read.parquet(f"{state}/mapping/v{versions2[-1]}")
    all2 = spark.createDataFrame(rows + extra, "doc_id string, text string")
    full2 = connected_components(
        DD.ngram_jaccard_pairs(all2, threshold=0.9)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    assert {tuple(r) for r in final2.collect()} == {tuple(r) for r in full2.collect()}
