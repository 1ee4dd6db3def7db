"""Incremental ingest via Structured Streaming (the streaming
counterpart of the batch resume-from-manifest path).

The reference has no streaming surface (SURVEY.md §2.6): its
"incremental" story is pickle-stage resume. The Spark-native analogue
for continuously arriving document files is an `availableNow` stream:
each trigger processes only files not yet recorded in the checkpoint,
runs the SAME extraction operators, and appends mentions exactly-once
(file-source checkpoint + idempotent sink path).

    run_incremental_extraction(spark, input_dir, output_dir, checkpoint_dir)

processes whatever is new and returns; calling it again after more
files land picks up only the delta — no reprocessing, mirroring the
manifest semantics at file granularity.

Exactly-once: foreachBatch alone is at-least-once (a crash between the
sink write and the checkpoint commit replays the batch), so the sink
writes each batch to a batch_id-scoped subdirectory with OVERWRITE —
a replayed batch rewrites the same directory instead of appending
duplicates, making the write idempotent and the end-to-end result
exactly-once. Readers consume ``output_dir/batch_id=*`` as one
partitioned dataset.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..fixtures.generator import DOCUMENT_SCHEMA
from ..operators import extraction as E


def run_incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    surfaces: tuple[str, ...],
    timeout_sec: int = 300,
) -> None:
    """availableNow stream: new document parquet files → mentions table."""
    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(batch_df, batch_id: int) -> None:
        # spread small file-count batches across the executor slots
        # (same rationale as run_incremental_batch below)
        par = batch_df.sparkSession.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < par:
            batch_df = batch_df.repartition(par)
        # pin=False: the write below is the ONLY consumer, so the
        # default eager materialization would add a full extra pass
        # (count job + memory copy of the batch) per trigger — measured
        # as the bulk of the fixed ~1.4 s delta overhead at 80k docs
        mentions, _, _ = E.extract_pipeline(batch_df, surfaces, pin=False)
        # idempotent per batch: overwrite the batch-scoped directory so
        # a checkpoint-replayed batch cannot duplicate rows
        mentions.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def run_incremental_batch(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    manifest_path: str,
    surfaces: tuple[str, ...],
) -> int:
    """File-granular incremental extraction WITHOUT the streaming
    trigger machinery. Returns the number of new files processed.

    The availableNow stream above pays ~1 s of fixed per-trigger
    bookkeeping (query construction, offset/commit WAL, microbatch
    scheduling) regardless of delta size — measured as the whole cost
    of a small delta at 80k docs. For callers that poll on their own
    cadence, the same exactly-once contract needs only a file manifest:

    - the manifest (one JSON: processed files + batch counter) is the
      commit log; new files = listing minus manifest;
    - each batch writes to a batch_id-scoped directory with OVERWRITE,
      and the manifest is written only AFTER the output commit — a
      crash in between replays the same files into the same directory,
      so the replay is idempotent and the end state exactly-once
      (identical argument to the stream's foreachBatch sink).

    Scale note: one flat JSON manifest is right up to ~10^5 files; past
    that, segment it per batch and compact like the file-stream
    source's own log (the listing itself is the same object-store cost
    either way).
    """
    mp = Path(manifest_path)
    state = json.loads(mp.read_text()) if mp.exists() else {"files": [], "n_batches": 0}
    seen = set(state["files"])
    files = sorted(str(p) for p in Path(input_dir).glob("*.parquet"))
    new = [f for f in files if f not in seen]
    if not new:
        return 0
    batch_id = state["n_batches"]
    docs = spark.read.schema(DOCUMENT_SCHEMA).parquet(*new)
    # a small delta arrives as few files → few partitions; spread it so
    # the Python extraction uses every core (the shuffle moves only the
    # delta, and only when the file count can't fill the slots)
    par = spark.sparkContext.defaultParallelism
    if len(new) < par:
        docs = docs.repartition(par)
    # pin=False: single consumer (the write), same as the stream sink
    mentions, _, _ = E.extract_pipeline(docs, surfaces, pin=False)
    mentions.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")
    mp.write_text(json.dumps({"files": files, "n_batches": batch_id + 1}))
    return len(new)


def run_incremental_triples(
    spark: SparkSession,
    input_dir: str,
    graph_root: str,
    checkpoint_dir: str,
    surfaces: tuple[str, ...],
    timeout_sec: int = 300,
) -> None:
    """availableNow stream: new document files → per-batch distinct
    (subj, pred, obj) triple tables under ``graph_root/triples/``.

    Triple extraction is per-document (E4 scans sentences of one doc),
    so batch boundaries cannot change WHAT is extracted — only how the
    rows are grouped into batch directories. The same batch_id-scoped
    OVERWRITE used by run_incremental_extraction makes replays
    idempotent; ``fold_graph`` below turns the directories into the
    merged ontology graph.
    """
    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(batch_df, batch_id: int) -> None:
        par = batch_df.sparkSession.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < par:
            batch_df = batch_df.repartition(par)
        _, doc_triples, _ = E.extract_pipeline(batch_df, surfaces, pin=False)
        (
            doc_triples.select("subj", "pred", "obj").distinct()
            .write.mode("overwrite")
            .parquet(f"{graph_root}/triples/batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def fold_canonical_mapping(spark: SparkSession, alias_root: str):
    """Fold committed alias-edge batches into a live (node, component)
    canonical mapping: plain CC of the first batch, then
    ``canonicalize.incremental_components`` per subsequent batch — each
    fold step touches only the delta's contracted component graph plus
    one broadcast-remap pass over the current mapping, and NEVER
    re-reads earlier batches (the whole point at 10^9 accumulated alias
    edges). Result is row-identical to one CC over the concatenated
    edges (streaming≡batch parity pytest).

    Batch directories follow the same ``batch_id=N`` layout the other
    incremental sinks write; at real scale each step reads one Iceberg
    snapshot delta instead.
    """
    from ..functions.persistence import materialize
    from ..operators.canonicalize import connected_components, incremental_components

    aroot = Path(alias_root)
    batch_ids = sorted(
        int(p.name.split("=")[1]) for p in aroot.glob("batch_id=*") if p.is_dir()
    )
    mapping = None
    for b in batch_ids:
        edges_b = spark.read.parquet(str(aroot / f"batch_id={b}"))
        if mapping is None:
            mapping = connected_components(edges_b)
        else:
            mapping = incremental_components(mapping, edges_b)
        mapping = materialize(mapping)
    if mapping is None:
        return spark.createDataFrame([], "node string, component string")
    return mapping


def fold_graph(spark: SparkSession, graph_root: str, hierarchy: list[tuple[str, str]]):
    """Fold every committed triple batch into the baseline graph with
    the SAME merge operator batch mode uses (tables.merge_graph), in
    batch_id order. First-writer-wins on the name / (src, rel_type,
    dst) merge keys makes the fold's node and edge SETS equal to one
    batch-mode merge over the concatenated triples (the edge run_id
    records which batch introduced the edge and legitimately differs —
    the streaming parity pytest compares everything else).

    Each fold step is materialized so the plan stays shallow — B
    batches cost B bounded jobs, not one B-deep window tree. At real
    scale each step is an Iceberg MERGE INTO; this fold is the same
    associative-idempotent contract expressed over directories.
    """
    from ..functions.persistence import materialize
    from ..sources.tables import baseline_graph, merge_graph

    nodes, edges = baseline_graph(spark, hierarchy)
    troot = Path(graph_root) / "triples"
    batch_ids = sorted(
        int(p.name.split("=")[1]) for p in troot.glob("batch_id=*") if p.is_dir()
    )
    empty_tasks = spark.createDataFrame(
        [], "name string, parent_class string, status string"
    )
    for b in batch_ids:
        triples_b = spark.read.parquet(str(troot / f"batch_id={b}"))
        nodes, edges = merge_graph(nodes, edges, empty_tasks, triples_b, run_id=f"batch-{b}")
        nodes, edges = materialize(nodes), materialize(edges)
    return nodes, edges


def run_streaming_near_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    shingle_n: int = 3,
    timeout_sec: int = 300,
    max_files_per_trigger: int = 4,
) -> None:
    """Cross-batch NEAR-dup dedup as a stream: each microbatch of
    (doc_id, text) parquet files folds into durable MinHash-LSH dedup
    state — band keys under ``state_dir/bands/batch_id=N``, docs under
    ``state_dir/docs/batch_id=N`` (the verify-side text lookup), and
    the live (node, component) mapping under ``state_dir/mapping/vN``.

    Replay safety WITHOUT transactional state: batch-scoped OVERWRITE
    for docs/bands (re-running batch N rewrites the same partitions),
    and the mapping fold is IDEMPOTENT — re-folding a batch whose pairs
    are already in the mapping changes nothing (pytest-pinned), so
    loading whatever mapping version is newest is always correct.
    Contrast with ``streaming_exact_dedup`` (content-hash, per-row
    state store): this path catches near-duplicates and keeps its
    state queryable as plain tables.
    """
    from ..operators.canonicalize import connected_components, incremental_components
    from ..operators.dedup import jaccard_verify, minhash_band_table

    def _latest_mapping() -> tuple[int, "DataFrame | None"]:
        mroot = Path(state_dir) / "mapping"
        versions = sorted(
            (int(p.name[1:]) for p in mroot.glob("v*") if p.is_dir()), reverse=True
        )
        for v in versions:
            # Skip torn writes: a crash during batch N's mapping write
            # leaves a v{N} directory without a _SUCCESS marker (empty →
            # schema-inference error wedges the fold; partial → silently
            # dropped historical rows). Falling back to v(N-1) is exactly
            # correct because re-folding batch N's pairs into v(N-1) is
            # pinned idempotent (replay-safety test).
            if not (mroot / f"v{v}" / "_SUCCESS").exists():
                continue
            return v, spark.read.parquet(str(mroot / f"v{v}"))
        return -1, None

    def _process(batch_df, batch_id: int) -> None:
        s = batch_df.sparkSession
        batch_df = batch_df.select("doc_id", "text")
        batch_df.write.mode("overwrite").parquet(f"{state_dir}/docs/batch_id={batch_id}")
        nb = minhash_band_table(
            s.read.parquet(f"{state_dir}/docs/batch_id={batch_id}"),
            shingle_n=shingle_n, threshold=threshold,
        )
        nb.write.mode("overwrite").parquet(f"{state_dir}/bands/batch_id={batch_id}")
        nb = s.read.parquet(f"{state_dir}/bands/batch_id={batch_id}")
        all_bands = s.read.parquet(f"{state_dir}/bands")
        all_docs = s.read.parquet(f"{state_dir}/docs")
        a_, b_ = nb.alias("a"), all_bands.alias("b")
        cands = (
            a_.join(b_, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a.id") != F.col("b.id")))
            .select(F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"))
            .distinct()
        )
        pairs = jaccard_verify(cands, all_docs, threshold=threshold,
                               shingle_n=shingle_n)
        edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        _, mapping = _latest_mapping()
        mapping = connected_components(edges) if mapping is None \
            else incremental_components(mapping, edges)
        mapping.write.mode("overwrite").parquet(f"{state_dir}/mapping/v{batch_id}")

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
