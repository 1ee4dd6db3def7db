"""Custom STATEFUL streaming operators: cross-batch exact dedup and
watermarked windowed ingest rates.

The reference has no streaming surface (SURVEY.md §2.6); these are the
Spark-native operators a continuously-fed corpus needs on top of the
availableNow incremental path (streaming/incremental.py):

- ``streaming_exact_dedup`` — the streaming counterpart of
  ``operators.dedup.exact_dedup`` (ref parity: the batch dedup family,
  VERDICT r4 "LLM-data-pipeline operators"). A document whose content
  hash was emitted in ANY earlier microbatch — including earlier runs
  resumed from the same checkpoint — is suppressed. Implemented with
  ``applyInPandasWithState`` keyed by the JVM-computed content hash:
  the state store is partitioned by that key, so at 100 TB the seen-set
  shards across executors (RocksDB-backed on a real cluster) instead of
  living in any single process. Arrow moves only (hash, id) pairs plus
  the first-seen payload; the text itself never crosses into Python.

- ``streaming_windowed_doc_counts`` — event-time tumbling-window
  ingest counts with a watermark. Append mode means a window row is
  emitted exactly once, when the watermark passes its end; in-watermark
  late arrivals still count, beyond-watermark stragglers are dropped —
  the bounded-state contract a 100 TB ingest needs (without the
  watermark the window state grows forever).

Content-key parity: the hash is ``md5(coalesce(text, ''))`` — the same
key ``exact_dedup`` groups on — so a streaming run over N file drops
and one batch ``exact_dedup`` over their union pick identical
representatives (first-seen here means min doc_id within the batch
that introduced the hash; the pytest pins the cross-run suppression,
not id-order equivalence across interleavings, which depends on
arrival order by construction).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "content_hash string, doc_id string, batch_dups bigint"
_DEDUP_STATE_SCHEMA = "seen boolean"


def _first_seen_per_hash(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one row the first time a content hash is ever seen; record
    it in the per-key state so every later batch suppresses it."""
    ids: list = []
    for pdf in pdfs:
        ids.extend(pdf["doc_id"].tolist())
    if state.exists:
        # already emitted in an earlier microbatch (possibly an earlier
        # run restored from the checkpoint): suppress
        return iter(())
    state.update((True,))
    return iter(
        (
            pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "doc_id": [min(ids)],
                    "batch_dups": [len(ids)],
                }
            ),
        )
    )


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow stream: new document files → first-seen docs only.

    Re-invoking with the same checkpoint after more files land
    processes just the delta AND remembers every hash emitted before —
    the cross-batch guarantee the batch path can't give without
    re-reading its whole output. ``max_files_per_trigger`` bounds the
    per-microbatch footprint (availableNow still drains everything).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    hashed = stream.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
    )
    firsts = hashed.groupBy("content_hash").applyInPandasWithState(
        _first_seen_per_hash,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        firsts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def streaming_windowed_doc_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str = "event_time",
    window_duration: str = "10 minutes",
    watermark_delay: str = "15 minutes",
    timeout_sec: int = 300,
) -> None:
    """availableNow stream: event-time tumbling-window doc counts.

    Append mode + watermark = each window row is written exactly once,
    after the watermark passes its end; state for closed windows is
    dropped. Windows still open when the input drains stay unemitted
    until a later run's data advances the watermark — that is the
    correct streaming contract, not a bug (the pytest exercises it).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("n_docs"),
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def batch_exact_dedup_equivalent(
    spark: SparkSession, input_dir: str, schema: str,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """The batch twin the streaming dedup is checked against: same
    content key, min-id representative over the whole directory."""
    from ..operators.dedup import exact_dedup

    return exact_dedup(
        spark.read.schema(schema).parquet(input_dir), text_col, id_col
    )


# ---------------------------------------------------------------------------
# A15 live: conceptual saturation over ARRIVAL batches. The batch
# operator (analytics.conceptual_saturation) replays history in
# doc_id-rank batches; this one measures the real thing — how many
# never-before-seen concepts each microbatch of newly-landed documents
# contributes — with the same first-seen state machinery as the dedup
# above, keyed by normalized concept surface (vocabulary-sized state,
# not corpus-sized).
# ---------------------------------------------------------------------------

_SAT_OUTPUT_SCHEMA = "concept string, batch_mentions bigint"


def _first_seen_concept(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    if state.exists:
        return iter(())
    state.update((True,))
    return iter((pd.DataFrame({"concept": [key[0]], "batch_mentions": [n]}),))


def streaming_concept_saturation(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    surfaces: tuple[str, ...],
    timeout_sec: int = 300,
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow stream: docs → mention extraction (the SAME pure
    mapInPandas transformation batch E1 uses — streaming-legal because
    it is stateless per document) → first-seen concept filter → one
    batch_id-scoped parquet per microbatch. ``saturation_curve`` turns
    the directories into the A15 shape."""
    from ..fixtures.generator import DOCUMENT_SCHEMA
    from ..operators import extraction as E

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    clean = E.preprocess(E.concat_text_spans(docs))
    mentions = E.extract(clean, surfaces, relations=False).select(
        F.explode("mentions").alias("m")
    ).select(F.col("m.norm_surface").alias("concept"))
    firsts = mentions.groupBy("concept").applyInPandasWithState(
        _first_seen_concept,
        outputStructType=_SAT_OUTPUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    q = (
        firsts.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def saturation_curve(spark: SparkSession, output_dir: str) -> DataFrame:
    """(batch_id, new_concepts, cumulative_concepts) from the committed
    first-seen directories — the A15 saturation curve over arrival
    order. The cumulative window is over batch ids (bounded), not rows."""
    from pyspark.sql import Window

    per_batch = (
        spark.read.option("basePath", output_dir)
        .parquet(f"{output_dir}/batch_id=*")
        .groupBy("batch_id")
        .agg(F.count("*").alias("new_concepts"))
    )
    w = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, 0)
    # single unpartitioned window is fine: one row per MICROBATCH
    return per_batch.select(
        "batch_id", "new_concepts",
        F.sum("new_concepts").over(w).alias("cumulative_concepts"),
    ).orderBy("batch_id")
