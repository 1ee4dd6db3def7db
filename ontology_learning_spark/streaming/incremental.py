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

from pyspark.sql import SparkSession

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
        mentions, _, _ = E.extract_pipeline(batch_df, surfaces)
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
