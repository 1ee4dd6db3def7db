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
        mentions.write.mode("append").parquet(output_dir)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
