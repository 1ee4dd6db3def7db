"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the biggest repeated cost is re-shuffling fact tables on the
same key across runs (mentions by norm_surface, triples by subj).
Writing them bucketed by that key makes every subsequent equi-join and
aggregation on the key exchange-free: Spark's native data-source tables
support bucketing without Hive (`bucketBy(...).saveAsTable`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str,
                                  key: str) -> tuple[DataFrame, bool]:
    """Join two same-bucketed tables; returns (df, no_shuffle?) for
    plan verification."""
    df = spark.table(left).join(spark.table(right), key)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return df, "Exchange hashpartitioning" not in plan
