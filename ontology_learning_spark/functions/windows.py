"""Scalable global-ordering primitives — no single-partition WindowExec.

A `Window.orderBy(...)` with no partition key moves the whole input to
ONE partition (Spark logs `WindowExec: No Partition Defined`); at 100 TB
that is a driver-style bottleneck. Three replacement idioms:

- ``ranked_topk``: global top-k + rank column. orderBy+limit compiles
  to TakeOrderedAndProject (per-partition top-k, driver merge of k-row
  heaps); the rank is attached by packing the k survivors into one
  sorted array and posexploding — O(k) work, no WindowExec at all.
- ``global_rank``: rank every row of a DIMENSION (unique key per row).
  Range-repartition on the key, rank locally per partition (window
  partitioned by the physical partition id), then add per-partition
  offsets from one #partitions-row collect — the classic two-phase
  distributed rank.
- ``global_cumsum``: running sum over a unique-keyed dimension, same
  two-phase shape (local prefix sums + per-partition base offsets).

All three keep every shuffle key-partitioned; the only driver material
is one row per partition (counts/totals), never data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(df: DataFrame, score_col: str, id_col: str, k: int,
                rank_col: str = "rank") -> DataFrame:
    """Top-k rows by (score desc, id asc) with a 1-based ``rank_col``.

    Plan shape: TakeOrderedAndProject → single-row collect_list agg →
    array_sort → posexplode. The array holds k rows (bounded by
    construction), so the single-row stage is O(k) regardless of input
    size. Requires a numeric ``score_col`` (negated for the sort key)
    and an orderable ``id_col`` tie-break.
    """
    cols = df.columns
    top = df.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)
    packed = top.select(
        F.struct(
            (-F.col(score_col)).alias("_neg_score"),
            F.col(id_col).alias("_tie"),
            F.struct(*[F.col(c) for c in cols]).alias("p"),
        ).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("a"))
    return packed.select(F.posexplode("a").alias("_pos", "s")).select(
        (F.col("_pos") + 1).cast("int").alias(rank_col), F.col("s.p.*")
    )


def _with_partition_offsets(df: DataFrame, order_col: str, agg_col,
                            num_partitions: int | None = None):
    """Range-partition ``df`` by ``order_col``, compute per-partition
    ``agg_col`` totals, and return (partitioned_df_with_pid, offsets)
    where offsets[pid] = sum of totals of all lower partitions."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # localCheckpoint pins the (non-deterministic) pid assignment so the
    # totals pass and the ranking pass see identical partitioning.
    part = part.localCheckpoint()
    totals_df = part.groupBy("_pid").agg(agg_col.alias("_t"))
    # Offset type follows the aggregate's type: a fractional value_col
    # (summing doubles) must not silently truncate through a hardcoded
    # bigint offsets schema.
    agg_type = totals_df.schema["_t"].dataType.simpleString()
    off_type = "double" if agg_type == "float" else agg_type
    totals = totals_df.collect()
    totals_by_pid = {r["_pid"]: r["_t"] for r in totals}
    # The zero accumulator must carry the offset column's Python type:
    # the createDataFrame verifier rejects int 0 for double/decimal
    # offsets (bites on empty inputs and on the first partition's row).
    if off_type == "double":
        zero = 0.0
    elif off_type.startswith("decimal"):
        from decimal import Decimal

        zero = Decimal(0)
    else:
        zero = 0
    rows, acc = [], zero
    for pid in sorted(totals_by_pid):
        rows.append((pid, acc))
        acc += totals_by_pid[pid] or zero
    offsets = spark.createDataFrame(rows or [(0, zero)], f"_pid int, _off {off_type}")
    return part, F.broadcast(offsets)


def global_rank(df: DataFrame, order_col: str, rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """1-based global rank by ``order_col`` ascending. ``order_col``
    must be unique per row (rank a dimension, then join it back) —
    range partitioning keeps equal keys co-located but row_number
    within ties would be partition-order dependent otherwise."""
    part, offsets = _with_partition_offsets(
        df, order_col, F.count("*"), num_partitions
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        part.withColumn("_local", F.row_number().over(w))
        .join(offsets, "_pid")
        .withColumn(rank_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def global_cumsum(df: DataFrame, order_col: str, value_col: str,
                  out_col: str, num_partitions: int | None = None) -> DataFrame:
    """Running sum of ``value_col`` by ``order_col`` ascending (unique
    keys), as local prefix sums + per-partition base offsets."""
    part, offsets = _with_partition_offsets(
        df, order_col, F.sum(value_col), num_partitions
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("_local", F.sum(value_col).over(w))
        .join(offsets, "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
