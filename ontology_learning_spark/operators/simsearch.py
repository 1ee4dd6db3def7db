"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: JVM-side dot/norm via higher-order array
  functions (columns.cosine) — the correctness baseline, one pass, no
  Python, no shuffle except the global top-k window.
- LSH-bucketed ANN (random hyperplanes): the scale path — signature is
  computed map-side from a deterministic seeded projection; the probe
  only scores vectors sharing a bucket (multi-probe over signature
  neighbors for recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import columns as C


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), C.cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine_sim")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k then driver merge) — no single-partition global window.
    top = scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))  # window over k rows only


def pairwise_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    q_id_col: str = "query_id",
) -> DataFrame:
    """Top-k per query via broadcast of the (small) query set."""
    q = F.broadcast(
        queries.select(F.col(q_id_col), F.col(q_vec_col).cast("array<double>").alias("qv"))
    )
    joined = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")).crossJoin(q)
    scored = joined.select(
        q_id_col, id_col, C.cosine(F.col("v"), F.col("qv")).alias("cosine_sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(q_id_col, id_col, "cosine_sim", F.col("rnk").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature as an int bucket id (vectorized UDF:
    one matmul per Arrow batch)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T) > 0
        out = np.zeros(len(vecs), dtype=np.int32)
        for b in range(planes.shape[0]):
            out |= bits[:, b].astype(np.int32) << b
        return pd.Series(out)

    return df.withColumn("lsh_bucket", sig_udf(F.col(vec_col)))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's bucket (plus
    buckets within `multiprobe_bits` bit-flips for recall)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (planes @ np.asarray(query_vec, dtype=np.float64)) > 0
    qsig = 0
    for b in range(n_planes):
        qsig |= int(qbits[b]) << b
    probes = {qsig}
    if multiprobe_bits >= 1:
        for b in range(n_planes):
            probes.add(qsig ^ (1 << b))

    with_sig = lsh_signatures(df, dim, n_planes, seed, vec_col)
    cand = with_sig.where(F.col("lsh_bucket").isin(*[int(p) for p in probes]))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket self-join (same LSH
    signature) → exact cosine verify >= threshold. High-cosine pairs
    collide with high probability; bands can be added for recall."""
    sig = lsh_signatures(df, _first_dim(df, vec_col), n_planes, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"), "lsh_bucket"
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = a.join(
        b, (F.col("a.lsh_bucket") == F.col("b.lsh_bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
    )
    return (
        cand.withColumn("cosine_sim", C.cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _first_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    return int(row["d"])
