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
    from ..functions.windows import ranked_topk

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), C.cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine_sim")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k then driver merge); rank attached via sorted-array
    # posexplode — zero WindowExec in the plan.
    return ranked_topk(scored, "cosine_sim", id_col, k).select(
        id_col, "cosine_sim", "rank"
    )


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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer trained by a few
# Lloyd iterations expressed as DataFrame ops, then probe-top-P search.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd's k-means as a driver loop of DataFrame jobs: assignment is
    a vectorized argmax per Arrow batch against the broadcast centroid
    matrix; the update is one groupBy over (centroid, dim-sums) rows.
    Deterministic: init = seeded sample of input vectors."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string")) + seed, F.lit(997)), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in init_rows])

    for _ in range(n_iters):
        assigned = assign_ivf(df, cents, vec_col, id_col)
        # update: mean vector per cluster via per-dimension aggregation
        dim = cents.shape[1]
        sums = assigned.select(
            "ivf_cluster",
            *[F.element_at(F.col(vec_col).cast("array<double>"), i + 1).alias(f"x{i}") for i in range(dim)],
        ).groupBy("ivf_cluster").agg(
            F.count("*").alias("n"), *[F.sum(f"x{i}").alias(f"s{i}") for i in range(dim)]
        ).collect()
        new = cents.copy()
        for r in sums:
            c = r["ivf_cluster"]
            n = r["n"]
            if n > 0:
                new[c] = np.array([r[f"s{i}"] for i in range(dim)]) / n
        if np.allclose(new, cents, atol=1e-9):
            break
        cents = new
    return cents


def assign_ivf(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Add ivf_cluster = argmin L2 distance to the broadcast centroids
    (one numpy matmul per Arrow batch)."""
    C_ = centroids.astype(np.float64)
    c_sq = (C_ * C_).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin ||v-c||^2 = argmin (c.c - 2 v.c)
        d = c_sq[None, :] - 2.0 * (V @ C_.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn("ivf_cluster", assign_udf(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k scanning only the n_probe closest clusters. At scale
    the assignment is precomputed and the table is partitioned by
    ivf_cluster → probing is partition pruning, not a scan."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = (centroids * centroids).sum(axis=1) - 2.0 * (centroids @ q)
    probes = [int(i) for i in np.argsort(d)[:n_probe]]
    assigned = assign_ivf(df, centroids, vec_col, id_col)
    cand = assigned.where(F.col("ivf_cluster").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)
