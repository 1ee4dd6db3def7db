"""IVF ANN tests: clustering recovers planted structure; probe search
recalls true neighbors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.operators import simsearch as SS


@pytest.fixture(scope="module")
def clustered_df(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 8) * 5
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + 0.2 * rng.randn(8)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>, true_cluster int").cache()


def test_ivf_training_recovers_clusters(clustered_df):
    cents = SS.train_ivf_centroids(clustered_df, n_centroids=4, n_iters=6)
    assigned = SS.assign_ivf(clustered_df, cents)
    # every true cluster should map (almost) entirely to one ivf cluster
    agg = assigned.groupBy("true_cluster", "ivf_cluster").count().collect()
    best = {}
    totals = {}
    for r in agg:
        totals[r["true_cluster"]] = totals.get(r["true_cluster"], 0) + r["count"]
        if r["count"] > best.get(r["true_cluster"], (0, None))[0]:
            best[r["true_cluster"]] = (r["count"], r["ivf_cluster"])
    purity = sum(b[0] for b in best.values()) / sum(totals.values())
    assert purity > 0.95
    # the 4 true clusters map to 4 distinct ivf clusters
    assert len({b[1] for b in best.values()}) == 4


def test_ivf_topk_matches_brute_force(clustered_df):
    cents = SS.train_ivf_centroids(clustered_df, n_centroids=4, n_iters=6)
    q = [float(x) for x in clustered_df.where("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"] for r in SS.brute_force_topk(clustered_df, q, k=5).collect()]
    approx = [r["vec_id"] for r in SS.ivf_topk(clustered_df, q, cents, k=5, n_probe=1).collect()]
    # query's own cluster holds its true neighbors → recall ≈ 1 at n_probe=1
    assert len(set(exact) & set(approx)) >= 4
    assert approx[0] == 0
