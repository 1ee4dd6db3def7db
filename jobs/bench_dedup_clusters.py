#!/usr/bin/env python
"""dedup_clusters at bench scale (VERDICT r3 #7): the operator is
driver-oracled on the 500-doc corpus; this measures the CC rounds and
verify cost on the 320k-doc scaling corpus with a ~1% planted
dup-cluster rate (each planted cluster = base doc + two perturbed
copies, so transitive chains exercise the component step, not just
pair detection):

    python jobs/bench_dedup_clusters.py \
        --corpus /tmp/ols_scale_corpus_320000.parquet

Prints ONE JSON line with wall seconds, cluster counts, and the
planted-vs-found recovery rate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/ols_scale_corpus_320000.parquet")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--plant-mod", type=int, default=100, help="plant dups for 1/mod of docs")
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from ontology_learning_spark.operators.dedup import dedup_clusters
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="bench-dedup-clusters", master=args.master)
    corpus = spark.read.parquet(args.corpus)
    text = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat_ws(" ", F.expr("transform(spans, s -> s.text)")).alias("text"),
    )
    # ~1% of docs get two near-dup copies (drop last / first token —
    # shingle Jaccard ≈ (n-3)/n ≥ 0.9 for docs past ~30 shingles), so
    # each planted cluster is a 3-member transitive chain.
    sel = text.where(F.pmod(F.xxhash64("doc_id"), F.lit(args.plant_mod)) == 0)
    dup_a = sel.select(
        F.concat(F.lit("dupA:"), "doc_id").alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    dup_b = sel.select(
        F.concat(F.lit("dupB:"), "doc_id").alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    # 128 partitions bounds the per-task exploded-shingle footprint
    # (~250k shingle rows/task at 320k docs); local mode shares one
    # JVM heap across all threads, so run with SPARK_DRIVER_MEM>=32g.
    aug = text.unionByName(dup_a).unionByName(dup_b).repartition(128).cache()
    n_docs = aug.count()
    n_planted = sel.count()

    t0 = time.time()
    out = dedup_clusters(aug, threshold=args.threshold).cache()
    n_clusters = out.count()
    wall = time.time() - t0
    sizes = {r["cluster_size"]: r["n"] for r in
             out.groupBy("cluster_size").agg(F.count("*").alias("n")).collect()}
    print(json.dumps({
        "metric": "dedup_clusters_320k_wall_sec",
        "value": round(wall, 2),
        "docs": n_docs,
        "planted_clusters": n_planted,
        "found_clusters": n_clusters,
        "cluster_size_histogram": {str(k): v for k, v in sorted(sizes.items())},
        "docs_per_sec": round(n_docs / wall, 1),
        "master": args.master,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
