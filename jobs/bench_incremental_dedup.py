#!/usr/bin/env python
"""End-to-end incremental dedup economics at bench scale: fold a 10%
document delta into an existing DedupState vs re-running the full
LSH+verify+CC pipeline over the grown corpus.

    python jobs/bench_incremental_dedup.py \
        --corpus /tmp/ols_scale_corpus_320000.parquet

Same planted-dup scheme as bench_dedup_clusters (~1% of docs get two
near-dup copies → 3-member transitive chains); the hash split puts a
share of each chain's members on both sides of the base/delta cut, so
the delta fold must discover cross-split pairs against the STORED band
table, not just intra-delta ones. Prints ONE JSON line with both walls
and the equivalence check (incremental mapping ≡ one-shot mapping).
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
    ap.add_argument("--plant-mod", type=int, default=100)
    ap.add_argument("--delta-mod", type=int, default=10, help="1/mod of docs arrive as the delta")
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from ontology_learning_spark.operators.canonicalize import connected_components
    from ontology_learning_spark.operators.dedup import (
        dedup_state_init,
        dedup_state_update,
        ngram_jaccard_pairs,
    )
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="bench-inc-dedup", master=args.master)
    corpus = spark.read.parquet(args.corpus)
    text = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat_ws(" ", F.expr("transform(spans, s -> s.text)")).alias("text"),
    )
    sel = text.where(F.pmod(F.xxhash64("doc_id"), F.lit(args.plant_mod)) == 0)
    dup_a = sel.select(
        F.concat(F.lit("dupA:"), "doc_id").alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    dup_b = sel.select(
        F.concat(F.lit("dupB:"), "doc_id").alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    aug = text.unionByName(dup_a).unionByName(dup_b).repartition(128).cache()
    n_docs = aug.count()

    is_delta = F.pmod(F.xxhash64("doc_id"), F.lit(args.delta_mod)) == 0
    base = aug.where(~is_delta).repartition(128).cache()
    delta = aug.where(is_delta).repartition(32).cache()
    n_base, n_delta = base.count(), delta.count()

    t0 = time.time()
    st = dedup_state_init(base, threshold=args.threshold)
    st.mapping.count()
    wall_init = time.time() - t0

    t0 = time.time()
    st = dedup_state_update(st, delta, aug, threshold=args.threshold)
    n_mapped = st.mapping.count()
    wall_update = time.time() - t0

    t0 = time.time()
    full_pairs = ngram_jaccard_pairs(aug, threshold=args.threshold)
    full = connected_components(
        full_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).localCheckpoint()
    n_full = full.count()
    wall_full = time.time() - t0

    mismatches = st.mapping.exceptAll(full).count() + full.exceptAll(st.mapping).count()
    print(json.dumps({
        "metric": "incremental_dedup",
        "docs_total": n_docs,
        "docs_base": n_base,
        "docs_delta": n_delta,
        "wall_init_sec": round(wall_init, 2),
        "wall_delta_fold_sec": round(wall_update, 2),
        "wall_full_recompute_sec": round(wall_full, 2),
        "delta_speedup_vs_full": round(wall_full / max(wall_update, 1e-9), 2),
        "mapped_nodes": n_mapped,
        "mapped_nodes_full": n_full,
        "mismatches": mismatches,
        "equivalent": mismatches == 0 and n_mapped == n_full,
        "master": args.master,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
