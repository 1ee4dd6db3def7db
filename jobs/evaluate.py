#!/usr/bin/env python
"""Evaluation job (SURVEY.md §3.4): gold-standard P/R/F1 + structural
audits over a pipeline run's output tables.

    spark-submit jobs/evaluate.py --run-dir /path/out/<run_id> [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ontology_learning_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True, help="output dir of run_pipeline (contains triples/, nodes/, edges/)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="kg-evaluate", master=args.master)

    from pyspark.sql import functions as F

    from ontology_learning_spark.fixtures import baseline
    from ontology_learning_spark.functions import semantics as S
    from ontology_learning_spark.operators import analytics as A
    from ontology_learning_spark.operators import graph_ops as G

    triples = spark.read.parquet(f"{args.run_dir}/triples")
    nodes = spark.read.parquet(f"{args.run_dir}/nodes")
    edges = spark.read.parquet(f"{args.run_dir}/edges")
    decisions = spark.read.parquet(f"{args.run_dir}/decisions")

    gold = spark.createDataFrame(
        [
            (S.normalize_name(r["source"]), r["type"], S.normalize_name(r["target"]))
            for r in baseline.gold_relations()
        ],
        "subj string, pred string, obj string",
    )
    gold_concepts = spark.createDataFrame(
        [(S.normalize_name(c),) for c in baseline.gold_concepts()], "name string"
    )

    pr = A.gold_standard_eval(triples, gold).collect()[0].asDict()
    cov = A.concept_coverage(
        triples.select(F.col("subj").alias("name")), gold_concepts
    ).collect()[0].asDict()
    stats = A.stats_endpoint(nodes, edges, decisions).collect()[0].asDict()
    depth = G.hierarchy_depth(edges, "Thing")
    n_orphans = G.orphans(nodes, edges).count()
    rel_hist = {r["rel_type"]: r["n"] for r in G.rel_type_histogram(edges).collect()}

    print(json.dumps({
        "gold_triples": pr,
        "concept_coverage": cov,
        "stats": stats,
        "hierarchy_depth": depth,
        "orphans": n_orphans,
        "rel_type_histogram": rel_hist,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
