#!/usr/bin/env python
"""Benchmark harness (driver contract: ONE JSON line on stdout).

Headline metric: triples/sec of the flagship KG-construction pipeline
over the sf documents table (re-shaped to interleaved spans), plus
wall-clock for representative queries from __spark_entry__.queries().

    python bench.py                       # sf from $SPARK_GRAFT_SF_DIR
    python bench.py --scaling             # local[8] vs local[32] scaling
                                          # efficiency → BENCH/BASELINE.md

Scaling mode spawns one subprocess per parallelism level (one JVM
each), same seed/input, and reports throughput at both — the sandbox
stand-in for the north_rule N vs 4N executor requirement.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "kg_mention_counts",
    "kg_doc_mentions",
    "dedup_exact",
    "minhash_near_dups",
    "text_quality",
    "text_lang_id",
    "emb_topk",
    "emb_near_dups",
    "rel_q1_pricing",
    "rel_topk_customers",
    "rel_events_cumsum",
    "graph_descendants",
    "multimodal_decode",
]


def run_suite(master: str, sf_dir: str, pipeline_only: bool = False,
              n_docs_override: int | None = None) -> dict:
    import __spark_entry__ as entry_mod
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="ols-bench", master=master)
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    # Warm the JVM/codegen so measurements aren't dominated by startup.
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # Headline: flagship pipeline triples/sec over the seeded
    # interleaved-span corpus (sized by sf; same generator as the
    # correctness fixtures, so relation patterns actually fire).
    from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA, generate_documents
    from ontology_learning_spark.plans.pipeline import run_pipeline

    n_docs = n_docs_override or max(500, int(50_000 * sf))
    corpus = spark.createDataFrame(
        generate_documents(n_docs=n_docs, seed=42), schema=DOCUMENT_SCHEMA
    ).repartition(CPUS).cache()
    corpus.count()  # materialize outside the timed window

    t0 = time.time()
    res = run_pipeline(spark, corpus)
    n_triples = res.triples.count()
    n_mentions = res.mentions.count()
    pipeline_sec = time.time() - t0
    timings["kg_pipeline"] = round(pipeline_sec, 3)
    n_decisions = res.decisions.count()

    for name in [] if pipeline_only else BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_pipeline_triples_per_sec",
        "value": round(n_triples / pipeline_sec, 2),
        "unit": "triples/sec",
        "queries": timings,
        "sf": sf,
        "master": master,
        "docs": n_docs,
        "mentions": n_mentions,
        "triples": n_triples,
        "decisions": n_decisions,
        "docs_per_sec": round(n_docs / pipeline_sec, 2),
        "total_query_sec": total,
    }
    spark.stop()
    return out


def scaling_mode(sf_dir: str) -> None:
    """Run the suite at local[8] and local[32]; write BENCH/BASELINE.md."""
    # 4x the default corpus: the scaling signal needs parallelizable
    # work (extraction) to dominate fixed driver overhead.
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_docs = 4 * max(500, int(50_000 * sf))
    results = {}
    for n in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--master", f"local[{n}]", "--sf-dir", sf_dir,
             "--pipeline-only", "--n-docs", str(n_docs)],
            capture_output=True, text=True, timeout=3600,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    thr8 = results[8]["value"]
    thr32 = results[32]["value"]
    eff = (thr32 / thr8) / 4 if thr8 else 0.0
    Path("BENCH").mkdir(exist_ok=True)
    md = [
        "# BENCH/BASELINE.md — measured throughput + scaling",
        "",
        f"Input: `{sf_dir}` (seed=42, fixed). Same suite at two parallelism",
        "levels standing in for N vs 4N executors (north_rule).",
        "",
        "| master | pipeline triples/sec | pipeline wall (s) | docs/sec |",
        "|---|---|---|---|",
        f"| local[8] | {thr8} | {results[8]['queries']['kg_pipeline']} | {results[8]['docs_per_sec']} |",
        f"| local[32] | {thr32} | {results[32]['queries']['kg_pipeline']} | {results[32]['docs_per_sec']} |",
        "",
        f"**Scaling efficiency (thr32/thr8)/4 = {eff:.3f}** (target ≥ 0.8 on a",
        "real cluster; local mode under-counts because stage startup and the",
        "constant-size linking tail don't parallelize).",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in results[8]["queries"]:
        md.append(f"| {q} | {results[8]['queries'][q]} | {results[32]['queries'][q]} |")
    Path("BENCH/BASELINE.md").write_text("\n".join(md) + "\n")
    print(json.dumps({"scaling_efficiency": round(eff, 3), "thr8": thr8, "thr32": thr32}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--n-docs", type=int, default=None)
    args = ap.parse_args()
    if args.scaling:
        scaling_mode(args.sf_dir)
    else:
        print(json.dumps(run_suite(args.master, args.sf_dir, args.pipeline_only, args.n_docs)))


if __name__ == "__main__":
    main()
