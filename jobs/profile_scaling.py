#!/usr/bin/env python
"""Per-stage core-second attribution for the N-vs-4N scaling gap
(VERDICT r3 #1: "either efficiency ≥ 0.65 or a named non-scaling stage
with per-stage core-second attribution").

Runs the flagship pipeline once (after the standard warm-up) with the
Spark event log enabled, then parses SparkListenerTaskEnd metrics into
per-stage totals:

    python jobs/profile_scaling.py --master 'local-cluster[4,1,4096]' \
        --corpus /tmp/ols_scale_corpus_320000.parquet

Prints ONE JSON line: total + per-stage executorRunTime (core-seconds
occupied) and executorCpuTime (CPU actually burned) for stages
submitted inside the timed window. Comparing the per-stage cpu_s
between a 4-executor and a 16-executor run answers WHICH stage burns
more CPU at higher parallelism (a true non-scaling stage) vs where the
wall gap is scheduler idle/host steal (work-conserving job, environment
throttle).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[4,1,4096]")
    ap.add_argument("--corpus", default="/tmp/ols_scale_corpus_320000.parquet")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import tempfile

    from ontology_learning_spark.fixtures import baseline
    from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA, generate_documents
    from ontology_learning_spark.operators import linking as L
    from ontology_learning_spark.plans.pipeline import run_pipeline
    from ontology_learning_spark.session import build_session

    evdir = tempfile.mkdtemp(prefix="ols_evlog_")
    spark = build_session(
        app_name="profile-scaling", master=args.master,
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": evdir,
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.rolling.enabled": "false"},
    )
    cores = spark.sparkContext.defaultParallelism
    corpus = spark.read.parquet(args.corpus)
    n_docs = corpus.count()
    corpus = corpus.repartition(max(cores, n_docs // 1250)).cache()
    corpus.count()
    catalog = L.prepare_catalog(spark, baseline.entity_catalog()).cache()
    warm = spark.createDataFrame(
        generate_documents(n_docs=500, seed=7), schema=DOCUMENT_SCHEMA
    ).repartition(2 * cores).cache()
    run_pipeline(spark, warm, catalog_df=catalog).triples.count()
    warm.unpersist()

    def _host():
        return [int(x) for x in Path("/proc/stat").read_text().splitlines()[0].split()[1:]]

    c0 = _host()
    t0 = time.time()
    res = run_pipeline(spark, corpus, catalog_df=catalog)
    n_triples = res.triples.count()
    wall = time.time() - t0
    c1 = _host()
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d) or 1
    steal_pct, idle_pct = round(100 * d[7] / tot, 1), round(100 * d[3] / tot, 1)
    t0_ms = int(t0 * 1000)
    spark.stop()

    # Spark 4 rolling event logs are a directory per app
    # (eventlog_v2_<app>/events_*); collect every regular file
    ev_files = [p for p in Path(evdir).rglob("*") if p.is_file()]
    stage_names: dict[int, str] = {}
    stage_submit: dict[int, int] = {}
    run_ms: dict[int, float] = {}
    cpu_ms: dict[int, float] = {}
    tasks: dict[int, int] = {}
    for f in ev_files:
        for line in f.open(errors="ignore"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si["Stage Name"]
                stage_submit[si["Stage ID"]] = si.get("Submission Time", 0)
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                run_ms[sid] = run_ms.get(sid, 0) + m.get("Executor Run Time", 0)
                cpu_ms[sid] = cpu_ms.get(sid, 0) + m.get("Executor CPU Time", 0) / 1e6
                tasks[sid] = tasks.get(sid, 0) + 1

    timed = [sid for sid in run_ms if stage_submit.get(sid, 0) >= t0_ms]
    per_stage = sorted(
        (
            {
                "stage": sid,
                "name": stage_names.get(sid, "?")[:80],
                "tasks": tasks.get(sid, 0),
                "run_core_s": round(run_ms[sid] / 1000, 1),
                "cpu_core_s": round(cpu_ms[sid] / 1000, 1),
            }
            for sid in timed
        ),
        key=lambda d: -d["cpu_core_s"],
    )
    print(json.dumps({
        "metric": "profile_scaling",
        "master": args.master,
        "wall_sec": round(wall, 2),
        "host_steal_pct": steal_pct,
        "host_idle_pct": idle_pct,
        "triples": n_triples,
        "total_run_core_s": round(sum(run_ms[s] for s in timed) / 1000, 1),
        "total_cpu_core_s": round(sum(cpu_ms[s] for s in timed) / 1000, 1),
        "n_stages": len(timed),
        "stages": per_stage[: args.top],
    }))


if __name__ == "__main__":
    main()
