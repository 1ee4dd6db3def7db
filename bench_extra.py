#!/usr/bin/env python
"""Focused per-query measurement harness for the optimization rounds.

`bench.py` is the frozen driver contract; this file exists so the
optimization work can (a) time individual queries in isolation with the
noop sink (guide §1.4 — the computation, not the sink/count), (b) dump
`.explain("formatted")` plans to plans/r06/, and (c) compare
before/after without touching the frozen harness.

    python bench_extra.py --queries minhash_near_dups dedup_clusters
    python bench_extra.py --explain-dir plans/r06 --suffix before
    python bench_extra.py --all --reps 2

Reads the same env contract as bench.py: $SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--explain-dir", default=None,
                    help="dump explain('formatted') per query to this dir")
    ap.add_argument("--suffix", default="plan",
                    help="plan file suffix: <query>_<suffix>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of count()")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="ols-bench-extra", master=f"local[{CPUS}]")
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()

    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    names = args.queries or (sorted(qs) if args.all else [])

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.explain_dir:
            Path(args.explain_dir).mkdir(parents=True, exist_ok=True)
            plan = fn(spark, args.sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, args.sf_dir)._jdf.queryExecution(), "formatted")
            Path(args.explain_dir, f"{name}_{args.suffix}.txt").write_text(plan)
        reps = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = reps
        print(json.dumps({name: reps}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "timings": out,
                      "min": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
