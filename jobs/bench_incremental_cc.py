#!/usr/bin/env python
"""Delta-fold canonicalization economics: incremental_components vs a
full CC recompute when a small alias-edge delta arrives on top of a
large accumulated edge set.

    python jobs/bench_incremental_cc.py --n-edges 500000 --delta-pct 1

Prints ONE JSON line with both walls, the speedup, and the equivalence
check (the incremental mapping must be row-identical to the full
recompute — the same contract the pytest pins at small scale).

Why this matters at 100 TB: the accumulated alias graph is 10^9+ edges;
a daily batch touches a few thousand components. Full CC re-reads and
re-shuffles the whole history every run (O(E · rounds)); the delta fold
reads the delta + the (node-sized) mapping once and runs CC only on the
contracted component graph (≤ 2·|delta| nodes).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-edges", type=int, default=500_000)
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--n-nodes", type=int, default=None,
                    help="default 2x edges/3 (forest-ish: many mid-size components)")
    ap.add_argument("--master", default="local[16]")
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from ontology_learning_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="bench-inc-cc", master=args.master)
    rng = random.Random(42)
    n_nodes = args.n_nodes or (2 * args.n_edges // 3)
    n_delta = max(1, int(args.n_edges * args.delta_pct / 100))

    def edge():
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        return (f"n{a:09d}", f"n{b:09d}")

    base = [e for e in (edge() for _ in range(args.n_edges)) if e[0] != e[1]]
    delta = [e for e in (edge() for _ in range(n_delta)) if e[0] != e[1]]
    base_df = spark.createDataFrame(base, "src string, dst string") \
        .repartition(32).cache()
    delta_df = spark.createDataFrame(delta, "src string, dst string").cache()
    base_df.count(), delta_df.count()

    # the standing mapping a production pipeline would already hold
    mapping = connected_components(base_df).localCheckpoint()
    mapping.count()

    t0 = time.time()
    inc = incremental_components(mapping, delta_df).localCheckpoint()
    n_inc = inc.count()
    wall_inc = time.time() - t0

    t0 = time.time()
    full_df = base_df.unionByName(delta_df)
    full = connected_components(full_df).localCheckpoint()
    n_full = full.count()
    wall_full = time.time() - t0

    mismatches = inc.exceptAll(full).count() + full.exceptAll(inc).count()
    print(json.dumps({
        "metric": "incremental_cc",
        "n_edges_base": len(base),
        "n_edges_delta": len(delta),
        "n_nodes_mapped": n_full,
        "wall_full_cc_sec": round(wall_full, 2),
        "wall_incremental_sec": round(wall_inc, 2),
        "speedup": round(wall_full / max(wall_inc, 1e-9), 2),
        "rows_inc": n_inc,
        "rows_full": n_full,
        "mismatches": mismatches,
        "equivalent": mismatches == 0 and n_inc == n_full,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
