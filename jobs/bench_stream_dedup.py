#!/usr/bin/env python
"""Streaming exact dedup at bench scale: 320k docs with a 20% planted
exact-dup rate, drained through a multi-microbatch availableNow run
(maxFilesPerTrigger forces real cross-batch state), then a 10% delta
run against the same checkpoint — half of the delta repeats base
content (must be suppressed by RESTORED state), half is new.

    python jobs/bench_stream_dedup.py --n 320000

Prints ONE JSON line: full-drain wall + docs/sec, delta wall, state
key count, and the two correctness counters (emitted == distinct
hashes in both phases).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _gen(spark, path: str, n: int, id_base: int, text_base: int, dup_of: int | None, parts: int):
    """text is a deterministic ~60-word paragraph keyed by text id;
    every 5th row reuses the previous row's text key (20% exact dups).
    ``dup_of`` (delta mode): rows with odd index reuse BASE-corpus text
    keys instead (cross-run dups for the restored-state check)."""
    import pandas as pd

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                if dup_of is not None and i % 2 == 1:
                    tkey = int(i) % dup_of  # repeats a BASE-corpus key
                else:
                    tkey = text_base + int(i) - (int(i) % 5 == 4)  # 20% in-run dups
                # tkey itself leads the text so distinct keys stay
                # distinct; the filler words only add realistic bulk
                words = [f"t{tkey}"] + [f"w{(tkey * 31 + j * 7) % 9973}" for j in range(59)]
                rows.append((f"doc-{id_base + int(i):08d}", " ".join(words)))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    (
        spark.range(n)
        .repartition(parts)
        .mapInPandas(gen, "doc_id string, text string")
        .write.mode("append")
        .parquet(path)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=320_000)
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--files-per-trigger", type=int, default=8)
    args = ap.parse_args()

    from ontology_learning_spark.session import build_session
    from ontology_learning_spark.streaming.stateful import streaming_exact_dedup

    spark = build_session(app_name="bench-stream-dedup", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    root = Path(f"/tmp/ols_stream_dedup_{args.n}")
    shutil.rmtree(root, ignore_errors=True)
    in_dir, out_dir, ckpt = str(root / "in"), str(root / "out"), str(root / "ckpt")
    _gen(spark, in_dir, args.n, 0, 0, None, 32)

    schema = "doc_id string, text string"
    t0 = time.monotonic()
    streaming_exact_dedup(
        spark, in_dir, out_dir, ckpt, schema,
        max_files_per_trigger=args.files_per_trigger, timeout_sec=1800,
    )
    full_wall = time.monotonic() - t0
    emitted_full = spark.read.parquet(out_dir).count()
    distinct_full = (
        spark.read.parquet(in_dir).selectExpr("md5(coalesce(text,'')) h").distinct().count()
    )

    # 10% delta: odd rows repeat base-corpus content (cross-run dups),
    # even rows are new
    n_delta = args.n // 10
    _gen(spark, in_dir, n_delta, args.n, 10_000_000, args.n, 4)
    t0 = time.monotonic()
    streaming_exact_dedup(
        spark, in_dir, out_dir, ckpt, schema,
        max_files_per_trigger=args.files_per_trigger, timeout_sec=1800,
    )
    delta_wall = time.monotonic() - t0
    emitted_total = spark.read.parquet(out_dir).count()
    distinct_total = (
        spark.read.parquet(in_dir).selectExpr("md5(coalesce(text,'')) h").distinct().count()
    )

    print(json.dumps({
        "n": args.n,
        "n_delta": n_delta,
        "files_per_trigger": args.files_per_trigger,
        "full_wall_sec": round(full_wall, 2),
        "full_docs_per_sec": round(args.n / full_wall, 1),
        "delta_wall_sec": round(delta_wall, 2),
        "delta_docs_per_sec": round(n_delta / delta_wall, 1),
        "emitted_full": emitted_full,
        "distinct_full": distinct_full,
        "full_exact": emitted_full == distinct_full,
        "emitted_total": emitted_total,
        "distinct_total": distinct_total,
        "delta_exact": emitted_total == distinct_total,
        "state_keys": distinct_total,
        "master": args.master,
    }))


if __name__ == "__main__":
    main()
