#!/usr/bin/env python
"""Skew-at-scale A/B: the E7 salted two-phase window vs the naive
single window, on a corpus where ONE surface form is planted into
--hot-frac of documents with --hot-mult mentions each (north_rule:
head-entity skew is handled with salting). The multiplicity dial sizes
the hot window group (frac·docs·mult raw rows) so the sandbox corpus
reproduces the head-entity mass a 100x corpus would have organically —
at 320k docs and default dials the hot group is ~3.8M rows on one core
under the naive plan.

ROUND-5 FINDING (this job produced it): on Spark >=3.5 the "naive"
single window is NOT naive — Catalyst rewrites the dense_rank()<=n
filter into WindowGroupLimit with a Partial pass below the exchange,
pruning each map partition to its local top-n per concept BEFORE the
shuffle. Its stage wall stays flat (3.3 -> 2.6 s) while the planted
hot group grows 4.8M -> 16.5M rows, and it beats the round-3
hand-salted two-phase plan (which ships 32x more map-side survivors
and pays a second exchange) by 2-3 s end-to-end at 320k docs. The
single-window plan is
therefore the SHIPPED default (enrich.top_docs_per_concept); the
salted variant is kept for engines without WindowGroupLimit and as
the comparator here. Both plans provably return the same rows (the
job asserts set equality before timing).

    python jobs/bench_skew.py --corpus /tmp/ols_scale_corpus_320000.parquet

Prints ONE JSON line with both walls, the speedup, and the planted-skew
shape (hot surface, fraction of docs carrying it).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HOT_SURFACE = "resistor"   # in the extraction gazetteer (entity catalog)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/ols_scale_corpus_320000.parquet")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--hot-mult", type=int, default=40,
                    help="mentions of the hot surface per planted doc — "
                         "sizes the hot window group (frac*docs*mult rows) "
                         "to model head-entity mass at larger corpora")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ontology_learning_spark.fixtures import baseline
    from ontology_learning_spark.functions.persistence import materialize
    from ontology_learning_spark.operators import enrich as EN
    from ontology_learning_spark.operators import extraction as E
    from ontology_learning_spark.session import build_session

    spark = build_session(app_name="bench-skew", master=args.master)
    cores = spark.sparkContext.defaultParallelism
    surfaces = tuple(sorted({r["name"].lower() for r in baseline.entity_catalog()}))

    docs = spark.read.parquet(args.corpus)
    n_docs = docs.count()
    # Plant the hot surface: append one extra text span to every
    # (1/hot_frac)-th doc, so HOT_SURFACE appears in hot_frac of the
    # corpus on top of its organic frequency. Span schema mirrors the
    # documents table (kind/offset/text/media_ref).
    mod = int(round(1 / args.hot_frac))
    spans_fields = [f.name for f in docs.schema["spans"].dataType.elementType.fields]
    hot_span = F.struct(*[
        (F.lit("text") if n == "kind"
         else F.lit(10_000_000) if n == "offset"
         else F.lit(" ".join([HOT_SURFACE] * args.hot_mult)) if n == "text"
         else F.lit(None).cast(docs.schema["spans"].dataType.elementType[n].dataType))
        .alias(n)
        for n in spans_fields
    ])
    skewed = docs.withColumn(
        "spans",
        F.when(F.xxhash64(F.col("doc_id").cast("string")) % mod == 0,
               F.concat(F.col("spans"), F.array(hot_span)))
        .otherwise(F.col("spans")),
    ).repartition(max(cores, n_docs // 1250)).cache()
    skewed.count()

    mentions, _, _ = E.extract_pipeline(skewed, surfaces)
    mentions = materialize(mentions.select("doc_id", "norm_surface"))
    hot_rows = mentions.where(F.col("norm_surface") == HOT_SURFACE).count()
    hot_docs = mentions.where(F.col("norm_surface") == HOT_SURFACE) \
        .select("doc_id").distinct().count()

    builder = lambda df: E.preprocess(E.concat_text_spans(df))

    def salted_context(m, d):
        """E7 end-to-end with the legacy hand-salted two-phase top,
        then the same text join as the shipped path."""
        top = materialize(EN.top_docs_per_concept(m, salted=True))
        text = builder(
            d.join(F.broadcast(top.select("doc_id").distinct()), "doc_id", "left_semi")
        ).select("doc_id", "clean_text")
        hit = text.join(F.broadcast(top), "doc_id")
        ctx = hit.groupBy("norm_surface").agg(
            F.concat_ws(" ", F.array_sort(
                F.collect_list(F.struct("rn", "clean_text")))["clean_text"]).alias("_c")
        )
        return ctx.select(
            F.col("norm_surface").alias("concept"),
            F.substring("_c", 1, EN.CONTEXT_CAP).alias("context"),
        )

    # correctness first: identical output row sets
    shipped_out = EN.concept_context(mentions, skewed, text_builder=builder)
    salted_out = salted_context(mentions, skewed)
    diff = shipped_out.exceptAll(salted_out).count() + salted_out.exceptAll(shipped_out).count()

    def timed(fn, reps=2):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn().count()
            walls.append(time.time() - t0)
        return min(walls)

    wall_shipped = timed(lambda: EN.concept_context(mentions, skewed, text_builder=builder))
    wall_salted = timed(lambda: salted_context(mentions, skewed))

    # Stage-only walls isolate the window plan from the (identical)
    # text-join tail; grow --hot-mult to watch the single-window stage
    # stay flat (WindowGroupLimit map-side prune) while the hot group
    # multiplies.
    stage_single = timed(lambda: EN.top_docs_per_concept(mentions, salted=False))
    stage_salted = timed(lambda: EN.top_docs_per_concept(mentions, salted=True))

    print(json.dumps({
        "metric": "skew_salted_vs_naive",
        "docs": n_docs,
        "hot_surface": HOT_SURFACE,
        "hot_doc_frac": round(hot_docs / n_docs, 3),
        "hot_group_rows": hot_rows,
        "outputs_identical": diff == 0,
        "wall_shipped_sec": round(wall_shipped, 2),
        "wall_salted_sec": round(wall_salted, 2),
        "stage_single_window_sec": round(stage_single, 2),
        "stage_salted_sec": round(stage_salted, 2),
        "hot_mult": args.hot_mult,
        "master": args.master,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
