"""Evaluation / curation analytics (SURVEY.md A1-A21).

Each is a small DataFrame plan; the expensive inputs (matches,
decisions, mentions) are produced once by the pipeline and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def similarity_distribution(matches: DataFrame) -> DataFrame:
    """A14: top match score per concept → distribution stats.

    Reproducibility shape (ref src/evaluation/diagnose_similarity.py:
    63-116, behavior only): scores are rounded to 6 decimals BEFORE the
    per-concept max (near-ulp ties collapse identically on any engine),
    and mean/stddev come from DECIMAL-exact sums — double-sum
    aggregation is partition-order dependent, so the same corpus could
    report different trailing digits run to run at cluster scale. The
    sum/sum-of-squares decimals convert to double identically
    everywhere, and the remaining arithmetic is a fixed scalar formula,
    so the output is bit-stable across partitionings and matches the
    DuckDB oracle twin exactly. Percentiles use exact type-7 linear
    interpolation (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    top = matches.groupBy("concept").agg(
        F.max(F.round(F.col("score"), 6)).alias("top_score")
    )
    agg = top.agg(
        F.count("*").alias("n_concepts"),
        F.sum(F.col("top_score").cast("decimal(28,6)")).alias("s_dec"),
        F.sum(
            F.round(F.col("top_score") * F.col("top_score"), 12).cast("decimal(26,12)")
        ).alias("sq_dec"),
        F.expr("percentile(top_score, 0.5)").alias("median_raw"),
        F.expr("percentile(top_score, 0.25)").alias("p25_raw"),
        F.expr("percentile(top_score, 0.75)").alias("p75_raw"),
    )
    n = F.col("n_concepts")
    s = F.col("s_dec").cast("double")
    sq = F.col("sq_dec").cast("double")
    return agg.select(
        n,
        F.round(s / n, 6).alias("mean"),
        F.round("median_raw", 6).alias("median"),
        F.when(
            n > 1, F.round(F.sqrt((sq - s * s / n) / (n - 1)), 6)
        ).alias("stddev"),
        F.round("p25_raw", 6).alias("p25"),
        F.round("p75_raw", 6).alias("p75"),
    )


def conceptual_saturation(mentions: DataFrame, batch_size: int = 10) -> DataFrame:
    """A15: per batch of documents — new vs seen distinct concepts,
    cumulative total, rolling mean of new-concept count (window=10).

    Deterministic batch id: rank of doc_id // batch_size (the reference
    shuffles randomly; we key on doc order for reproducibility).

    Scale shape: the docs DIMENSION (distinct doc ids) is ranked with
    the two-phase ``global_rank`` (range partition + local rank +
    offsets) and the batch id joined back onto the mention pairs — no
    unpartitioned window ever sees corpus-sized data. The per-batch
    tail (cumulative + rolling) runs on batch-count-sized rows via
    ``global_cumsum``; the rolling mean over the trailing 10 PRESENT
    batch rows is derived from the cumulative sums by an equi self-join
    on rank-10 (rows-frame semantics, window-free).
    """
    from ..functions.windows import global_cumsum, global_rank

    pairs = mentions.select("doc_id", "norm_surface").distinct()
    docs = global_rank(pairs.select("doc_id").distinct(), "doc_id", "doc_rank")
    batches = docs.withColumn(
        "batch", ((F.col("doc_rank") - 1) / batch_size).cast("int")
    ).drop("doc_rank")
    with_batch = pairs.join(batches, "doc_id")
    first_seen = with_batch.groupBy("norm_surface").agg(F.min("batch").alias("first_batch"))
    per_batch = first_seen.groupBy("first_batch").agg(F.count("*").alias("new_concepts"))

    cum = global_cumsum(per_batch, "first_batch", "new_concepts", "cumulative_concepts")
    ranked = global_rank(cum, "first_batch", "row_rank")
    # rolling sum over the last 10 present rows = cum(r) - cum(r-10)
    prev = ranked.select(
        (F.col("row_rank") + 10).alias("row_rank"),
        F.col("cumulative_concepts").alias("cum_prev"),
    )
    rolled = ranked.join(prev, "row_rank", "left").select(
        F.col("first_batch").alias("batch"),
        "new_concepts",
        "cumulative_concepts",
        F.round(
            (F.col("cumulative_concepts") - F.coalesce("cum_prev", F.lit(0)))
            / F.least(F.col("row_rank"), F.lit(10)),
            4,
        ).alias("rolling_mean_new"),
    )
    return rolled.orderBy("batch")


def confidence_ranking(decisions: DataFrame, k: int) -> DataFrame:
    """A6: top-k decisions by confidence (desc, concept asc tiebreak).
    TakeOrderedAndProject + posexplode rank — no global window (the
    old row_number()<=k moved ALL decisions to one partition)."""
    from ..functions.windows import ranked_topk

    return ranked_topk(
        decisions.select("concept", "decision", "confidence"), "confidence", "concept", k
    ).select("rank", "concept", "decision", "confidence")


def gold_standard_eval(got_triples: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """A11: P/R/F1 over (subj, pred, obj) sets via joins.
    TP = inner join; FP/FN = anti joins each way."""
    keys = ["subj", "pred", "obj"]
    got = got_triples.select(keys).distinct()
    gold = gold_triples.select(keys).distinct()
    tp = got.join(gold, keys).count()
    fp = got.join(gold, keys, "left_anti").count()
    fn = gold.join(got, keys, "left_anti").count()
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return got.sparkSession.createDataFrame(
        [(tp, fp, fn, round(p, 6), round(r, 6), round(f1, 6))],
        "tp bigint, fp bigint, fn bigint, precision double, recall double, f1 double",
    )


def concept_coverage(got_concepts: DataFrame, gold_concepts: DataFrame) -> DataFrame:
    """A12: coverage/recall + signal-to-noise of concept sets."""
    got = got_concepts.select("name").distinct()
    gold = gold_concepts.select("name").distinct()
    tp = got.join(gold, "name").count()
    fp = got.count() - tp
    fn = gold.count() - tp
    coverage = tp / (tp + fn) if tp + fn else 0.0
    snr = tp / fp if fp else float(tp)
    return got.sparkSession.createDataFrame(
        [(tp, fp, fn, round(coverage, 6), round(snr, 6))],
        "tp bigint, fp bigint, fn bigint, coverage double, signal_to_noise double",
    )


def compare_threshold_configs(
    spark,
    docs: DataFrame,
    gold_triples: DataFrame,
    configs: dict[str, dict],
) -> DataFrame:
    """A13: run the pipeline once per threshold config and score each
    against the gold set — the deterministic analogue of the
    reference's per-model extraction comparison."""
    from ..plans.pipeline import run_pipeline

    rows = []
    for name, th in configs.items():
        res = run_pipeline(spark, docs, thresholds=th)
        pr = gold_standard_eval(res.triples, gold_triples).collect()[0]
        stats = res.decisions.agg(
            F.count("*").alias("n"),
            F.avg("confidence").alias("avg_conf"),
        ).collect()[0]
        rows.append((name, pr["tp"], pr["fp"], pr["fn"],
                     pr["precision"], pr["recall"], pr["f1"],
                     stats["n"], round(stats["avg_conf"], 6)))
    return spark.createDataFrame(
        rows,
        "config string, tp bigint, fp bigint, fn bigint, precision double, "
        "recall double, f1 double, n_concepts bigint, avg_confidence double",
    )


def review_queue(decisions: DataFrame, limit: int = 200) -> DataFrame:
    """A19: pending-review list — UNCERTAIN decisions with default
    confidence 0.75 when null, deterministic order, LIMIT."""
    return (
        decisions.where(F.col("decision") == "UNCERTAIN")
        .select(
            "concept",
            F.col("target").alias("suggested_parent"),
            F.coalesce("confidence", F.lit(0.75)).alias("confidence"),
        )
        .orderBy(F.col("confidence").desc(), F.col("concept").asc())
        .limit(limit)
    )


def stats_endpoint(nodes: DataFrame, edges: DataFrame, decisions: DataFrame) -> DataFrame:
    """A3: the /api/stats counters as one row."""
    learned = nodes.where(F.col("source") == "learned_from_dataset").count()
    needs_review = nodes.where(F.col("needs_review")).count()
    total_rels = edges.count()
    dec_agg = decisions.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("decision") != "UNCERTAIN", 1).otherwise(0)).alias("automated"),
    ).collect()[0]
    rate = dec_agg["automated"] / dec_agg["total"] if dec_agg["total"] else 0.0
    return nodes.sparkSession.createDataFrame(
        [(learned, total_rels, needs_review, round(rate, 6))],
        "learned_concepts bigint, total_relationships bigint, needs_review bigint, automation_rate double",
    )


def graph_viz_sample(nodes: DataFrame, edges: DataFrame,
                     n_nodes: int = 50, n_edges: int = 100) -> tuple[DataFrame, DataFrame]:
    """A20: bounded sample for visualization (deterministic order)."""
    vn = nodes.orderBy("name").limit(n_nodes)
    ve = edges.orderBy("src", "rel_type", "dst").limit(n_edges)
    return vn, ve
