"""Round-4 scale-parameterization proofs (VERDICT r3 "What's wrong #2").

The LSH bucket granularity used to be sandbox-tuned constants (6-bit
embedding bands, 16-bit simhash chunks) whose candidate volume is
quadratic on an unstructured corpus at large n. These tests pin the
fixed defaults' replacement: auto-sized band/block keys tracking
log2(n)+2 bits, with candidate-pair counts measured on a 50k-row
unstructured (worst-case: no planted structure) corpus and asserted
~O(n·bands), NOT O(n²).

Candidate counts are computed as Σ_buckets C(cnt, 2) from the bucket
histograms — the same quantity the candidate self-join would emit,
without materializing the join (so a regression to O(n²) fails the
assertion instead of hanging the suite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.operators.dedup import (
    pick_simhash_blocks,
    simhash_blocking_keys,
    simhash_near_dups,
)
from ontology_learning_spark.operators.simsearch import (
    lsh_band_signatures,
    lsh_plan,
)

N = 50_000


def _bucket_pair_count(df, *key_cols) -> int:
    row = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .first()
    )
    return int(row["pairs"] or 0)


def test_lsh_plan_sizing_rule():
    # band key width tracks log2(n)+2; band count solves the recall target
    b, r = lsh_plan(500, 0.9)
    assert r == 11  # ceil(log2(500)) + 2
    assert 20 <= b <= 40
    b2, r2 = lsh_plan(1_000_000, 0.9)
    assert r2 >= 18  # capped below log2(n)+2 only by the max_bands walk-back
    assert b2 <= 128
    # recall at the threshold itself stays >= 0.99 whenever the cap doesn't bind
    import math

    p = 1 - math.acos(0.9) / math.pi
    assert 1 - (1 - p**r) ** b >= 0.99


def test_embedding_band_candidates_linear_at_50k(spark):
    rng = np.random.RandomState(7)
    dim = 64
    vecs = rng.randn(N, dim).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(N), "embedding": list(vecs)})
    df = spark.createDataFrame(pdf)

    bands, rows = lsh_plan(N, 0.9)
    assert rows >= 16  # >= log2(50k); the old fixed default was 6
    sig = lsh_band_signatures(df, dim, bands, rows, seed=42)
    pairs = _bucket_pair_count(sig, "band", "sig")
    # unstructured corpus: E[collisions/band-pair] integrates p_bit^rows
    # over the random-cosine density (∝(1-c²)^((d-3)/2)) — ≈9.3e-6 at
    # d=64/r=18 → ≈17.7n expected at 76 bands (the uniform-key 2^-18
    # ideal is ~7n; low-dim cosine spread inflates it). Assert well
    # under any quadratic regime: all-pairs is 1.25e9, 1% of that
    # already fails, and the bound is linear in n·bands.
    assert pairs < 25 * N
    assert pairs < bands * N


def test_simhash_blocks_autosize_and_candidates_linear_at_50k(spark):
    # back-compat: sandbox-size corpora keep the 4-block layout
    assert pick_simhash_blocks(500) == 4
    assert pick_simhash_blocks(100_000) == 5
    assert pick_simhash_blocks(1 << 24) >= 6

    m = pick_simhash_blocks(N)
    assert m == 5  # 25-bit table keys at 50k docs (old fixed layout: 16)
    rng = np.random.RandomState(11)
    sigs = rng.randint(-(1 << 63), (1 << 63) - 1, size=N, dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"sig": sigs}))
    tabled = df.select(
        F.explode(simhash_blocking_keys(F.col("sig"), m, 3)).alias("tk")
    ).select(F.col("tk.tbl").alias("tbl"), F.col("tk.key").alias("key"))
    pairs = _bucket_pair_count(tabled, "tbl", "key")
    # expected ≈ C(m,2)-tables · C(n,2)/2^25 ≈ 370 pairs; the old 16-bit
    # chunk keys would give ≈ 4·C(n,2)/2^16 ≈ 76k ≈ 1.5n — and grow as n²
    assert pairs < N // 10


def test_minhash_plan_scurve_properties():
    """The threshold-driven plan must (a) place the banding S-curve
    midpoint within `margin` below the verify threshold — the property
    whose absence made the fixed 8x4 default emit 26M candidates for
    93 real pairs on an 80k template corpus — and (b) hit the recall
    target at the threshold with the exact 1-(1-t^r)^b formula."""
    import math

    from ontology_learning_spark.operators.dedup import minhash_plan

    for t in (0.8, 0.85, 0.9, 0.95):
        h, b = minhash_plan(t)
        r = h // b
        assert h == b * r and h <= 256
        midpoint = (1 / b) ** (1 / r)
        # 0.131 when the hash budget allows; at t=0.8 the 256-hash cap
        # binds one r short of the margin (r=9 would need 297 hashes)
        assert midpoint >= t - 0.14, (t, b, r, midpoint)
        recall = 1 - (1 - t**r) ** b
        assert recall >= 0.99, (t, b, r, recall)
    # default threshold lands under codegen's 100-field default budget
    h, b = minhash_plan(0.9)
    assert h == 90 and b == 10
    # low thresholds fall back to the capped budget instead of exploding
    h, b = minhash_plan(0.5)
    assert h <= 256


def test_simhash_output_invariant_to_block_count(spark, docs_df):
    """Exact pigeonhole: the block count is a partition trick, so m=4
    and m=6 must emit the identical pair set (keys differ, output not)."""
    texts = docs_df.select(
        "doc_id",
        F.concat_ws(" ", F.expr("transform(spans, s -> s.text)")).alias("text"),
    )
    base = sorted(
        tuple(r) for r in simhash_near_dups(texts, blocks=4).collect()
    )
    alt = sorted(
        tuple(r) for r in simhash_near_dups(texts, blocks=6).collect()
    )
    assert base == alt
