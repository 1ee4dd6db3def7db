"""Bucketed co-located joins + hypothesis property tests for the shared
rule set (SURVEY §5: the reference has no property tests; we add them)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ontology_learning_spark.functions import semantics as S

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12)
texts = st.text(
    alphabet=string.ascii_letters + string.digits + " .,!#*_[]()/:-\n\t",
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_preprocess_idempotent(t):
    once = S.preprocess_text(t)
    assert S.preprocess_text(once) == once


@settings(max_examples=200, deadline=None)
@given(texts)
def test_preprocess_output_invariants(t):
    out = S.preprocess_text(t)
    assert out == out.strip()
    assert "  " not in out
    assert out == out.lower()


@settings(max_examples=200, deadline=None)
@given(words)
def test_normalize_idempotent(w):
    once = S.normalize_name(w)
    assert S.normalize_name(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(words, min_size=1, max_size=3).map(" ".join))
def test_normalize_only_touches_head_token(phrase):
    out = S.normalize_name(phrase)
    assert out.split(" ")[:-1] == phrase.lower().split(" ")[:-1]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=2, max_size=64),
       st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=2, max_size=64))
def test_cosine_bounds(a, b):
    n = min(len(a), len(b))
    c = S.cosine(a[:n], b[:n])
    assert -1.0000001 <= c <= 1.0000001


@settings(max_examples=100, deadline=None)
@given(texts)
def test_embedding_unit_norm_or_zero(t):
    v = S.hashed_embedding(t)
    norm2 = sum(x * x for x in v)
    assert abs(norm2 - 1.0) < 1e-9 or norm2 == 0.0


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from ontology_learning_spark.sources.bucketing import (
        bucketed_join_is_shuffle_free,
        write_bucketed,
    )

    left = spark.range(1000).selectExpr("id as k", "id * 2 as v")
    right = spark.range(1000).selectExpr("id as k", "id * 3 as w")
    try:
        write_bucketed(left, "bt_left", "k", n_buckets=8, sort_col="k")
        write_bucketed(right, "bt_right", "k", n_buckets=8, sort_col="k")
        df, shuffle_free = bucketed_join_is_shuffle_free(spark, "bt_left", "bt_right", "k")
        assert shuffle_free, "bucketed equi-join must not exchange"
        assert df.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_incremental_components_equals_full_recompute(spark):
    """incremental_components(CC(base), delta) must be row-identical to
    CC(base ∪ delta) — merges across existing components, brand-new
    nodes, no-op intra-component edges, empty deltas, and the
    distributed contracted-graph fallback all included."""
    import random

    from ontology_learning_spark.operators import canonicalize as CC

    rng = random.Random(51)
    nodes = [f"n{i:03d}" for i in range(60)]
    all_edges = list({(a, b) for a, b in
                      ((rng.choice(nodes), rng.choice(nodes)) for _ in range(80))
                      if a != b})
    base, delta = all_edges[:50], all_edges[50:]
    # brand-new nodes, a chain tying them into an existing component,
    # and a duplicate no-op edge
    delta = delta + [("z_new1", "z_new2"), ("z_new2", nodes[0]), base[0]]

    bdf = spark.createDataFrame(base, "src string, dst string")
    ddf = spark.createDataFrame(delta, "src string, dst string")
    full = {tuple(r) for r in CC.connected_components(
        spark.createDataFrame(base + delta, "src string, dst string")).collect()}
    base_cc = CC.connected_components(bdf)
    inc = {tuple(r) for r in CC.incremental_components(base_cc, ddf).collect()}
    assert inc == full
    # empty delta is the identity
    empty = spark.createDataFrame([], "src string, dst string")
    assert {tuple(r) for r in CC.incremental_components(base_cc, empty).collect()} \
        == {tuple(r) for r in base_cc.collect()}
    # force the distributed contracted-CC path
    inc2 = {tuple(r) for r in CC.incremental_components(
        base_cc, ddf, small_threshold=0).collect()}
    assert inc2 == full


def test_bucketed_cc_equivalence_and_edge_side_no_exchange(spark):
    """connected_components_bucketed must (a) return the same
    components as the checkpoint-based loop and (b) actually deliver
    the claimed plan: the bucketed corpus-scale edge side of the
    per-round join carries NO exchange — only the node-sized labels
    side shuffles."""
    from pyspark.sql import functions as F

    from ontology_learning_spark.operators import canonicalize as CC

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"),
         ("hub", "p1"), ("hub", "p2"), ("hub", "p3")],
        "src string, dst string",
    )
    try:
        base = {tuple(r) for r in CC.connected_components(edges).collect()}
        buck = {tuple(r) for r in CC.connected_components_bucketed(
            edges, n_buckets=8, table="cc_bt_test").collect()}
        assert base == buck

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            e = spark.table("cc_bt_test")
            labels = (
                e.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node")))
                .distinct().withColumn("component", F.col("node"))
            ).localCheckpoint()
            j = e.join(labels.withColumnRenamed("node", "dst"), "dst")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert plan.count("Exchange hashpartitioning") == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cc_bt_test")
