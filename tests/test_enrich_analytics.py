"""Tests for enrichment (E7-E11) and evaluation analytics (A6/A11/A14/A15/A19)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.operators import analytics as A
from ontology_learning_spark.operators import enrich as EN


@pytest.fixture(scope="module")
def mentions_docs(spark):
    mentions = spark.createDataFrame(
        [("d1", "antenna"), ("d2", "antenna"), ("d3", "antenna"), ("d4", "antenna"),
         ("d2", "resistor"), ("d3", "widget")],
        "doc_id string, norm_surface string",
    )
    docs_text = spark.createDataFrame(
        [("d1", "the antenna covers 2.4-5.8 ghz with 50 ohms impedance and sma connector"),
         ("d2", "a resistor rated 50 v surface mount; the antenna again"),
         ("d3", "antenna three"), ("d4", "antenna four " + "x" * 3000)],
        "doc_id string, clean_text string",
    )
    return mentions, docs_text


def test_concept_context_caps_and_orders(mentions_docs):
    mentions, docs_text = mentions_docs
    ctx = {r["concept"]: r["context"] for r in EN.concept_context(mentions, docs_text).collect()}
    # first 3 docs only, in doc order
    assert ctx["antenna"].startswith("the antenna covers")
    assert "three" in ctx["antenna"]
    assert "four" not in ctx["antenna"]          # 4th doc excluded
    assert len(ctx["antenna"]) <= EN.CONTEXT_CAP


def test_extract_properties(mentions_docs, spark):
    mentions, docs_text = mentions_docs
    ctx = EN.concept_context(mentions, docs_text)
    props = {r["concept"]: r for r in EN.extract_properties(ctx).collect()}
    assert props["antenna"]["frequency"] == "2.4-5.8 ghz"
    assert props["antenna"]["impedance"] == "50 ohms"
    assert props["antenna"]["connector"] == "sma"
    assert props["resistor"]["voltage"] == "50 v"
    assert props["resistor"]["mounting"] == "surface mount"
    assert props["widget"]["frequency"] is None


def test_schema_objects(mentions_docs, spark):
    mentions, docs_text = mentions_docs
    props = EN.extract_properties(EN.concept_context(mentions, docs_text))
    decided = spark.createDataFrame(
        [("antenna", "RF Components", "UNCERTAIN", 0.5),
         ("widget", "General Electronics", "EXTEND", 0.9),
         ("resistor", "Passive Components", "MAP_EXACT", 1.0)],
        "concept string, category string, decision string, confidence double",
    )
    objs = {r["concept"]: r for r in EN.schema_objects(decided, props).collect()}
    assert set(objs) == {"antenna", "widget"}   # MAP_* excluded
    so = objs["antenna"]["schema_object"]
    assert so["@type"] == "Product"
    assert so["additionalType"].endswith("/antenna")
    assert so["elec_properties"]["elec:impedance"] == "50 ohms"
    # widget's context ('antenna three') has no unit patterns → empty map
    assert not objs["widget"]["schema_object"]["elec_properties"]
    assert '"@type":"Product"' in objs["widget"]["json_ld"]


def test_similarity_distribution(spark):
    matches = spark.createDataFrame(
        [("a", "X", 0.9), ("a", "Y", 0.7), ("b", "X", 0.5), ("c", "Z", 1.0)],
        "concept string, candidate string, score double",
    )
    row = A.similarity_distribution(matches).collect()[0]
    assert row["n_concepts"] == 3
    assert row["mean"] == round((0.9 + 0.5 + 1.0) / 3, 6)
    assert row["median"] == 0.9


def test_conceptual_saturation(spark):
    rows = [(f"d{i:03d}", f"c{i % 7}") for i in range(30)]  # 7 concepts, all seen early
    mentions = spark.createDataFrame(rows, "doc_id string, norm_surface string")
    sat = A.conceptual_saturation(mentions, batch_size=10).collect()
    assert sat[0]["batch"] == 0
    assert sat[0]["new_concepts"] == 7           # all 7 appear in first 10 docs
    assert sat[0]["cumulative_concepts"] == 7
    assert len(sat) == 1                          # nothing new later


def test_confidence_ranking_and_review_queue(spark):
    decisions = spark.createDataFrame(
        [("a", "EXTEND", None, 0.9), ("b", "UNCERTAIN", "X", 0.5),
         ("c", "MAP_EXACT", "Y", 1.0), ("d", "UNCERTAIN", "Z", None)],
        "concept string, decision string, target string, confidence double",
    )
    top = A.confidence_ranking(decisions, 2).collect()
    assert [r["concept"] for r in top] == ["c", "a"]
    rq = A.review_queue(decisions).collect()
    assert {r["concept"] for r in rq} == {"b", "d"}
    byname = {r["concept"]: r for r in rq}
    assert byname["d"]["confidence"] == 0.75     # null → default
    assert byname["b"]["suggested_parent"] == "X"


def test_gold_standard_eval(spark):
    got = spark.createDataFrame(
        [("a", "subclass_of", "b"), ("x", "subclass_of", "y")], "subj string, pred string, obj string"
    )
    gold = spark.createDataFrame(
        [("a", "subclass_of", "b"), ("p", "subclass_of", "q")], "subj string, pred string, obj string"
    )
    row = A.gold_standard_eval(got, gold).collect()[0]
    assert row["tp"] == 1 and row["fp"] == 1 and row["fn"] == 1
    assert row["precision"] == 0.5 and row["recall"] == 0.5 and row["f1"] == 0.5


def test_concept_coverage(spark):
    got = spark.createDataFrame([("a",), ("b",), ("c",)], "name string")
    gold = spark.createDataFrame([("a",), ("b",), ("d",)], "name string")
    row = A.concept_coverage(got, gold).collect()[0]
    assert row["tp"] == 2 and row["fp"] == 1 and row["fn"] == 1
    assert row["coverage"] == round(2 / 3, 6)
