"""Round-2 surfaces: QA query corpus views + A18 evaluator, Schema.org
JSON-LD validation, snapshot create/list/restore."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.fixtures import baseline
from ontology_learning_spark.operators import qa_views as Q
from ontology_learning_spark.operators import snapshots as SN
from ontology_learning_spark.operators import validation as V
from ontology_learning_spark.sources.tables import baseline_graph


@pytest.fixture(scope="module")
def graph(spark):
    nodes, edges = baseline_graph(spark, baseline.ONTOLOGY_HIERARCHY)
    learned = spark.createDataFrame(
        [("wifi antenna", None, "learned_from_dataset", None, "review", True),
         ("cable assembly", None, "learned_from_dataset", None, None, False)],
        nodes.schema,
    )
    extra_edges = spark.createDataFrame(
        [("wifi antenna", "SUBCLASS_OF", "Antenna", "learned_from_dataset", "t"),
         ("cable assembly", "SUBCLASS_OF", "Cable", "learned_from_dataset", "t"),
         ("cable assembly", "CONNECTEDTO", "Connector", "learned_from_dataset", "t"),
         ("Transistor", "RELATEDTO", "Antenna", "learned_from_dataset", "t")],
        edges.schema,
    )
    return nodes.unionByName(learned).cache(), edges.unionByName(extra_edges).cache()


def test_qa_corpus_runs_clean(spark, graph):
    """All 29 reference QA queries execute without error; the evaluator
    emits the reference's success/resultful-rate shape."""
    nodes, edges = graph
    names = Q.create_qa_views(spark, nodes, edges)
    assert len(names) == 29
    per = Q.evaluate_query_corpus(spark, names)
    rows = {r["query"]: r for r in per.collect()}
    assert len(rows) == 29
    assert all(r["status"] != "error" for r in rows.values())
    # spot-check semantics against the known graph
    assert rows["qa_q01_point_lookup"]["n_rows"] == 1          # FPCAntenna exists
    assert rows["qa_q18_direct_parent"]["n_rows"] == 1         # ChipAntenna -> Antenna
    assert rows["qa_q15_outgoing_nontax"]["n_rows"] == 1       # cable assembly CONNECTEDTO
    summary = Q.corpus_summary(per).collect()[0]
    assert summary["total_queries"] == 29
    assert summary["errors"] == 0
    assert summary["success_rate"] == 100.0
    assert 0 < summary["resultful_rate"] <= 100.0


def test_qa_transitive_views(spark, graph):
    nodes, edges = graph
    Q.create_qa_views(spark, nodes, edges)
    desc = {r["name"] for r in spark.table("qa_q04_descendants").collect()}
    assert desc == {"FPCAntenna", "ChipAntenna", "wifi antenna"}
    path = spark.table("qa_q13_taxonomic_path").collect()
    assert ["FPCAntenna", "Antenna", "RFComponent", "ElectronicComponent",
            "Product", "Thing"] in [list(r["hierarchy"]) for r in path]
    sp = spark.table("qa_q16_shortest_path").collect()[0]
    # Resistor→PassiveComponent→ElectronicComponent→RFComponent→Antenna
    assert sp["hops"] == 4


def test_validator_reference_shapes(spark):
    rows = [
        ('{"@context":{"@vocab":"https://schema.org/","elec":"https://example.org/electrical/"},'
         '"@type":"Product","name":"antenna","category":"RF","description":"d",'
         '"manufacturer":"m","additionalType":"http://www.productontology.org/id/antenna",'
         '"elec:impedance":"50 ohm"}',),
        ('{"@context":"https://notschema.org/","@type":"Product","name":"",'
         '"additionalType":"not a uri","foo:bar":"x","empty":""}',),
        ('{"@context":"https://schema.org/","@type":"Organization","name":"acme"}',),
    ]
    v = V.validate_jsonld(spark.createDataFrame(rows, "json_ld string"))
    got = {r["object_id"]: r for r in v.collect()}
    assert got["antenna"]["is_valid"] and got["antenna"]["n_warnings"] == 0
    bad = got[""]
    assert not bad["is_valid"]
    assert bad["missing_required"] == ["name"]
    assert set(bad["empty_props"]) == {"name", "empty"}
    assert bad["undefined_namespaces"] == ["foo:bar"]
    assert bad["n_warnings"] == 4
    assert got["acme"]["is_valid"] and got["acme"]["n_recommendations"] == 1
    rep = V.validation_report(v).collect()[0]
    assert rep["total_objects"] == 3 and rep["valid_objects"] == 2
    audit = V.product_ontology_uri_audit(
        spark.createDataFrame(rows, "json_ld string")
    ).collect()[0]
    assert audit["total_uris"] == 1 and audit["well_formed_uris"] == 1


def test_own_exports_validate_clean(spark):
    """schema_objects output (reference JSON-LD shape incl. @context +
    elec namespace) must pass our own validator with zero errors."""
    from ontology_learning_spark.operators import enrich as EN

    decided = spark.createDataFrame(
        [("wifi antenna", "antennas", "EXTEND", 0.9),
         ("copper trace", None, "UNCERTAIN", 0.5)],
        "concept string, category string, decision string, confidence double",
    )
    props = spark.createDataFrame(
        [("wifi antenna", "2.4 GHz", "50 Ohm", None, None, None)],
        "concept string, frequency string, impedance string, voltage string, "
        "connector string, mounting string",
    )
    objs = EN.schema_objects(decided, props)
    v = V.validate_jsonld(objs)
    rows = {r["object_id"]: r for r in v.collect()}
    assert all(r["is_valid"] for r in rows.values())
    assert all(r["n_warnings"] == 0 for r in rows.values()), rows
    # namespaced props only when elec values exist
    import json

    parsed = {r["concept"]: json.loads(r["json_ld"]) for r in objs.collect()}
    assert parsed["wifi antenna"]["elec:frequency"] == "2.4 GHz"
    assert isinstance(parsed["wifi antenna"]["@context"], dict)
    assert parsed["copper trace"]["@context"] == "https://schema.org/"
    assert "elec:frequency" not in parsed["copper trace"]


def test_snapshot_roundtrip(spark, graph, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snaps"))
    nodes, edges = graph
    res = SN.create_snapshot(spark, root, "run1", nodes, edges)
    assert res["success"]
    listing = SN.list_snapshots(root)
    assert listing[0]["name"] == SN.BASELINE_NAME and listing[0]["is_baseline"]
    assert any(s["name"] == "run1" for s in listing)

    # restore must reproduce the exact tables (simulates a fresh session
    # reading only what was committed to disk)
    rn, re_ = SN.restore_snapshot(spark, root, "run1")
    assert sorted(map(tuple, rn.collect())) == sorted(map(tuple, nodes.collect()))
    assert sorted(map(tuple, re_.collect())) == sorted(map(tuple, edges.collect()))

    # baseline restore = fixtures baseline graph
    bn, be = SN.restore_snapshot(spark, root, SN.BASELINE_NAME)
    assert bn.count() > 0 and be.count() > 0

    with pytest.raises(FileNotFoundError):
        SN.restore_snapshot(spark, root, "nope")
