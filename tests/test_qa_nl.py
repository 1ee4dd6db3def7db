"""The deterministic NL→SQL QA chain (operators/qa_nl.py).

Covers the reference transcript forms (src/evaluation/sample_qa.txt:
manufacturer-of, property-of) end to end on Spark — NL in, NL answer
out — plus routing precision, injection escaping, and the refusal
contract (no template → UnroutableQuestion, never a guessed query).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from ontology_learning_spark.operators import qa_nl as N


@pytest.fixture(scope="module")
def qa_graph(spark):
    entry_mod._qa_nodes_df(spark).createOrReplaceTempView("ont_nodes")
    entry_mod._qa_edges_df(spark).createOrReplaceTempView("ont_edges")
    entry_mod._qa_props_df(spark).createOrReplaceTempView("ont_props")
    return spark


def test_battery_routes_to_sixteen_distinct_intents():
    intents = [N.compile_question(q)[0] for q in N.BATTERY]
    assert len(intents) == len(set(intents)) == 16


@pytest.mark.parametrize(
    "question, intent",
    [
        ("Who is the manufacturer of the BPW34?", "manufacturer_of"),
        ("What is the impedance of the 2.45 GHz Antenna?", "property_of"),
        ("what is the direct parent of ChipAntenna", "direct_parent"),
        ("Is smd resistor a type of PassiveComponent?", "is_a"),
        ("List all descendants of Antenna?", "descendants_of"),
        ("Show the 3 most connected concepts.", "top_degree"),
        ("Which concepts have no children?", "leaves"),
        ("What relationships does Capacitor have?", "related_to"),
    ],
)
def test_paraphrase_routing(question, intent):
    assert N.parse_question(question)[0].name == intent


def test_transcript_manufacturer_answer(qa_graph):
    out = N.answer_question(qa_graph, "Who is the manufacturer of the smd resistor?")
    assert out["intent"] == "manufacturer_of"
    assert out["answer"] == "The manufacturer of the smd resistor is acme components."


def test_transcript_property_answer(qa_graph):
    out = N.answer_question(qa_graph, "What is the impedance of the wifi antenna?")
    assert out["intent"] == "property_of"
    # bare "impedance" finds the namespaced elec:impedance prop
    assert out["answer"] == "The impedance of the wifi antenna is 50 Ohm."


def test_is_a_yes_and_no(qa_graph):
    yes = N.answer_question(qa_graph, "Is ChipAntenna a kind of RFComponent?")
    assert yes["answer"].startswith("Yes, ChipAntenna is a kind of")
    no = N.answer_question(qa_graph, "Is Resistor a kind of Antenna?")
    assert no["answer"].startswith("No, Resistor is not a kind of")


def test_hops_answer(qa_graph):
    out = N.answer_question(qa_graph, "How many hops connect ChipAntenna and Antenna?")
    assert out["answer"] == "ChipAntenna and Antenna are connected in 1 hops."


def test_unroutable_refuses_instead_of_guessing():
    with pytest.raises(N.UnroutableQuestion):
        N.parse_question("please summarize the ontology for me")


def test_entity_quote_escaped():
    _, sql = N.compile_question("Who is the manufacturer of the o'brien part?")
    assert "o''brien" in sql and "o'brien" not in sql.replace("o''brien", "")


def test_control_chars_rejected():
    with pytest.raises(N.UnroutableQuestion):
        N.compile_question("Who is the manufacturer of the x\x00y?")


def test_eval_battery_statuses(qa_graph):
    rows = {r["question"]: r for r in N.qa_nl_eval(qa_graph).collect()}
    assert len(rows) == 16
    assert all(r["status"] in ("successful", "empty_result") for r in rows.values())
    # the transcript forms must be resultful on the fixture graph
    assert rows["Who is the manufacturer of the smd resistor?"]["status"] == "successful"
    assert rows["What is the impedance of the wifi antenna?"]["status"] == "successful"
