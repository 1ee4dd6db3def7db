"""Round-6 optimization pin: ``extract(..., relations=False)``.

The mention-only consumers (kg_mention_counts, kg_doc_mentions,
kg_saturation, the streaming saturation sink) skip the E4 relation
regex pass — ~2/3 of the per-doc Python extraction cost — because they
never read the triples column and Spark cannot prune work inside an
opaque mapInPandas. This test pins the contract: the mentions output is
bit-identical with and without the flag, and the skipped path emits
empty (not null) triples arrays under the unchanged schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.fixtures import baseline
from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA, generate_documents
from ontology_learning_spark.operators import extraction as E


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_documents(n_docs=300, seed=11)
    return spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA).repartition(4)


def _surfaces() -> tuple[str, ...]:
    return tuple(sorted({r["name"].lower() for r in baseline.entity_catalog()}))


def test_mentions_identical_with_and_without_relations(spark, corpus):
    prepped = E.preprocess(E.concat_text_spans(corpus)).select("doc_id", "clean_text")
    full = E.extract(prepped, _surfaces(), relations=True)
    lean = E.extract(prepped, _surfaces(), relations=False)

    cols = ["doc_id", "surface", "norm_surface", "char_offset"]
    a = sorted(
        E.mentions_table(full).select(*cols).collect(),
        key=lambda r: (r.doc_id, r.char_offset, r.surface),
    )
    b = sorted(
        E.mentions_table(lean).select(*cols).collect(),
        key=lambda r: (r.doc_id, r.char_offset, r.surface),
    )
    assert a == b
    assert len(a) > 0


def test_relations_false_emits_empty_arrays_same_schema(spark, corpus):
    prepped = E.preprocess(E.concat_text_spans(corpus)).select("doc_id", "clean_text")
    full = E.extract(prepped, _surfaces(), relations=True)
    lean = E.extract(prepped, _surfaces(), relations=False)
    assert lean.schema == full.schema
    stats = lean.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("triples").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.size("triples")).alias("n_triples"),
    ).first()
    assert stats.n > 0 and stats.n_null == 0 and stats.n_triples == 0
    # the full path does find relations on this corpus — the flag is
    # actually skipping work, not matching a vacuous baseline
    assert full.select(F.sum(F.size("triples"))).first()[0] > 0
