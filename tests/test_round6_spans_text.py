"""Round-6 pin: ``spans_doc_text`` ≡ ``concat_text_spans(to_spans(df))``.

The mention-only query paths skip building span arrays they never read;
this test keeps the fused projection row-identical to the span
round-trip on adversarial whitespace/null/unicode inputs and on the
driver corpus.
"""

from pyspark.sql import functions as F

from ontology_learning_spark.operators.extraction import concat_text_spans
from ontology_learning_spark.sources.adapters import spans_doc_text, to_spans

SF_DIR = "/root/testdata/sf0.001"

ADVERSARIAL = [
    ("1", "plain words here"), ("2", None), ("3", ""), ("4", "  lead"),
    ("5", "trail\t"), ("6", "a\t\nb   c"),
    ("7", " ".join(f"tok{i}" for i in range(40))),  # > tokens_per_span
    ("8", "x"), ("9", "\t\x0b\f"), ("10", "ünï çödé  mixed\tws"),
    ("11", "a  b"), ("12", "end space "), ("13", " \t "),
]


def _diff(via_spans, direct):
    a = via_spans.select("doc_id", "doc_text")
    b = direct.select("doc_id", "doc_text")
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_spans_doc_text_adversarial(spark):
    df = spark.createDataFrame(ADVERSARIAL, "doc_id string, text string")
    assert _diff(concat_text_spans(to_spans(df)), spans_doc_text(df)) == 0


def test_spans_doc_text_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert _diff(concat_text_spans(to_spans(docs)), spans_doc_text(docs)) == 0


def test_spans_doc_text_row_count_and_schema(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = spans_doc_text(docs)
    assert out.columns == ["doc_id", "doc_text"]
    assert dict(out.dtypes)["doc_id"] == "string"
    assert out.count() == docs.count()
