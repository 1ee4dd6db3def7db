"""Extraction operators (SURVEY.md §2.2): spans → mentions + relation triples.

Spark-first shape:
- span concatenation + preprocessing are pure Catalyst (higher-order
  array functions + regexp chains → whole-stage codegen, no Python);
- the dictionary/pattern extraction (E1/E4) is ONE ``mapInPandas`` pass
  per document batch — the matcher is built once per executor process
  (lru_cache keyed on the frozen vocabulary) and scans Arrow batches;
- the validity filter (E2) and normalization (E12) run relationally on
  the exploded mention rows.

The spans column itself is never mutated — the per-row span-sequence
invariant (kind, text, media_ref, order) holds trivially; tests assert
it across the pipeline.

Reference parity (behavior studied, no code copied): preprocessing
src/data_loader.py:13-47; per-chunk concept extraction contract
src/idea_extractor.py:63-124 (validity rules :49-61, stopwords :22-29,
global dedup+sort :121); relation extraction src/relation_extractor.py:
19-95 (dedup + all-keys-non-empty :85-95).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import columns as C
from ..functions import extraction_rules as X
from ..functions import semantics as S
from ..functions.persistence import materialize

# Output schema of the single extraction pass: mentions and triples are
# carried as arrays and exploded afterwards; clean_text rides along so
# consumers that need document text (concept context) never rescan the
# corpus — the whole pipeline makes exactly ONE pass over raw documents.
_EXTRACT_SCHEMA = (
    "doc_id string, clean_text string, "
    "mentions array<struct<surface:string, char_offset:int>>, "
    "triples array<struct<subj:string, pred:string, obj:string>>"
)


def concat_text_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Add a ``doc_text`` column: text spans sorted by offset, joined by
    a single space. Media spans contribute nothing; all spans survive."""
    sorted_spans = F.array_sort(
        F.col(spans_col),
        lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
        .when(l["offset"] > r["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    texts = F.filter(
        sorted_spans, lambda s: (s["kind"] == "text") & s["text"].isNotNull()
    )
    return df.withColumn(
        "doc_text", F.array_join(F.transform(texts, lambda s: s["text"]), " ")
    )


def preprocess(df: DataFrame, text_col: str = "doc_text") -> DataFrame:
    return df.withColumn("clean_text", C.preprocess_text(F.col(text_col)))


def extract(df: DataFrame, surfaces: tuple[str, ...]) -> DataFrame:
    """E1+E4 in one Arrow pass over (doc_id, clean_text)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = X.get_matcher(surfaces)  # built once per executor
        for pdf in batches:
            out_doc, out_txt, out_m, out_t = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["clean_text"]):
                mentions = matcher.find(text or "")
                triples = X.find_relations(text or "", surfaces)
                out_doc.append(doc_id)
                out_txt.append(text)
                out_m.append([(m.surface, m.char_offset) for m in mentions])
                out_t.append(triples)
            yield pd.DataFrame(
                {"doc_id": out_doc, "clean_text": out_txt,
                 "mentions": out_m, "triples": out_t}
            )

    return df.select("doc_id", "clean_text").mapInPandas(_run, _EXTRACT_SCHEMA)


def mentions_table(extracted: DataFrame) -> DataFrame:
    """Explode mentions, apply E2 validity filter + E12 normalization."""
    m = extracted.select(
        "doc_id", F.explode("mentions").alias("m")
    ).select(
        "doc_id",
        F.col("m.surface").alias("surface"),
        F.col("m.char_offset").alias("char_offset"),
    )
    return m.where(C.is_valid_concept(F.col("surface"))).withColumn(
        "norm_surface", C.normalize_name(F.col("surface"))
    )


def triples_table(extracted: DataFrame) -> DataFrame:
    """Explode relation triples; filter both endpoints; normalize names.
    Dedup (E5) on (subj, pred, obj)."""
    t = extracted.select(
        "doc_id", F.explode("triples").alias("t")
    ).select(
        "doc_id",
        F.col("t.subj").alias("subj_raw"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj_raw"),
    )
    t = t.where(
        C.is_valid_concept(F.col("subj_raw")) & C.is_valid_concept(F.col("obj_raw"))
    )
    return t.select(
        "doc_id",
        C.normalize_name(F.col("subj_raw")).alias("subj"),
        "pred",
        C.normalize_name(F.col("obj_raw")).alias("obj"),
    ).where(F.col("subj") != F.col("obj"))  # plural variants can collapse to self-loops


def distinct_concepts(mentions: DataFrame) -> DataFrame:
    """E3: global distinct of normalized surfaces. Shuffle is bounded by
    vocabulary size, not corpus size (partial aggregation map-side)."""
    return mentions.select("norm_surface").distinct().withColumnRenamed(
        "norm_surface", "concept"
    )


def extract_pipeline(
    docs: DataFrame, surfaces: tuple[str, ...]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """documents(doc_id, spans) → (mentions, doc-level triples,
    preprocessed docs (doc_id, clean_text)).

    The mapInPandas output is EAGERLY materialized, not lazily cached:
    it feeds several consumers (mentions, triples, context pairs), and
    a lazy cache lets concurrent downstream stages race ahead of cache
    population inside one job — event-log profiling showed the whole
    Python extraction pass executing twice (~2x the corpus-scale
    core-seconds). ``materialize`` runs the pass exactly once (local
    mode: lineage-cutting localCheckpoint; cluster: replicated persist
    — see functions/persistence.py for the fault-tolerance trade).
    """
    prepped = preprocess(concat_text_spans(docs)).select("doc_id", "spans", "clean_text")
    extracted = materialize(extract(prepped, surfaces))
    return (
        mentions_table(extracted),
        triples_table(extracted),
        extracted.select("doc_id", "clean_text"),
    )


__all__ = [
    "concat_text_spans",
    "preprocess",
    "extract",
    "mentions_table",
    "triples_table",
    "distinct_concepts",
    "extract_pipeline",
]
