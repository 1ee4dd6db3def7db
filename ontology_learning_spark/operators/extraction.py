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
# carried as arrays and exploded afterwards. clean_text is NOT emitted:
# through round 4 it rode along "so text consumers never rescan the
# corpus", but that shipped every document body back over Arrow and
# pinned it in the localCheckpoint, where every consumer re-deserialized it
# (checkpoint blocks have no column pruning) — the extraction
# materialize was measured at 568 of 854 core-s at 16 executors, mostly
# memory-bandwidth stall. The one text consumer (concept context)
# instead recomputes clean_text from the source with the pure-Catalyst
# preprocess chain: register-bound CPU work that scales ~0.98 on the
# profiled host, traded for the stored-text bytes that scale ~0.57.
#
# The E2 validity filter and E12 normalization run INSIDE the Python
# pass, not relationally: surfaces repeat corpus-scale while the
# distinct-surface vocabulary is tiny, so a per-executor dict turns
# per-mention regex work into a lookup (Catalyst re-evaluates the
# regexp chains per row — measured as the top JVM-CPU stage at 80k
# docs, and the one that inflates worst under high thread counts).
# Parity: the Python twins (semantics.is_valid_concept /
# normalize_name) ARE the oracle's functions.
_EXTRACT_SCHEMA = (
    "doc_id string, "
    "mentions array<struct<surface:string, norm_surface:string, char_offset:int>>, "
    "triples array<struct<subj:string, pred:string, obj:string>>"
)

# surface → norm_surface for valid surfaces, None for invalid; shared
# across batches for the worker's lifetime (vocabulary-bounded).
_NORM_CACHE: dict[str, str | None] = {}
_NORM_CACHE_MAX = 4_000_000


def _norm_or_none(surface: str) -> str | None:
    v = _NORM_CACHE.get(surface, "?")
    if v == "?":
        v = S.normalize_name(surface) if S.is_valid_concept(surface) else None
        if len(_NORM_CACHE) >= _NORM_CACHE_MAX:
            _NORM_CACHE.clear()
        _NORM_CACHE[surface] = v
    return v


_SPAN_COL_CACHE: dict[str, "F.Column"] = {}


def concat_text_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Add a ``doc_text`` column: text spans sorted by offset, joined by
    a single space. Media spans contribute nothing; all spans survive.
    The Column tree (HOF lambdas = several py4j round trips) is
    memoized per spans column name — it is rebuilt on every incremental
    trigger otherwise."""
    col = _SPAN_COL_CACHE.get(spans_col)
    if col is None:
        sorted_spans = F.array_sort(
            F.col(spans_col),
            lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
            .when(l["offset"] > r["offset"], F.lit(1))
            .otherwise(F.lit(0)),
        )
        texts = F.filter(
            sorted_spans, lambda s: (s["kind"] == "text") & s["text"].isNotNull()
        )
        col = F.array_join(F.transform(texts, lambda s: s["text"]), " ")
        _SPAN_COL_CACHE[spans_col] = col
    return df.withColumn("doc_text", col)


def preprocess(df: DataFrame, text_col: str = "doc_text") -> DataFrame:
    return df.withColumn("clean_text", C.preprocess_text_cached(text_col))


def extract(df: DataFrame, surfaces: tuple[str, ...], relations: bool = True) -> DataFrame:
    """E1+E4 in one Arrow pass over (doc_id, clean_text).

    ``relations=False`` skips the E4 relation-pattern scan and emits
    empty ``triples`` arrays (same schema): the relation regex pass is
    ~2/3 of the per-doc Python cost (profiled: 2.52 s vs 1.24 s for the
    mention scan per 5k docs single-core), and mention-only consumers
    (the mention-count queries) never read the triples column — Spark
    cannot prune work inside an opaque mapInPandas (guide §4.1), so the
    caller must. Mentions are bit-identical either way (pytest-pinned).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = X.get_matcher(surfaces)  # built once per executor
        _empty: list[tuple[str, str, str]] = []
        for pdf in batches:
            out_doc, out_m, out_t = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["clean_text"]):
                mentions = matcher.find(text or "")
                triples = X.find_relations(text or "", surfaces) if relations else _empty
                out_doc.append(doc_id)
                valid = []
                for m in mentions:
                    norm = _norm_or_none(m.surface)
                    if norm is not None:
                        valid.append((m.surface, norm, m.char_offset))
                out_m.append(valid)
                # E5-adjacent hygiene, same contract as the old
                # relational triples_table: both endpoints valid,
                # normalized, and non-self-loop (plural variants can
                # collapse to self-loops after normalization).
                vt = []
                for (a, p, b) in triples:
                    na, nb = _norm_or_none(a), _norm_or_none(b)
                    if na is not None and nb is not None and na != nb:
                        vt.append((na, p, nb))
                out_t.append(vt)
            yield pd.DataFrame(
                {"doc_id": out_doc, "mentions": out_m, "triples": out_t}
            )

    return df.select("doc_id", "clean_text").mapInPandas(_run, _EXTRACT_SCHEMA)


def mentions_table(extracted: DataFrame) -> DataFrame:
    """Explode mentions (E2 validity + E12 normalization already
    applied inside the extraction pass — see _EXTRACT_SCHEMA note)."""
    return extracted.select(
        "doc_id", F.explode("mentions").alias("m")
    ).select(
        "doc_id",
        F.col("m.surface").alias("surface"),
        F.col("m.char_offset").alias("char_offset"),
        F.col("m.norm_surface").alias("norm_surface"),
    )


def triples_table(extracted: DataFrame) -> DataFrame:
    """Explode relation triples (endpoint validity, normalization and
    self-loop removal already applied inside the extraction pass)."""
    return extracted.select(
        "doc_id", F.explode("triples").alias("t")
    ).select(
        "doc_id",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
    )


def distinct_concepts(mentions: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """E3: global distinct of normalized surfaces. Shuffle is bounded by
    vocabulary size, not corpus size (partial aggregation map-side).

    ``num_partitions`` sizes the OUTPUT partitioning in the same
    exchange: hash-repartition by the key then dropDuplicates — the
    dedup reuses the repartition's co-location, where distinct() THEN
    repartition(n) would pay a second full exchange of the vocabulary.
    """
    surf = mentions.select("norm_surface")
    if num_partitions:
        surf = surf.repartition(num_partitions, F.col("norm_surface"))
    return surf.dropDuplicates().withColumnRenamed("norm_surface", "concept")


def extract_pipeline(
    docs: DataFrame, surfaces: tuple[str, ...], pin: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """documents(doc_id, spans) → (mentions, doc-level triples,
    preprocessed docs (doc_id, clean_text)).

    The mapInPandas output is EAGERLY materialized, not lazily cached:
    it feeds several consumers (mentions, triples), and a lazy cache
    lets concurrent downstream stages race ahead of cache population
    inside one job — event-log profiling showed the whole Python
    extraction pass executing twice (~2x the corpus-scale
    core-seconds). ``materialize`` runs the pass exactly once
    (single-host local masters: lineage-cutting localCheckpoint;
    real clusters: compressed columnar checkpoint so each consumer leg
    re-reads pruned, compressed columns instead of full raw blocks —
    see functions/persistence.py for the strategy matrix).

    The returned docs_text is LAZY — a pure-Catalyst recompute from the
    source, not a slice of the checkpoint. Storing document text in the
    checkpoint dominated its bytes (and checkpoint reads deserialize
    full rows — no column pruning), so the text consumer trades a
    second codegen pass over the source for not dragging every document
    body through executor memory twice (see _EXTRACT_SCHEMA note).

    ``pin=False`` skips the materialization for SINGLE-consumer plans —
    a streaming foreachBatch sink that only writes the mentions table
    pays one extra pass (the eager count) plus a memory copy of the
    whole batch for a pin nothing re-reads; with multiple consumers it
    must stay True or the Python pass re-runs per consumer.
    """
    prepped = preprocess(concat_text_spans(docs)).select("doc_id", "clean_text")
    extracted = extract(prepped, surfaces)
    if pin:
        extracted = materialize(extracted, corpus_scale=True)
    return (
        mentions_table(extracted),
        triples_table(extracted),
        prepped,
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
