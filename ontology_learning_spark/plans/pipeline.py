"""The flagship job (SURVEY.md §3.1): documents → triples + graph tables.

One lazily-built DataFrame DAG:

    read spans table
      → concat text spans + preprocess        (narrow, codegen)
      → mapInPandas extraction                (narrow, Arrow)
      → explode mentions / triples            (narrow)
      → distinct concepts                     (shuffle #1, vocab-bounded)
      → broadcast/blocked linking + top-k     (shuffle #2, vocab-bounded)
      → when-cascade decisions                (narrow)
      → routed taxonomy triples ∪ extracted   (narrow)

The corpus-sized data never shuffles: the only exchanges are over the
distinct-concept vocabulary. At 10^12 docs the extraction stage is
embarrassingly parallel over doc_id partitions and the linking stage is
a constant-size tail.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import baseline
from ..functions import columns as C
from ..functions import semantics as S
from ..operators import canonicalize as CC
from ..operators import decisions as D
from ..operators import enrich as EN
from ..operators import extraction as E
from ..operators import linking as L
from ..sources import tables as TBL


@dataclass
class PipelineResult:
    mentions: DataFrame
    concepts: DataFrame
    matches: DataFrame
    decisions: DataFrame
    tasks: DataFrame
    mappings: DataFrame
    triples: DataFrame
    extras: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    catalog_rows: list[dict] | None = None,
    thresholds: dict | None = None,
    extra_surfaces: tuple[str, ...] = (),
) -> PipelineResult:
    """``extra_surfaces`` widens the extraction gazetteer beyond the
    link catalog (mentions of unknown-to-the-catalog terms are what
    drive EXTEND decisions)."""
    catalog_rows = catalog_rows if catalog_rows is not None else baseline.entity_catalog()
    th = thresholds or S.DEFAULT_THRESHOLDS
    surfaces = tuple(sorted(
        {r["name"].lower() for r in catalog_rows} | {s.lower() for s in extra_surfaces}
    ))

    catalog = L.prepare_catalog(spark, catalog_rows).cache()

    mentions, doc_triples, docs_text = E.extract_pipeline(docs, surfaces)
    # Eager checkpoint, not lazy cache: mentions feed THREE consumers
    # (concepts, context pairs, fan-back), and AQE runs consumer stages
    # concurrently — a lazy cache gets raced and the explode subtree
    # recomputed per stage (measured in event logs). One cheap pass
    # over the checkpointed extraction output materializes it.
    mentions = mentions.localCheckpoint(eager=True)

    # The concept DIMENSION is |vocabulary|-sized, orders of magnitude
    # below the corpus: give its stages (embed UDF, blocked joins,
    # windows, decide) a proportionate partition count instead of the
    # corpus-grade default the distinct() cache would otherwise pin
    # (32 near-empty partitions → 32 task launches + Python worker
    # spins per downstream stage — the measured serial tail). On a
    # cluster, size by |vocab| / ~50k concepts per partition.
    # Eager-checkpointed for the same race reason: FIVE match bands
    # consume prepped concurrently. parallelism//2 (not //8): the
    # fuzzy/category difflib bands run Python work proportional to the
    # blocked-pair count (which grows with corpus vocabulary — part
    # numbers are distinct concepts), and band parallelism is capped by
    # prepped's partition count — //8 left 60 core-seconds on 4 tasks.
    vocab_parts = max(2, spark.sparkContext.defaultParallelism // 2)
    concepts = E.distinct_concepts(mentions).repartition(vocab_parts)
    prepped = L.prepare_concepts(concepts).localCheckpoint(eager=True)

    # E7/E9: concept context → technical props (feeds the M4 band)
    context = EN.concept_context(mentions, docs_text)
    props = EN.extract_properties(context).drop("context")

    matches = L.find_matches(prepped, catalog, th, prepped=True, props=props)
    best = L.best_matches(matches, catalog)
    best_full = prepped.select("concept", "category").join(best, "concept", "left")

    # Eager checkpoint: the whole linking chain (context → props →
    # bands → argmax → cascade) materializes exactly once, here; the
    # downstream canonicalization probe and the triples job read a
    # vocabulary-sized table instead of re-walking the chain.
    decided = D.decide(best_full, th).localCheckpoint(eager=True)
    tasks = D.route_tasks(decided)
    mappings = D.mapping_objects(decided)

    # Taxonomy triples from routed tasks + text-extracted triples (E4/E5).
    routed_triples = tasks.select(
        F.col("name").alias("subj"),
        F.lit("subclass_of").alias("pred"),
        C.normalize_name(F.col("parent_class")).alias("obj"),
    )

    # No dedup here: apply_canonicalization ends in the (subj,pred,obj)
    # dropDuplicates anyway — deduping twice costs a full extra shuffle
    # of the triple set, and the joins in between are broadcast (narrow).
    extracted_triples = doc_triples.select("subj", "pred", "obj")
    triples = routed_triples.unionByName(extracted_triples)

    # M13: canonicalize through MAP_* alias edges (connected components
    # resolves chains; the reference's single-hop sameAs is the
    # degenerate case).
    # Normalize BEFORE the self-edge filter: a surface whose target
    # differs only in case/plurality is a self-alias and must not enter
    # the union-find (it would mark the canonical as a non-sink).
    alias_edges = mappings.select(
        F.col("name").alias("surface"),
        C.normalize_name(F.col("canonical")).alias("alias_of"),
    ).where(F.col("surface") != F.col("alias_of"))
    # no isEmpty() pre-check: it would cost a full upstream evaluation;
    # canonical_mapping handles the empty case and apply on an empty
    # broadcast map is a no-op.
    canon_map = CC.canonical_mapping(alias_edges)
    triples = CC.apply_canonicalization(triples, canon_map)

    return PipelineResult(
        mentions=mentions,
        concepts=concepts,
        matches=matches,
        decisions=decided,
        tasks=tasks,
        mappings=mappings,
        triples=triples,
    )
