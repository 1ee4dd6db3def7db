"""Enrichment operators (SURVEY.md E7-E11): concept context retrieval,
technical property extraction, Schema.org object generation.

All property extraction is pure Catalyst regexp (the reference prompts
an LLM per concept; the deterministic twin is unit-pattern rules over
the same capped context window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C
from ..functions import semantics as S

CONTEXT_CHUNKS = S.CONTEXT_CHUNKS
CONTEXT_CAP = S.CONTEXT_CAP


def concept_context(
    mentions: DataFrame, docs_text: DataFrame, text_builder=None
) -> DataFrame:
    """E7: first N docs mentioning each concept, concatenated and capped.

    mentions: (doc_id, norm_surface, ...); docs_text: (doc_id, clean_text).

    ``text_builder`` (optional): a frame→frame callable that ADDS the
    clean_text column. When given, docs_text may be the raw spans table
    and the text expression is evaluated only for the ≤N·|vocab| docs
    that survive a semi-join on the top-N hit ids — without it, the
    clean_text projection sits below the join and Catalyst evaluates it
    for every corpus row, hit or not. The semi-join keeps the
    evaluation once-per-DOC (building text above the row-multiplying
    top join would recompute it once per concept-doc pair).

    Join order matters at scale: the top-N-docs window runs on BARE
    (concept, doc_id) pairs — 16 bytes/row — and only the <=N·|vocab|
    surviving rows fetch document text, via a broadcast of the id set
    into the corpus-side join. (Round 1 joined the full text in FIRST,
    shipping every document body through the distinct + window
    shuffles.) The broadcast hint is right while N·|vocab| stays
    dimension-sized; for extreme vocabularies drop the hint and AQE
    picks the join side.
    """
    pairs = mentions.select("norm_surface", "doc_id")
    # Two-phase salted min-N: head concepts appear in most documents,
    # so a single window keyed by concept alone puts one partition-
    # sized sort on one core (measured: 4 tasks x 19.5s at 80k docs,
    # all other cores idle). Phase 1 ranks within (concept, salt-of-32)
    # buckets — balanced by construction — and keeps <=N DISTINCT
    # doc_ids per bucket via dense_rank (a doc mentioning the concept
    # k times contributes k equal-ranked rows, deduped after pruning),
    # fusing the (surface, doc) distinct into the same exchange: one
    # corpus-sized shuffle instead of two. Phase 2 ranks the
    # <=32N-distinct-doc survivors per concept. Identical output: the
    # N globally-smallest doc_ids survive their buckets.
    salt = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(32))
    w1 = Window.partitionBy("norm_surface", "_salt").orderBy("doc_id")
    pre = (
        pairs.withColumn("_salt", salt)
        .withColumn("_rk1", F.dense_rank().over(w1))
        .where(F.col("_rk1") <= CONTEXT_CHUNKS)
        .drop("_salt", "_rk1")
        .dropDuplicates(["norm_surface", "doc_id"])
    )
    w = Window.partitionBy("norm_surface").orderBy("doc_id")
    top = pre.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= CONTEXT_CHUNKS)
    top = top.select("norm_surface", "doc_id", "rn")
    if text_builder is not None:
        from ..functions.persistence import materialize

        # top feeds two consumers here (the hit-id semi-join and the
        # text join); pinning the N·|vocab|-row frame stops the corpus
        # window chain from re-executing per consumer
        top = materialize(top)
        docs_text = text_builder(
            docs_text.join(F.broadcast(top.select("doc_id").distinct()), "doc_id", "left_semi")
        ).select("doc_id", "clean_text")
    hit_docs = docs_text.join(F.broadcast(top), "doc_id")
    ctx = hit_docs.groupBy("norm_surface").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("rn", "clean_text")))["clean_text"]).alias("_ctx_raw")
    )
    return ctx.select(
        F.col("norm_surface").alias("concept"),
        F.substring("_ctx_raw", 1, CONTEXT_CAP).alias("context"),
    )


def extract_properties(context_df: DataFrame) -> DataFrame:
    """E9: per-concept technical props from context (nulls when absent).
    Pattern strings shared with the oracle (semantics.PROP_PATTERNS)."""
    out = context_df
    for prop, pat in S.PROP_PATTERNS.items():
        v = F.regexp_extract(F.col("context"), pat, 1)
        out = out.withColumn(prop, F.when(v != "", v))
    return out


def schema_objects(decided: DataFrame, props: DataFrame) -> DataFrame:
    """E8/E11: JSON-LD-shaped Product objects for EXTEND/UNCERTAIN
    concepts, enriched with extracted props (elec:* namespace)."""
    base = decided.where(F.col("decision").isin("EXTEND", "UNCERTAIN")).select(
        "concept", "category", "confidence"
    )
    joined = base.join(props, "concept", "left")
    elec_props = F.map_filter(
        F.create_map(
            F.lit("elec:frequency"), F.col("frequency"),
            F.lit("elec:impedance"), F.col("impedance"),
            F.lit("elec:voltage"), F.col("voltage"),
            F.lit("elec:connector"), F.col("connector"),
            F.lit("elec:mounting"), F.col("mounting"),
        ),
        lambda k, v: v.isNotNull(),
    )
    obj = F.struct(
        F.lit("Product").alias("@type"),
        F.col("concept").alias("name"),
        F.col("category").alias("category"),
        F.concat(F.lit("http://www.productontology.org/id/"),
                 C.slugify(F.col("concept"))).alias("additionalType"),
        elec_props.alias("elec_properties"),
    )
    # Exported JSON-LD mirrors the reference shape (schema_org_relation_
    # extractor.py:245-262): @context carries @vocab + the elec namespace
    # whenever namespaced props exist, and elec:* keys sit at top level.
    # to_json drops null fields, so absent props vanish from the JSON.
    has_elec = F.size(F.map_keys(elec_props)) > 0
    ctx = F.when(
        has_elec,
        F.to_json(F.struct(
            F.lit("https://schema.org/").alias("@vocab"),
            F.lit("https://example.org/electrical/").alias("elec"),
        )),
    ).otherwise(F.lit('"https://schema.org/"'))
    body = F.to_json(F.struct(
        F.lit("Product").alias("@type"),
        F.col("concept").alias("name"),
        F.col("category").alias("category"),
        F.concat(F.lit("http://www.productontology.org/id/"),
                 C.slugify(F.col("concept"))).alias("additionalType"),
        F.col("frequency").alias("elec:frequency"),
        F.col("impedance").alias("elec:impedance"),
        F.col("voltage").alias("elec:voltage"),
        F.col("connector").alias("elec:connector"),
        F.col("mounting").alias("elec:mounting"),
    ))
    json_ld = F.concat(F.lit('{"@context":'), ctx, F.lit(","), F.substring(body, 2, 2_000_000))
    return joined.select("concept", obj.alias("schema_object"), json_ld.alias("json_ld"))
