"""Adapters between the driver's flat tables and the interleaved-span
document model (input_hint shape).

``to_spans`` deterministically re-shapes documents(doc_id, text, ...)
into (doc_id string, spans array<struct<kind,text,media_ref,offset>>):
text is chunked into fixed-token sentence spans and one media span is
interleaved per document (typed leaf node, text=null) so the span-
sequence invariant is exercised on driver data too. Pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS_PER_SPAN = 12


def to_spans(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             tokens_per_span: int = TOKENS_PER_SPAN) -> DataFrame:
    """Flat (doc_id, text) → interleaved-span documents.

    Span layout: text chunks of `tokens_per_span` whitespace tokens at
    offsets 0..k-1, then one media span at offset k with
    media_ref = 'img://<doc_id>/0'.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(tokens_per_span)).cast("int")
    chunk_idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))

    text_spans = F.transform(
        chunk_idx,
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.concat_ws(
                " ", F.slice(toks, i * tokens_per_span + 1, tokens_per_span)
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    media_span = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("img://"), F.col(id_col).cast("string"), F.lit("/0")).alias("media_ref"),
            n_chunks.cast("int").alias("offset"),
        )
    )
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(text_spans, media_span).alias("spans"),
    )


def spans_doc_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, doc_text) ≡ ``concat_text_spans(to_spans(df))`` projected
    to its two output columns — WITHOUT building the span arrays.

    Exactness argument: ``to_spans`` chunks ``split(trim(text), '\\s+')``
    into consecutive ``tokens_per_span`` slices at offsets 0..k-1 (array
    order = offset order, offsets unique, the media span's text is
    null), and ``concat_text_spans`` offset-sorts (a stable identity
    here), drops null-text spans, and joins chunk texts with a single
    space — so the composition is exactly the flat token join
    ``concat_ws(" ", split(trim(text), "\\s+"))``, including the empty-
    token edges (leading/trailing non-space whitespace survives
    F.trim and F.split keeps the resulting empty tokens on BOTH
    paths). Pinned by ``tests/test_round6_spans_text.py`` on
    adversarial inputs and the driver corpus.

    Why it exists (guide §1.2 "don't compute things you throw away"):
    the interpreted higher-order chunk/sort/filter/join chain costs
    more than the whole Python mention scan it feeds on mention-only
    query paths (~0.85 s of a 1.2 s query at 50k docs), while consumers
    of the SPAN MODEL itself (the flagship pipeline, multimodal decode)
    keep the real ``to_spans``."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat_ws(" ", F.split(F.trim(F.col(text_col)), r"\s+")).alias("doc_text"),
    )
