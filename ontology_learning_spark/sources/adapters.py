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
