"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is pure Catalyst (codegen'd, SQL-expressible — each has a
DuckDB oracle in __spark_entry__.py), designed as narrow map-side
transforms: at 100 TB these run in the scan stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "para", "con", "una", "por", "del"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish proxy: count of word/number/punct pieces, the
    regex analogue of a BPE pre-tokenizer (reference counts tokens via
    tiktoken for cost accounting; this is the deterministic stand-in)."""
    # count matches of word-pieces of <=4 chars by: ceil(len(word)/4) summed
    toks = _tokens(col)
    return F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int")
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    toks = _tokens(col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality: length band + low punct + stopword
    presence (a C4/Gopher-style heuristic, deterministic)."""
    n_chars = F.length(col)
    len_score = F.when((n_chars >= 50) & (n_chars <= 10000), F.lit(1.0)) \
                 .when(n_chars > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    punct_score = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.when(stopword_ratio(col) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID with a CJK-character fast path."""
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))

    def _vote(words):
        # closure factory: a 2-arg lambda would be read as (element, index)
        return F.size(F.filter(_tokens(col), lambda w: w.isin(*words)))

    votes = {lang: _vote(ws) for lang, ws in LANG_STOPWORDS.items()}
    # greatest-vote wins; ties break by fixed priority en > de > fr > es
    v_en, v_de, v_fr, v_es = votes["en"], votes["de"], votes["fr"], votes["es"]
    m = F.greatest(v_en, v_de, v_fr, v_es)
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(m == 0, F.lit("unknown"))
        .when(v_en == m, F.lit("en"))
        .when(v_de == m, F.lit("de"))
        .when(v_fr == m, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Fraction of duplicate word ``n``-grams within a document — the
    Gopher-style intra-doc repetition rule (boilerplate, listicles, and
    SEO spam repeat themselves; prose doesn't). 0.0 = all grams unique,
    → 1.0 as the doc degenerates into repeats; docs shorter than ``n``
    tokens score 0.0. Pure Catalyst (the tokenize/slice shape matches
    ``dedup.word_shingles`` — distinct via array_distinct, total from
    token count)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    k = total
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, k) for j in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )
    distinct = F.size(F.array_distinct(grams))
    return F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace- and
    case-normalized text (md5 hex matches across Spark and DuckDB)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


# --- PII detection / scrubbing -------------------------------------------
#
# Training corpora are scrubbed before tokenization; the patterns below
# are deliberately the common Java-regex ∩ RE2 subset so the DuckDB
# oracle replays them byte-for-byte (no lookarounds, no backreferences).
# Order matters for redaction: email first (its local part may contain
# digits a later pass must not see), then IPv4, then phone.
PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII occurrence counts (narrow, codegen'd)."""
    return {kind: F.regexp_count(col, F.lit(pat)) for kind, pat, _ in PII_PATTERNS}


def scrub_pii(col: Column) -> Column:
    """Redact every PII match in PII_PATTERNS order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII audit: counts per kind + md5 of the scrubbed text
    (the fingerprint proves the replacement bytes, not just the counts,
    so a cross-engine oracle checks the scrub itself). Narrow map-side
    transform — at 100 TB this rides the scan stage, zero shuffle."""
    c = F.col(text_col)
    counts = pii_counts(c)
    return df.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(scrub_pii(c)).alias("scrubbed_md5"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_len: int = 2,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document, cross-engine-exact.

    The score is computed in INTEGER arithmetic —
    ``score_micro = (tf * (N+1) * 1e6) div (df+1)`` — a linear-idf
    variant whose ranking is bit-identical in any engine (no ln(), no
    float rounding mode to disagree on). Two shuffles (doc-term tf,
    term df) + a per-doc window; the df side is vocabulary-sized so
    its exchange is tiny next to the tokenized corpus — and it
    broadcasts back onto tf, so no hot-term skew ever hits a window
    partition. The tf frame is PINNED (``materialize``) because both
    the df aggregation and the scoring join consume it: without the
    pin Spark re-tokenizes the corpus for each consumer (measured —
    AQE's exchange reuse does not fire across the join's two
    subtrees), and tokenization is the only corpus-sized pass here.
    Pass ``n_docs`` when the caller already knows the corpus size
    (same contract as the LSH auto-sizing paths) — the count()
    fallback is one metadata-cheap job for ad-hoc use.
    """
    from pyspark.sql import Window

    from ..functions.persistence import materialize

    if n_docs is None:
        n_docs = df.count()
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term")
    ).where(F.length("term") >= min_len)
    tf = materialize(
        toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")), corpus_scale=True
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score_micro",
        F.expr(f"(tf * {n_docs + 1}L * 1000000L) div (df + 1)"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "score_micro", "rnk")
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first 8 hex
    chars of md5(salt|key) mod 1e6, cut by cumulative weights.

    Properties a training pipeline needs that ``df.randomSplit`` lacks:
    (1) engine-independent — the same key lands in the same split in
    Spark, DuckDB, or a bash one-liner (md5 is md5 everywhere), so
    decontamination joins across systems agree; (2) stable under
    re-partitioning, retries, and corpus growth — assignment is a pure
    function of (salt, key), never of row order or partition layout;
    (3) salt-versioned — bump the salt to re-draw every split at once.
    Pure Catalyst (md5 + conv + when chain): narrow, zero shuffle.
    """
    assert len(weights) == len(names) and len(names) >= 2
    total = float(sum(weights))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("bigint") % 1_000_000
    )
    col = None
    cum = 0.0
    for w, n in zip(weights[:-1], names[:-1]):
        cum += w / total
        cond = bucket < int(round(cum * 1_000_000))
        col = F.when(cond, F.lit(n)) if col is None else col.when(cond, F.lit(n))
    return df.withColumn("split", col.otherwise(F.lit(names[-1])))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one narrow projection."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio_en"),
        repetition_ratio(c).alias("repetition_3gram"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
