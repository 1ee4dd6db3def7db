"""E6: robust JSON extraction (3-tier) + S10 string-triple parsing.

The reference defensively re-parses LLM output with three fallbacks
(direct parse → fenced ```json block → first {...} span) and re-parses
"S -> type -> O" strings with a regex. Deterministic rules make the
fallbacks rarely needed, but the utilities remain part of the operator
surface for ingesting third-party/legacy payloads — expressed as
Catalyst expressions so they run JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def robust_json(col: Column, schema: str) -> Column:
    """3-tier parse: direct; else the fenced ```json block; else the
    first {...} span. from_json yields a struct of nulls (not a null
    struct) on garbage, so tier selection uses try_parse_json validity
    on the SOURCE string, then parses once."""
    fenced = F.regexp_extract(col, r"```(?:json)?\s*(\{[\s\S]*?\})\s*```", 1)
    braced = F.regexp_extract(col, r"(\{[\s\S]*\})", 1)
    src = F.coalesce(
        F.when(F.try_parse_json(col).isNotNull(), col),
        F.when(F.try_parse_json(fenced).isNotNull(), fenced),
        F.when(F.try_parse_json(braced).isNotNull(), braced),
    )
    return F.from_json(src, schema)


def parse_triple_strings(col: Column) -> Column:
    """S10: '"A" -> rel -> "B"' (quotes optional) → struct(subj, pred, obj);
    null when the string doesn't have exactly three ' -> ' parts."""
    parts = F.split(col, r"\s*->\s*")
    unq = lambda c: F.regexp_replace(F.trim(c), r'^"|"$', "")
    return F.when(
        F.size(parts) == 3,
        F.struct(
            unq(F.element_at(parts, 1)).alias("subj"),
            unq(F.element_at(parts, 2)).alias("pred"),
            unq(F.element_at(parts, 3)).alias("obj"),
        ),
    )
