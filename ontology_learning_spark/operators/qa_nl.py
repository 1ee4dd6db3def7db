"""Deterministic NL→SQL QA chain over the ontology graph views.

Reference parity (behavior studied, no code copied):
- NL QA loop      src/evaluation/qa_system.py:36-75 — an LLM
  GraphCypherQAChain: NL question → generated Cypher → bolt result
  records → NL answer (transcript src/evaluation/sample_qa.txt:1-33).
- backend wiring  src/ontology_management_backend.py:52-78,867-888.

The deterministic core of that chain — query generation over a fixed
graph schema, execution, and answer rendering — is re-expressed here
as a TEMPLATE ROUTER: each supported question form compiles to ANSI
SQL over the same ``ont_nodes(name, source, needs_review, ...)`` /
``ont_edges(src, rel_type, dst)`` views the §2.5 corpus uses
(qa_views.py), plus ``ont_props(name, prop, value)`` for the
property-lookup forms the reference transcript shows
("Who is the manufacturer of the BPW34?", "What is the impedance of
the 2.45 GHz Antenna?"). The generated SQL is dialect-shared: the
identical text runs on Spark and DuckDB, so the router is
cross-engine oracle-able end to end. The LLM paraphrase layer stays
out of engine scope (SURVEY §2.5) — unrecognized phrasings raise
``UnroutableQuestion`` instead of hallucinating a query.

Scale note: every compiled query is vocabulary-bounded (the ontology
graph, not the corpus), so driver-side execution of a QA battery is
O(|V|+|E|) regardless of corpus size; the transitive intents reuse
the corpus' recursive-CTE / unrolled-BFS shapes whose intermediate
relations are bounded by |V| per level (qa_views.py Q16 note).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class UnroutableQuestion(ValueError):
    """Raised when no template matches the question."""


def _q(s: str) -> str:
    """Escape a captured entity for embedding in a SQL string literal.

    Doubling quotes is the portable literal escape; backslashes are
    literal in both engines' default modes. Control characters are
    rejected outright — they never appear in legitimate names.
    """
    if re.search(r"[\x00-\x1f]", s):
        raise UnroutableQuestion(f"control characters in entity: {s!r}")
    return s.replace("'", "''")


def _clean(question: str) -> str:
    return re.sub(r"\s+", " ", question).strip().rstrip("?.!").strip()


_SUB = "SELECT src, dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF'"


def _sql_manufacturer(e: str) -> str:
    return (
        "SELECT value AS manufacturer FROM ont_props "
        f"WHERE lower(name) = lower('{_q(e)}') AND prop = 'manufacturer' "
        "ORDER BY manufacturer"
    )


def _sql_property(p: str, e: str) -> str:
    # The reference graph stores technical properties under the elec:
    # namespace (schema_org_relation_extractor prop vocab); accept the
    # bare or namespaced key so "impedance" finds "elec:impedance".
    return (
        "SELECT prop, value FROM ont_props "
        f"WHERE lower(name) = lower('{_q(e)}') "
        f"AND (lower(prop) = lower('{_q(p)}') "
        f"OR lower(prop) = lower('elec:{_q(p)}')) "
        "ORDER BY prop, value"
    )


def _sql_subclasses(e: str) -> str:
    return (
        "SELECT src AS name FROM ont_edges WHERE rel_type = 'SUBCLASS_OF' "
        f"AND lower(dst) = lower('{_q(e)}') ORDER BY name"
    )


def _sql_parent(e: str) -> str:
    return (
        "SELECT dst AS name FROM ont_edges WHERE rel_type = 'SUBCLASS_OF' "
        f"AND lower(src) = lower('{_q(e)}') ORDER BY name"
    )


def _sql_descendants(e: str) -> str:
    return f"""
        WITH RECURSIVE sub(src, dst) AS ({_SUB}),
        d(name) AS (
          SELECT src FROM sub WHERE lower(dst) = lower('{_q(e)}')
          UNION ALL
          SELECT s.src FROM sub s JOIN d ON s.dst = d.name
        )
        SELECT DISTINCT name FROM d ORDER BY name
    """


def _sql_is_a(e: str, c: str) -> str:
    return f"""
        WITH RECURSIVE sub(src, dst) AS ({_SUB}),
        a(name) AS (
          SELECT dst FROM sub WHERE lower(src) = lower('{_q(e)}')
          UNION ALL
          SELECT s.dst FROM sub s JOIN a ON s.src = a.name
        )
        SELECT DISTINCT name AS ancestor FROM a
        WHERE lower(name) = lower('{_q(c)}') ORDER BY ancestor
    """


def _sql_parts(e: str) -> str:
    return f"""
        SELECT part FROM (
          SELECT dst AS part FROM ont_edges
          WHERE rel_type = 'HASPART' AND lower(src) = lower('{_q(e)}')
          UNION
          SELECT src AS part FROM ont_edges
          WHERE rel_type = 'PARTOF' AND lower(dst) = lower('{_q(e)}')
        ) t ORDER BY part
    """


def _sql_related(e: str) -> str:
    return f"""
        SELECT other, rel_type FROM (
          SELECT dst AS other, rel_type FROM ont_edges
          WHERE lower(src) = lower('{_q(e)}') AND rel_type <> 'SUBCLASS_OF'
          UNION
          SELECT src AS other, rel_type FROM ont_edges
          WHERE lower(dst) = lower('{_q(e)}') AND rel_type <> 'SUBCLASS_OF'
        ) t ORDER BY other, rel_type
    """


def _sql_substring(pat: str) -> str:
    return (
        "SELECT name FROM ont_nodes "
        f"WHERE lower(name) LIKE lower('%{_q(pat)}%') ORDER BY name"
    )


def _sql_count_concepts() -> str:
    return "SELECT CAST(COUNT(*) AS BIGINT) AS n_concepts FROM ont_nodes"


def _sql_count_rels() -> str:
    return "SELECT CAST(COUNT(*) AS BIGINT) AS n_relationships FROM ont_edges"


def _sql_review() -> str:
    return "SELECT name FROM ont_nodes WHERE needs_review ORDER BY name"


def _sql_leaves() -> str:
    return (
        "SELECT name FROM ont_nodes WHERE name NOT IN "
        "(SELECT dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF') ORDER BY name"
    )


def _sql_orphans() -> str:
    return (
        "SELECT name FROM ont_nodes WHERE name NOT IN "
        "(SELECT src FROM ont_edges WHERE rel_type = 'SUBCLASS_OF') "
        "AND lower(name) <> 'thing' ORDER BY name"
    )


def _sql_top_degree(k: str) -> str:
    n = int(k)
    if not 1 <= n <= 1000:
        raise UnroutableQuestion(f"top-k out of range: {n}")
    return f"""
        SELECT name, CAST(degree AS BIGINT) AS degree FROM (
          SELECT name, COUNT(*) AS degree FROM (
            SELECT src AS name FROM ont_edges
            UNION ALL SELECT dst AS name FROM ont_edges
          ) e GROUP BY name
        ) d ORDER BY degree DESC, name ASC LIMIT {n}
    """


def _sql_siblings(e: str) -> str:
    return f"""
        SELECT DISTINCT s.src AS name
        FROM ont_edges s
        JOIN ont_edges me ON me.rel_type = 'SUBCLASS_OF'
         AND lower(me.src) = lower('{_q(e)}') AND s.dst = me.dst
        WHERE s.rel_type = 'SUBCLASS_OF' AND lower(s.src) <> lower('{_q(e)}')
        ORDER BY name
    """


def _sql_hops(a: str, b: str) -> str:
    # Level-synchronous BFS unrolled to 7 hops, min-aggregated per node
    # each level so intermediates are bounded by |V| (same shape and
    # rationale as qa_views Q16; see the note there).
    levels = []
    for k in range(1, 8):
        levels.append(
            f"h{k}(node, hops) AS (\n"
            f"  SELECT node, MIN(hops) AS hops FROM (\n"
            f"    SELECT node, hops FROM h{k - 1}\n"
            f"    UNION ALL\n"
            f"    SELECT u.dst, h{k - 1}.hops + 1 FROM und u"
            f" JOIN h{k - 1} ON u.src = h{k - 1}.node\n"
            f"  ) lvl GROUP BY node\n"
            f")"
        )
    joined = ",\n        ".join(levels)
    return f"""
        WITH und(src, dst) AS (
          SELECT src, dst FROM ont_edges UNION SELECT dst, src FROM ont_edges
        ),
        h0(node, hops) AS (
          SELECT name, 0 FROM ont_nodes WHERE lower(name) = lower('{_q(a)}')
        ),
        {joined}
        SELECT CAST(MIN(hops) AS INT) AS hops
        FROM h7 WHERE lower(node) = lower('{_q(b)}')
    """


@dataclass(frozen=True)
class Intent:
    name: str
    patterns: tuple[str, ...]
    build: Callable[..., str]
    render: Callable[[tuple[str, ...], list], str]


def _names(rows: list) -> str:
    return ", ".join(str(r[0]) for r in rows)


def _r_manufacturer(g, rows):
    if not rows:
        return f"No manufacturer is recorded for the {g[0]}."
    return f"The manufacturer of the {g[0]} is {_names(rows)}."


def _r_property(g, rows):
    if not rows:
        return f"No {g[0]} is recorded for the {g[1]}."
    return f"The {g[0]} of the {g[1]} is {', '.join(str(r[1]) for r in rows)}."


def _r_list(noun: str):
    def render(g, rows):
        subj = g[0] if g else ""
        if not rows:
            return f"No {noun} found" + (f" for {subj}." if subj else ".")
        head = f"{noun} of {subj}" if subj else noun
        return f"{head.capitalize()}: {_names(rows)}."

    return render


def _r_is_a(g, rows):
    verdict = "Yes" if rows else "No"
    return f"{verdict}, {g[0]} is {'a' if rows else 'not a'} kind of {g[1]}."


def _r_count(noun: str):
    def render(g, rows):
        n = rows[0][0] if rows else 0
        return f"There are {n} {noun}."

    return render


def _r_degree(g, rows):
    if not rows:
        return "The graph has no relationships."
    return "Most connected concepts: " + ", ".join(
        f"{r[0]} ({r[1]})" for r in rows
    ) + "."


def _r_hops(g, rows):
    if not rows or rows[0][0] is None:
        return f"{g[0]} and {g[1]} are not connected within 7 hops."
    return f"{g[0]} and {g[1]} are connected in {rows[0][0]} hops."


_E = r"(?:the\s+)?(.+?)"  # lazy entity capture, optional article

INTENTS: tuple[Intent, ...] = (
    Intent(
        "manufacturer_of",
        (rf"who (?:is|makes) the manufacturer of {_E}",
         rf"who manufactures {_E}",
         rf"who is the manufacturer of {_E}"),
        _sql_manufacturer,
        _r_manufacturer,
    ),
    Intent(
        "is_a",
        (rf"is {_E} a (?:kind|type|subclass) of {_E}",),
        _sql_is_a,
        _r_is_a,
    ),
    Intent(
        "direct_parent",
        (rf"what is the (?:direct )?parent (?:class )?of {_E}",),
        _sql_parent,
        _r_list("parent"),
    ),
    Intent(
        "subclasses_of",
        (rf"what are the (?:direct )?(?:subclasses|children) of {_E}",
         rf"list the (?:direct )?(?:subclasses|children) of {_E}"),
        _sql_subclasses,
        _r_list("subclasses"),
    ),
    Intent(
        "descendants_of",
        (rf"(?:list|show) (?:all|every) (?:the )?(?:descendants|kinds|types) of {_E}",
         rf"what are all (?:the )?(?:descendants|kinds|types) of {_E}"),
        _sql_descendants,
        _r_list("descendants"),
    ),
    Intent(
        "parts_of",
        (rf"what are the parts of {_E}", rf"what is part of {_E}"),
        _sql_parts,
        _r_list("parts"),
    ),
    Intent(
        "related_to",
        (rf"what is (?:related|connected) to {_E}",
         rf"what relationships does {_E} have"),
        _sql_related,
        _r_list("relationships"),
    ),
    Intent(
        "siblings_of",
        (rf"what are the siblings of {_E}",),
        _sql_siblings,
        _r_list("siblings"),
    ),
    Intent(
        "find_substring",
        (r"(?:find|show|list) (?:all )?concepts (?:containing|matching|named like) '(.+?)'",),
        _sql_substring,
        _r_list("concepts matching"),
    ),
    Intent(
        "count_concepts",
        (r"how many (?:concepts|nodes|classes) are there(?: in the (?:graph|ontology))?",),
        _sql_count_concepts,
        _r_count("concepts"),
    ),
    Intent(
        "count_relationships",
        (r"how many (?:relationships|edges|relations) are there(?: in the (?:graph|ontology))?",),
        _sql_count_rels,
        _r_count("relationships"),
    ),
    Intent(
        "needs_review",
        (r"which concepts (?:need|require) review",
         r"what is (?:flagged|marked) for review"),
        _sql_review,
        _r_list("concepts needing review"),
    ),
    Intent(
        "leaves",
        (r"which concepts are leaves",
         r"which concepts have no (?:children|subclasses)"),
        _sql_leaves,
        _r_list("leaf concepts"),
    ),
    Intent(
        "orphans",
        (r"which concepts are orphans",
         r"which concepts have no parent"),
        _sql_orphans,
        _r_list("orphan concepts"),
    ),
    Intent(
        "top_degree",
        (r"what are the top (\d+) most connected concepts",
         r"(?:list|show) the (\d+) most connected concepts"),
        _sql_top_degree,
        _r_degree,
    ),
    Intent(
        "hops_between",
        (rf"how many hops (?:connect|between|separate) {_E} (?:and|to|from) {_E}",
         rf"how (?:far apart|many steps) are {_E} and {_E}"),
        _sql_hops,
        _r_hops,
    ),
    # Generic property lookup LAST: its "what is the P of E" shape
    # would otherwise shadow the more specific templates above.
    Intent(
        "property_of",
        (rf"what is the ([a-z][a-z0-9 _:-]*?) of {_E}",),
        _sql_property,
        _r_property,
    ),
)


def parse_question(question: str) -> tuple[Intent, tuple[str, ...]]:
    """Route a question to (intent, captured params) or raise
    UnroutableQuestion — the router never guesses."""
    text = _clean(question)
    for intent in INTENTS:
        for pat in intent.patterns:
            m = re.fullmatch(pat, text, flags=re.IGNORECASE)
            if m:
                return intent, tuple(g.strip() for g in m.groups())
    raise UnroutableQuestion(question)


def compile_question(question: str) -> tuple[str, str]:
    """NL question → (intent name, executable SQL). The SQL text is
    dialect-shared: it runs unchanged on Spark and DuckDB."""
    intent, groups = parse_question(question)
    return intent.name, intent.build(*groups)


def answer_question(spark: SparkSession, question: str) -> dict:
    """Full chain for one question, mirroring the reference transcript
    stages: NL → query text → result records → NL answer."""
    intent, groups = parse_question(question)
    sql = intent.build(*groups)
    rows = [tuple(r) for r in spark.sql(sql).collect()]
    return {
        "question": question,
        "intent": intent.name,
        "sql": sql,
        "rows": rows,
        "answer": intent.render(groups, rows),
    }


# The fixed evaluation battery: one phrasing per intent, worded the way
# the reference transcript words its questions.
BATTERY: tuple[str, ...] = (
    "Who is the manufacturer of the smd resistor?",
    "What is the impedance of the wifi antenna?",
    "What are the direct subclasses of PassiveComponent?",
    "What is the direct parent of ChipAntenna?",
    "What are all the descendants of Antenna?",
    "Is ChipAntenna a kind of RFComponent?",
    "What are the parts of IntegratedCircuit?",
    "What is related to Capacitor?",
    "What are the siblings of smd resistor?",
    "Find concepts containing 'antenna'.",
    "How many concepts are there?",
    "How many relationships are there?",
    "Which concepts need review?",
    "Which concepts are leaves?",
    "What are the top 5 most connected concepts?",
    "How many hops connect Resistor and Antenna?",
)


def qa_nl_eval(
    spark: SparkSession, questions: tuple[str, ...] = BATTERY
) -> DataFrame:
    """Run an NL battery and emit the multi-DB-evaluator-style summary
    (question, intent, status, n_rows) — the same successful /
    empty_result classification A18 uses (multi_db_evaluator.py:128-144).

    Each compiled query is vocabulary-bounded, so the driver-side loop
    is over O(battery) tiny jobs, not corpus-scale data.
    """
    out = []
    for qtext in questions:
        intent, sql = compile_question(qtext)
        n = spark.sql(
            f"SELECT COUNT(*) AS n FROM ({sql})"
        ).collect()[0][0]
        out.append(
            (qtext, intent, "successful" if n > 0 else "empty_result", int(n))
        )
    return (
        spark.createDataFrame(
            out, "question string, intent string, status string, n_rows bigint"
        )
        .orderBy("question")
    )


def qa_nl_eval_sql(questions: tuple[str, ...] = BATTERY) -> str:
    """The DuckDB-executable twin of qa_nl_eval: the identical compiled
    SQL per question, assembled into one UNION ALL summary. Callers
    wrap it in a WITH clause defining ont_nodes/ont_edges/ont_props."""
    parts = []
    for qtext in questions:
        intent, sql = compile_question(qtext)
        lit = qtext.replace("'", "''")
        parts.append(
            f"SELECT '{lit}' AS question, '{intent}' AS intent, "
            f"(SELECT COUNT(*) FROM ({sql})) AS n_rows"
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        "SELECT question, intent, "
        "CASE WHEN n_rows > 0 THEN 'successful' ELSE 'empty_result' END AS status, "
        f"CAST(n_rows AS BIGINT) AS n_rows FROM ({body}) ORDER BY question"
    )
