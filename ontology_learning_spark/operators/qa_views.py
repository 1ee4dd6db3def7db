"""The reference QA query corpus (Q1-Q29) as named Spark SQL views,
plus the multi-DB evaluator (A18) that runs the corpus and emits the
reference's success/resultful-rate table.

Reference parity (behavior studied, no code copied):
- query corpus        src/evaluation/QA_queries.md:1-309 (Cypher)
- evaluator summary   src/evaluation/multi_db_evaluator.py:128-144
  (successful / empty_result / errors; success_rate = (ok+empty)/total,
  resultful_rate = ok/total, both percent)

Each Cypher query is re-expressed over two relational views —
``ont_nodes(name, source, needs_review, ...)`` and
``ont_edges(src, rel_type, dst, ...)`` — with Spark 4 recursive CTEs
for the transitive patterns (`*1..`). The same SQL (modulo array
syntax) runs on DuckDB; __spark_entry__ registers the corpus-count
query with a DuckDB oracle built from ``qa_corpus_sql('duckdb')``.

Q17's Cypher uses an unbounded undirected path (a)-[*]-(b) between two
category closures; the view bounds the connection to a single edge
(the unbounded variant is quadratic-explosive and the reference's own
explanation describes direct cross-domain links).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dialect(d: str) -> dict[str, str]:
    if d == "spark":
        return {
            "arr": "array",            # array('x')
            "append": "concat({p}, array({x}))",
            "contains": "array_contains({p}, {x})",
            "len": "size",
        }
    return {
        "arr": "list_value",           # list_value('x')
        "append": "list_append({p}, {x})",
        "contains": "list_contains({p}, {x})",
        "len": "len",
    }


def qa_corpus_sql(dialect: str = "spark") -> dict[str, str]:
    """name → SQL text over ont_nodes / ont_edges."""
    D = _dialect(dialect)
    append = D["append"]
    contains = D["contains"]

    sub = "SELECT src, dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF'"

    def desc_cte(root: str) -> str:
        """descendants(name) of root via SUBCLASS_OF (src→dst edges point child→parent)."""
        return f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        d(name) AS (
          SELECT src FROM sub WHERE dst = '{root}'
          UNION ALL
          SELECT s.src FROM sub s JOIN d ON s.dst = d.name
        )"""

    q: dict[str, str] = {}
    q["qa_q01_point_lookup"] = (
        "SELECT name, source, uri FROM ont_nodes WHERE name = 'FPCAntenna'"
    )
    q["qa_q02_substring"] = (
        "SELECT name FROM ont_nodes WHERE name LIKE '%Antenna%' ORDER BY name"
    )
    q["qa_q03_direct_subclasses"] = (
        "SELECT src AS name FROM ont_edges "
        "WHERE rel_type = 'SUBCLASS_OF' AND dst = 'PassiveComponent' ORDER BY name"
    )
    q["qa_q04_descendants"] = desc_cte("Antenna") + " SELECT DISTINCT name FROM d ORDER BY name"
    q["qa_q05_partof"] = (
        "SELECT src AS name FROM ont_edges "
        "WHERE rel_type = 'PARTOF' AND dst = 'IntegratedCircuit' ORDER BY name"
    )
    q["qa_q06_multi_attribute"] = f"""
        {desc_cte('RFComponent')}
        SELECT DISTINCT d.name FROM d
        JOIN ont_edges r ON r.src = d.name AND r.rel_type = 'RELATEDTO'
                        AND r.dst = 'Electromechanical'
        ORDER BY d.name
    """
    q["qa_q07_learned_only"] = (
        "SELECT name FROM ont_nodes WHERE source = 'learned_from_dataset' ORDER BY name"
    )
    q["qa_q08_top_families"] = (
        "SELECT src AS name FROM ont_edges "
        "WHERE rel_type = 'SUBCLASS_OF' AND dst = 'ElectronicComponent' ORDER BY name"
    )
    q["qa_q09_rel_types"] = (
        "SELECT DISTINCT rel_type AS relationship_type FROM ont_edges "
        "WHERE rel_type <> 'SUBCLASS_OF' ORDER BY relationship_type"
    )
    q["qa_q10_needs_review"] = (
        "SELECT name FROM ont_nodes WHERE needs_review ORDER BY name"
    )
    q["qa_q11_leaves_under"] = f"""
        {desc_cte('Capacitor')}
        SELECT DISTINCT name FROM d
        WHERE name NOT IN (SELECT dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF')
        ORDER BY name
    """
    q["qa_q12_top_hubs"] = f"""
        WITH ends AS (SELECT src AS name FROM ont_edges UNION ALL SELECT dst FROM ont_edges)
        SELECT name, CAST(COUNT(*) AS BIGINT) AS degree
        FROM ends GROUP BY name ORDER BY degree DESC, name ASC LIMIT 10
    """
    q["qa_q13_taxonomic_path"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        p(name, path) AS (
          SELECT CAST('FPCAntenna' AS STRING), {D['arr']}('FPCAntenna')
          UNION ALL
          SELECT s.dst, {append.format(p='p.path', x='s.dst')}
          FROM sub s JOIN p ON s.src = p.name
        )
        SELECT path AS hierarchy FROM p WHERE name = 'Thing'
    """ if dialect == "spark" else f"""
        WITH RECURSIVE p(name, path) AS (
          SELECT 'FPCAntenna', {D['arr']}('FPCAntenna')
          UNION ALL
          SELECT s.dst, {append.format(p='p.path', x='s.dst')}
          FROM (SELECT src, dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF') s
          JOIN p ON s.src = p.name
        )
        SELECT path AS hierarchy FROM p WHERE name = 'Thing'
    """
    q["qa_q14_siblings"] = """
        SELECT DISTINCT s.src AS name
        FROM ont_edges me
        JOIN ont_edges s ON s.rel_type = 'SUBCLASS_OF' AND s.dst = me.dst
        WHERE me.rel_type = 'SUBCLASS_OF' AND me.src = 'ChipAntenna' AND s.src <> 'ChipAntenna'
        ORDER BY name
    """
    q["qa_q15_outgoing_nontax"] = (
        "SELECT rel_type AS relation, dst AS target FROM ont_edges "
        "WHERE src = 'cable assembly' AND rel_type <> 'SUBCLASS_OF' ORDER BY relation, target"
    )
    # Level-synchronous BFS, statically unrolled to the 7-hop cap: each
    # level is min-aggregated per node, so every intermediate relation
    # is bounded by |V| rows — the earlier all-simple-paths recursive
    # walk was exponential in dense neighborhoods (a 50-node near-
    # clique enumerates ~50! prefixes; BFS touches 50x7 rows).
    # Unrolled rather than WITH RECURSIVE because the level-wise dedup
    # needs set semantics and Spark 4 recursive CTEs only allow UNION
    # ALL; the same SQL text runs on both engines.
    _bfs_levels = []
    for k in range(1, 8):
        _bfs_levels.append(
            f"h{k}(node, hops) AS (\n"
            f"          SELECT node, MIN(hops) AS hops FROM (\n"
            f"            SELECT node, hops FROM h{k - 1}\n"
            f"            UNION ALL\n"
            f"            SELECT u.dst, h{k - 1}.hops + 1 FROM und u"
            f" JOIN h{k - 1} ON u.src = h{k - 1}.node\n"
            f"          ) lvl GROUP BY node\n"
            f"        )"
        )
    _bfs_joined = ",\n        ".join(_bfs_levels)
    q["qa_q16_shortest_path"] = f"""
        WITH und(src, dst) AS (
          SELECT src, dst FROM ont_edges UNION SELECT dst, src FROM ont_edges
        ),
        h0(node, hops) AS (
          SELECT CAST('Resistor' AS {'STRING' if dialect == 'spark' else 'VARCHAR'}), 0
        ),
        {_bfs_joined}
        SELECT 'Resistor' AS a, 'Antenna' AS b, CAST(MIN(hops) AS INT) AS hops
        FROM h7 WHERE node = 'Antenna'
    """
    q["qa_q17_bridges"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        act(name) AS (
          SELECT src FROM sub WHERE dst = 'ActiveComponent'
          UNION ALL SELECT s.src FROM sub s JOIN act a ON s.dst = a.name
        ),
        rf(name) AS (
          SELECT src FROM sub WHERE dst = 'RFComponent'
          UNION ALL SELECT s.src FROM sub s JOIN rf r ON s.dst = r.name
        ),
        und(src, dst) AS (
          SELECT src, dst FROM ont_edges UNION ALL SELECT dst, src FROM ont_edges
        )
        SELECT DISTINCT a.name AS active_related, b.name AS rf_related
        FROM act a JOIN und e ON e.src = a.name JOIN rf b ON e.dst = b.name
        ORDER BY active_related, rf_related
    """
    q["qa_q18_direct_parent"] = (
        "SELECT dst AS name FROM ont_edges "
        "WHERE rel_type = 'SUBCLASS_OF' AND src = 'ChipAntenna'"
    )
    q["qa_q19_all_rels"] = f"""
        WITH und(src, dst, rel_type) AS (
          SELECT src, dst, rel_type FROM ont_edges
          UNION ALL SELECT dst, src, rel_type FROM ont_edges
        )
        SELECT 'Capacitor' AS name, rel_type, dst AS other
        FROM und WHERE src = 'Capacitor' ORDER BY rel_type, other
    """
    q["qa_q20_family_counts"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        fam(family) AS (SELECT src FROM sub WHERE dst = 'ElectronicComponent'),
        d(family, name) AS (
          SELECT f.family, s.src FROM fam f JOIN sub s ON s.dst = f.family
          UNION ALL
          SELECT d.family, s.src FROM sub s JOIN d ON s.dst = d.name
        )
        SELECT family, CAST(COUNT(DISTINCT name) AS BIGINT) AS specific_concept_count
        FROM d WHERE name NOT IN (SELECT dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF')
        GROUP BY family ORDER BY specific_concept_count DESC, family ASC
    """
    q["qa_q21_tax_split"] = """
        SELECT CASE WHEN rel_type = 'SUBCLASS_OF' THEN 'Taxonomic' ELSE 'Non-Taxonomic' END
                 AS relation_category,
               CAST(COUNT(*) AS BIGINT) AS count
        FROM ont_edges GROUP BY 1 ORDER BY relation_category
    """
    q["qa_q22_underdescribed"] = """
        SELECT n.name FROM ont_nodes n
        WHERE n.source = 'learned_from_dataset'
          AND NOT EXISTS (
            SELECT 1 FROM ont_edges e
            WHERE e.rel_type <> 'SUBCLASS_OF' AND (e.src = n.name OR e.dst = n.name)
          )
        ORDER BY n.name
    """
    q["qa_q23_deepest"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        up(name, depth) AS (
          SELECT src, 1 FROM sub WHERE dst = 'Thing'
          UNION ALL
          SELECT s.src, up.depth + 1 FROM sub s JOIN up ON s.dst = up.name
        )
        SELECT name, CAST(MAX(depth) AS INT) AS depth FROM up
        WHERE name NOT IN (SELECT dst FROM ont_edges WHERE rel_type = 'SUBCLASS_OF')
        GROUP BY name ORDER BY depth DESC, name ASC LIMIT 10
    """
    q["qa_q24_orphans"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        up(name) AS (
          SELECT src FROM sub WHERE dst = 'Thing'
          UNION ALL
          SELECT s.src FROM sub s JOIN up ON s.dst = up.name
        )
        SELECT name FROM ont_nodes
        WHERE source = 'learned_from_dataset'
          AND name NOT IN (SELECT DISTINCT name FROM up)
        ORDER BY name
    """
    q["qa_q25_common_nontax"] = """
        SELECT rel_type AS relationship, CAST(COUNT(*) AS BIGINT) AS frequency
        FROM ont_edges WHERE rel_type <> 'SUBCLASS_OF'
        GROUP BY rel_type ORDER BY frequency DESC, relationship ASC LIMIT 10
    """
    q["qa_q26_review_hotspots"] = f"""
        WITH RECURSIVE sub(src, dst) AS ({sub}),
        fam(family) AS (SELECT src FROM sub WHERE dst = 'ElectronicComponent'),
        d(family, name) AS (
          SELECT f.family, s.src FROM fam f JOIN sub s ON s.dst = f.family
          UNION ALL
          SELECT d.family, s.src FROM sub s JOIN d ON s.dst = d.name
        )
        SELECT d.family, CAST(COUNT(DISTINCT d.name) AS BIGINT) AS review_count
        FROM d JOIN ont_nodes n ON n.name = d.name AND n.needs_review
        GROUP BY d.family ORDER BY review_count DESC, family ASC
    """
    q["qa_q27_child_parent"] = """
        SELECT e.src AS child, e.dst AS parent
        FROM ont_edges e JOIN ont_nodes n ON n.name = e.src
        WHERE e.rel_type = 'SUBCLASS_OF' AND n.source = 'learned_from_dataset'
        ORDER BY parent, child
    """
    q["qa_q28_redundant"] = """
        WITH und(src, dst, rel_type) AS (
          SELECT src, dst, rel_type FROM ont_edges
          UNION ALL SELECT dst, src, rel_type FROM ont_edges
        )
        SELECT DISTINCT a.src AS a, a.dst AS b
        FROM und a JOIN und r ON a.src = r.src AND a.dst = r.dst
        WHERE a.rel_type = 'SUBCLASS_OF' AND r.rel_type = 'RELATEDTO'
        ORDER BY a, b
    """
    q["qa_q29_rel_histogram"] = """
        SELECT rel_type AS relationship_type, CAST(COUNT(*) AS BIGINT) AS count
        FROM ont_edges GROUP BY rel_type ORDER BY count DESC, relationship_type ASC
    """
    return q


def create_qa_views(spark: SparkSession, nodes: DataFrame, edges: DataFrame) -> list[str]:
    """Register ont_nodes/ont_edges plus all 29 corpus views as temp
    views — the user surface replacing the reference's NL→Cypher layer
    (the NL half is LLM territory; the query corpus itself is SQL)."""
    nodes.createOrReplaceTempView("ont_nodes")
    edges.createOrReplaceTempView("ont_edges")
    names = []
    for name, sql in qa_corpus_sql("spark").items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
        names.append(name)
    return names


def evaluate_query_corpus(spark: SparkSession, view_names: list[str] | None = None) -> DataFrame:
    """A18: run every corpus view, classify successful / empty_result /
    error per query (reference multi_db_evaluator semantics)."""
    names = view_names or list(qa_corpus_sql("spark"))
    rows = []
    for name in names:
        try:
            n = spark.table(name).count()
            status = "successful" if n > 0 else "empty_result"
        except Exception:
            n, status = 0, "error"
        rows.append((name, status, n))
    return spark.createDataFrame(rows, "query string, status string, n_rows bigint")


def corpus_summary(per_query: DataFrame) -> DataFrame:
    """success_rate / resultful_rate percentages, reference shape."""
    from pyspark.sql import functions as F

    return per_query.agg(
        F.count("*").alias("total_queries"),
        F.sum((F.col("status") == "successful").cast("int")).alias("successful"),
        F.sum((F.col("status") == "empty_result").cast("int")).alias("empty_result"),
        F.sum((F.col("status") == "error").cast("int")).alias("errors"),
        F.round(100.0 * F.sum((F.col("status") != "error").cast("int")) / F.count("*"), 4)
        .alias("success_rate"),
        F.round(100.0 * F.sum((F.col("status") == "successful").cast("int")) / F.count("*"), 4)
        .alias("resultful_rate"),
    )
