"""S11/S13/A21: report + JSON-LD export and run-manifest lookups."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import ManifestLog


def export_jsonld(schema_objects: DataFrame, path: str) -> None:
    """S11: JSON-lines export of the @graph objects (json_ld column
    produced by enrich.schema_objects)."""
    schema_objects.select("json_ld").write.mode("overwrite").text(path)


def export_report(stats_row: dict, decisions_agg: dict, path: str) -> None:
    """S11: run-level integration report as a single JSON document."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps({**stats_row, **decisions_agg}, indent=1))


def latest_run(manifest_root: str) -> str | None:
    """A21: most recent committed run_id (max-by-ts over the commit
    log — replaces the reference's glob+ctime scan)."""
    entries = ManifestLog(manifest_root).entries()
    if not entries:
        return None
    return max(entries, key=lambda e: e["ts"])["run_id"]


def disjointness_violations(edges: DataFrame, disjoint_pairs: list[tuple[str, str]]) -> DataFrame:
    """A17 (deterministic stand-in for the OWL reasoner): nodes that are
    (transitive) subclasses of two disjoint families."""
    from . import graph_ops as G

    spark = edges.sparkSession
    frames = []
    for fam_a, fam_b in disjoint_pairs:
        da = G.descendants(edges, fam_a).select("name").withColumn("fam_a", F.lit(fam_a))
        db = G.descendants(edges, fam_b).select("name").withColumn("fam_b", F.lit(fam_b))
        frames.append(da.join(db, "name"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def subclass_cycles(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """A17 second axiom class: SUBCLASS_OF cycles (a taxonomy must be a
    DAG; any cycle makes every member class unsatisfiable under the
    reasoner).

    Exact membership — node ON a cycle ⟺ node ∈ Reach(node) — in two
    phases:

    1. **trim**: iteratively drop sinks (no outgoing edge within the
       remaining set), then sources. This removes the DAG bulk cheaply
       but OVER-approximates cycle membership: a node on a path
       connecting two distinct cycles (A→B→A, B→M, M→C, C→D→C) has
       in- and out-degree ≥ 1 and survives the peel without lying on
       any cycle.
    2. **exact closure on the surviving core**: the trimmed remainder
       is the anomalous cycle-connected region — tiny by construction
       in a taxonomy, where cycles are data bugs — so an iterative
       (src, dst) transitive-closure join is safe there; cycle nodes
       are exactly those with a (n, n) reachability pair.
    """
    e = (
        edges.where(F.col("rel_type") == "SUBCLASS_OF")
        .select("src", "dst").distinct().localCheckpoint()
    )
    # Convergence checks track the edge count in Python: one count()
    # action per peel round (the previous round's count is remembered),
    # not a pruned-vs-current pair of jobs per round.
    n_edges = e.count()
    for out_col, in_col in (("src", "dst"), ("dst", "src")):
        for _ in range(max_iter):
            nodes_out = e.select(F.col(out_col).alias("n")).distinct()
            nodes_in = e.select(F.col(in_col).alias("n")).distinct()
            # keep only edges whose `in_col` endpoint still has an
            # outgoing/incoming edge (i.e. drop edges into peeled nodes)
            survivors = nodes_in.join(nodes_out, "n", "left_semi")
            pruned = e.join(
                survivors.withColumnRenamed("n", in_col), in_col, "left_semi"
            ).localCheckpoint()
            n_pruned = pruned.count()
            if n_pruned == n_edges:
                break
            e, n_edges = pruned, n_pruned
    # explicit column order: the trim's semi-join moves the join key
    # first, and a positional union against (src, dst)-ordered rows
    # would silently symmetrize the edge set (flagging every weakly-
    # connected node); unionByName guards the same trap.
    e = e.select("src", "dst")
    reach = e.localCheckpoint()
    n_reach = reach.count()
    for _ in range(max_iter):
        nxt = (
            reach.alias("r")
            .join(e.alias("g"), F.col("r.dst") == F.col("g.src"))
            .select(F.col("r.src").alias("src"), F.col("g.dst").alias("dst"))
        )
        new_reach = reach.unionByName(nxt).distinct().localCheckpoint()
        n_new = new_reach.count()
        if n_new == n_reach:
            break
        reach, n_reach = new_reach, n_new
    return (
        reach.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("name"))
        .distinct()
    )


#: Non-taxonomic predicates whose endpoints must both be declared
#: classes and must not bridge two disjoint families (the deterministic
#: stand-in for OWL property domain/range + disjointness axioms).
DOMAIN_RANGE_PREDICATES = ("PARTOF", "RELATEDTO", "HASPROPERTY", "CONNECTEDTO")


def domain_range_violations(
    nodes: DataFrame,
    edges: DataFrame,
    disjoint_pairs: list[tuple[str, str]],
    predicates: tuple[str, ...] = DOMAIN_RANGE_PREDICATES,
) -> DataFrame:
    """A17 third axiom class: property domain/range checks for the
    non-taxonomic predicates (ref src/evaluation/consistency.py:13-108
    runs HermiT over the full OWL schema; this covers its
    domain/range + disjointness consequences deterministically).

    Two rules per edge with ``rel_type`` ∈ ``predicates``:
    - **dangling_endpoint**: both endpoints must exist in ``nodes``
      (every OWL property here has domain = range = the class
      hierarchy; an undeclared endpoint is unsatisfiable);
    - **disjoint_family_bridge**: PARTOF-style edges whose endpoints
      belong to two declared-disjoint families imply an individual in
      both families under the reasoner's property restrictions.
    """
    from . import graph_ops as G

    rel = edges.where(F.col("rel_type").isin(*predicates))
    known = nodes.select(F.col("name").alias("n")).distinct()

    dangling = (
        rel.join(known.withColumnRenamed("n", "src"), "src", "left_anti")
        .select(F.col("src").alias("subject"), "rel_type")
        .unionByName(
            rel.join(known.withColumnRenamed("n", "dst"), "dst", "left_anti")
            .select(F.col("dst").alias("subject"), "rel_type")
        )
        .distinct()
        .select(
            F.lit("dangling_endpoint").alias("issue_type"),
            "subject",
            F.concat(F.lit("undeclared endpoint of "), F.col("rel_type")).alias("detail"),
        )
    )

    fam_frames = []
    # disjointness is symmetric: check both edge orientations
    oriented = [(a, b) for a, b in disjoint_pairs] + [(b, a) for a, b in disjoint_pairs]
    for fam_a, fam_b in oriented:
        da = G.descendants(edges, fam_a).select(F.col("name").alias("src"))
        db = G.descendants(edges, fam_b).select(F.col("name").alias("dst"))
        bridge = (
            rel.join(da, "src", "left_semi").join(db, "dst", "left_semi")
            .select(
                F.lit("disjoint_family_bridge").alias("issue_type"),
                F.col("src").alias("subject"),
                F.concat_ws(
                    " ", F.col("rel_type"),
                    F.lit("into disjoint family:"),
                    F.lit(fam_a), F.lit("vs"), F.lit(fam_b),
                    F.lit("via"), F.col("dst"),
                ).alias("detail"),
            )
        )
        fam_frames.append(bridge)
    out = dangling
    for f in fam_frames:
        out = out.unionByName(f)
    return out.distinct()


def consistency_report(edges: DataFrame, disjoint_pairs: list[tuple[str, str]],
                       nodes: DataFrame | None = None) -> DataFrame:
    """A17 combined report (issue_type, subject, detail) — the
    deterministic analogue of the reference HermiT run
    (src/evaluation/consistency.py:13-108): empty = CONSISTENT.
    Covers three axiom classes: class disjointness, SUBCLASS_OF
    acyclicity, and property domain/range (the latter only when a
    ``nodes`` table is supplied)."""
    dv = disjointness_violations(edges, disjoint_pairs).select(
        F.lit("disjoint_class_violation").alias("issue_type"),
        F.col("name").alias("subject"),
        F.concat_ws(" & ", "fam_a", "fam_b").alias("detail"),
    )
    cy = subclass_cycles(edges).select(
        F.lit("subclass_cycle").alias("issue_type"),
        F.col("name").alias("subject"),
        F.lit("member of a SUBCLASS_OF cycle").alias("detail"),
    )
    out = dv.unionByName(cy)
    if nodes is not None:
        out = out.unionByName(domain_range_violations(nodes, edges, disjoint_pairs))
    return out
