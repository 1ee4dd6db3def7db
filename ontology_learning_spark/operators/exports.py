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
    reasoner). Kahn-style double peel as a DataFrame loop: iteratively
    drop sinks (no outgoing edge within the remaining set), then
    iteratively drop sources — whatever survives both peels lies ON a
    cycle. Each round is one small anti-join; lineage cut per round."""
    e = (
        edges.where(F.col("rel_type") == "SUBCLASS_OF")
        .select("src", "dst").distinct().localCheckpoint()
    )
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
            if pruned.count() == e.count():
                break
            e = pruned
    return (
        e.select(F.col("src").alias("name"))
        .union(e.select(F.col("dst").alias("name")))
        .distinct()
    )


def consistency_report(edges: DataFrame, disjoint_pairs: list[tuple[str, str]]) -> DataFrame:
    """A17 combined report (issue_type, subject, detail) — the
    deterministic analogue of the reference HermiT run
    (src/evaluation/consistency.py:13-108): empty = CONSISTENT."""
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
    return dv.unionByName(cy)
