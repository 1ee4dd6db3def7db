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
