"""Ontology snapshots: create / list / restore (SURVEY S13).

Reference parity: src/ontology_management_backend.py:387-507. The
reference serializes stats + graph data to a JSON file and its
restore path is SIMULATED (a sleep + success message, :489-497); here
both directions are real — a snapshot is the nodes/edges tables
written to a named parquet location plus a manifest commit, and
restore reads them back as DataFrames. In production the same
contract is one Iceberg snapshot id per table and restore is
`VERSION AS OF` time travel; this parquet layout is the sandbox
stand-in with identical semantics (see sources/tables.py docstring).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import ManifestLog

BASELINE_NAME = "schema_org_baseline"


def create_snapshot(
    spark: SparkSession,
    root: str | Path,
    name: str,
    nodes: DataFrame,
    edges: DataFrame,
    description: str | None = None,
) -> dict:
    """Write nodes/edges under <root>/snapshots/<name>/ and commit a
    manifest row. Returns the reference-shaped summary dict."""
    base = Path(root) / "snapshots" / name
    t0 = time.time()
    nodes.write.mode("overwrite").parquet(str(base / "nodes"))
    edges.write.mode("overwrite").parquet(str(base / "edges"))
    n_nodes = spark.read.parquet(str(base / "nodes")).count()
    n_edges = spark.read.parquet(str(base / "edges")).count()
    meta = {
        "name": name,
        "created": time.time(),
        "stats": {"nodes": n_nodes, "edges": n_edges},
        "metadata": {"type": "snapshot", "version": "1.0.0",
                     "description": description or f"snapshot {name}"},
    }
    (base / "meta.json").write_text(json.dumps(meta, indent=1))
    ManifestLog(root).commit(name, "snapshot", n_nodes + n_edges,
                             (time.time() - t0) * 1000)
    return {"success": True, "snapshot": meta}


def list_snapshots(root: str | Path) -> list[dict]:
    """Baseline pseudo-entry + committed snapshots, newest first."""
    out = [{
        "name": BASELINE_NAME,
        "type": "baseline",
        "is_baseline": True,
        "description": "Schema.org baseline ontology (fixtures.baseline)",
    }]
    snaps = Path(root) / "snapshots"
    if snaps.exists():
        for meta_path in sorted(snaps.glob("*/meta.json")):
            try:
                meta = json.loads(meta_path.read_text())
            except (OSError, json.JSONDecodeError):
                continue
            out.append({
                "name": meta["name"],
                "type": "snapshot",
                "created": meta.get("created"),
                "stats": meta.get("stats", {}),
                "is_baseline": False,
                "description": meta.get("metadata", {}).get("description", ""),
            })
    out[1:] = sorted(out[1:], key=lambda s: s.get("created") or 0, reverse=True)
    return out


def restore_snapshot(
    spark: SparkSession, root: str | Path, name: str
) -> tuple[DataFrame, DataFrame]:
    """Read a snapshot's graph tables back. ``schema_org_baseline``
    rebuilds the fixtures baseline (the reference's reset_to_baseline)."""
    if name == BASELINE_NAME:
        from ..fixtures import baseline
        from ..sources.tables import baseline_graph

        return baseline_graph(spark, baseline.ONTOLOGY_HIERARCHY)
    base = Path(root) / "snapshots" / name
    if not (base / "meta.json").exists():
        raise FileNotFoundError(f"snapshot '{name}' not found under {root}")
    return (
        spark.read.parquet(str(base / "nodes")),
        spark.read.parquet(str(base / "edges")),
    )
