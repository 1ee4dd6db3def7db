"""Baseline ontology hierarchy and entity catalog fixtures.

The 22-edge class hierarchy mirrors the reference's Neo4j baseline
(src/initialize_baseline.py:12-45); the gold concept/relation data is
vendored at data/gold_standard.json. Together they form the
`entity_catalog` the linker joins against (FIXTURES.md §2-4).
"""

from __future__ import annotations

import json
from pathlib import Path

from ..functions import semantics as S

REPO_ROOT = Path(__file__).resolve().parents[2]
GOLD_PATH = REPO_ROOT / "data" / "gold_standard.json"

# (child, parent) — rooted at Thing.
ONTOLOGY_HIERARCHY: list[tuple[str, str]] = [
    ("Product", "Thing"),
    ("Organization", "Thing"),
    ("ElectronicComponent", "Product"),
    ("PassiveComponent", "ElectronicComponent"),
    ("ActiveComponent", "ElectronicComponent"),
    ("RFComponent", "ElectronicComponent"),
    ("Interconnect", "ElectronicComponent"),
    ("Electromechanical", "ElectronicComponent"),
    ("Sensor", "ElectronicComponent"),
    ("Resistor", "PassiveComponent"),
    ("Capacitor", "PassiveComponent"),
    ("Inductor", "PassiveComponent"),
    ("Diode", "ActiveComponent"),
    ("Transistor", "ActiveComponent"),
    ("IntegratedCircuit", "ActiveComponent"),
    ("Antenna", "RFComponent"),
    ("FPCAntenna", "Antenna"),
    ("ChipAntenna", "Antenna"),
    ("Connector", "Interconnect"),
    ("Cable", "Interconnect"),
]

BASELINE_CLASSES: list[str] = ["Thing"] + sorted(
    {c for c, _ in ONTOLOGY_HIERARCHY} | {p for _, p in ONTOLOGY_HIERARCHY} - {"Thing"}
)


def load_gold() -> dict:
    return json.loads(GOLD_PATH.read_text())


def gold_concepts() -> list[str]:
    return load_gold()["concepts"]


def gold_relations() -> list[dict]:
    return load_gold()["relations"]


# Deterministic tech specs for a handful of catalog entries so the
# technical matcher (M4) has signal; keyed by normalized name.
_TECH_SPECS: dict[str, dict[str, str]] = {
    "antenna": {"frequency": "2.4-5.8 GHz", "impedance": "50 ohms", "connector": "SMA", "mounting": "surface mount"},
    "chip antenna": {"frequency": "2.4-2.5 GHz", "impedance": "50 ohms", "mounting": "smd"},
    "fpc antenna": {"frequency": "2.4-5.8 GHz", "impedance": "50 ohms", "connector": "mmcx"},
    "coaxial cable": {"impedance": "50 ohms", "connector": "sma"},
    "voltage regulator": {"voltage": "3.3 V", "mounting": "smd"},
    "resistor": {"mounting": "surface mount", "voltage": "50 V"},
    "capacitor": {"voltage": "16 V", "mounting": "smd"},
    "rf filter": {"frequency": "900 MHz", "impedance": "50 ohms"},
}


def entity_catalog() -> list[dict]:
    """Baseline classes + gold concepts as the linkable catalog.

    Columns per FIXTURES.md §2: name, norm_name, category, description,
    frequency, impedance, voltage, connector, mounting, source.
    """
    rows: list[dict] = []
    seen: set[str] = set()

    for name in BASELINE_CLASSES:
        norm = S.normalize_name(name)
        rows.append(
            {
                "name": name,
                "norm_name": norm,
                "category": "Ontology Class",
                "description": f"The ontological class representing {name}.",
                "source": "Baseline",
                **{k: None for k in ("frequency", "impedance", "voltage", "connector", "mounting")},
            }
        )
        seen.add(name)

    for name in gold_concepts():
        if name in seen:
            continue
        seen.add(name)
        norm = S.normalize_name(name)
        specs = _TECH_SPECS.get(norm, {})
        rows.append(
            {
                "name": name,
                "norm_name": norm,
                "category": S.infer_category(name),
                "description": f"{name}: a concept from the electronics gold standard.",
                "frequency": specs.get("frequency"),
                "impedance": specs.get("impedance"),
                "voltage": specs.get("voltage"),
                "connector": specs.get("connector"),
                "mounting": specs.get("mounting"),
                "source": "learned_from_dataset",
            }
        )
    return rows


CATALOG_COLUMNS = [
    "name", "norm_name", "category", "description",
    "frequency", "impedance", "voltage", "connector", "mounting", "source",
]
