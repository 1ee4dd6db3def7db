"""Seeded synthetic interleaved-span corpus generator (FIXTURES.md §1,5).

Produces documents in exactly the input_hint shape:
    doc_id: string,
    spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>

Text spans are templated datasheet sentences embedding catalog surface
forms (Zipf-skewed with hot heads 'resistor'/'antenna'), plural/case
variants, markdown noise the preprocessor must strip, and a poison set
the validity filter must drop. ~20% media spans carried as typed leaf
nodes. Everything derives from the seed — no external data.
"""

from __future__ import annotations

import random

from ..functions import extraction_rules as X
from . import baseline

HOT_SURFACES = ["resistor", "antenna"]
POISON = ["note", "figure", "42", "ab", "www.example.com", "a/b", "inc"]

MANUFACTURERS = ["texas instruments", "analog devices", "murata", "johanson technology"]
PART_PREFIXES = ["lm", "ad", "ne", "tps", "max", "stm"]

# Templates reference {a}/{b} surface slots and {m} manufacturer; verb
# phrases line up with extraction_rules._RELATION_PATTERNS.
REL_TEMPLATES = [
    "the {a} is a {b} designed for high reliability",
    "{a} is manufactured by {m}",
    "{m} manufactures the {a}",
    "the {a} includes a {b}",
    "the {a} conforms to the rohs directive",
    "the {a} is connected to the {b} on the evaluation board",
    "the {a} operates in the ism band",
]

PLAIN_TEMPLATES = [
    "this datasheet describes the {a} in detail",
    "typical applications use a {a} together with a {b}",
    "see the {a} specification for electrical characteristics",
    "the recommended {a} operating temperature range is -40 to 85 c",
    "a {a} and a {b} are mounted on the demo pcb",
    # spec sentences feed E9 property extraction / the M4 matcher band
    "the {a} has an impedance of 50 ohms and covers 2.4-5.8 ghz",
    "the {a} is rated 3.3 v and uses surface mount packaging",
    "typical {a} specs: 900 mhz, 75 ohms, sma connector",
]

NOISE_WRAPPERS = [
    ("**{s}**", 0.15),             # bold
    ("[{s}](https://example.org/ds)", 0.10),  # link
    ("# {s}", 0.05),               # heading
]

BOILERPLATE_LINES = [
    "Submit Document Feedback",
    "IMPORTANT NOTICE AND DISCLAIMER",
    "www.ti.com",
    "Copyright © 2024 Texas Instruments Incorporated",
]


def _maybe_noise(rng: random.Random, s: str) -> str:
    for wrapper, p in NOISE_WRAPPERS:
        if rng.random() < p:
            return wrapper.format(s=s)
    return s


def _pick_surface(rng: random.Random, surfaces: list[str]) -> str:
    # Zipf-ish: hot heads get ~30% of the mass.
    if rng.random() < 0.30:
        s = rng.choice(HOT_SURFACES)
    else:
        idx = min(int(rng.paretovariate(1.2)) - 1, len(surfaces) - 1)
        s = surfaces[idx]
    # plural / case variants to exercise normalization
    r = rng.random()
    if r < 0.20:
        s = X.surface_variants(s)[-1]  # plural form
    elif r < 0.30:
        s = s.title()
    return s


# Realize a gold-standard relation as a sentence whose verb phrase the
# extraction rules recognize — plants recoverable gold triples so the
# A11 evaluation measures real recall, not just oracle parity.
_GOLD_REL_TEMPLATES = {
    "subclass_of": "the {s} is a {t}",
    "instance_of": "the {s} is a {t}",   # part-number subjects flip to instance_of
    "manufacturer": "{s} is manufactured by {t}",
    "hasPart": "the {s} includes a {t}",
    "conformsTo": "the {s} conforms to the {t}",
}


def _gold_sentence(rng: random.Random) -> str | None:
    from . import baseline

    rels = baseline.gold_relations()
    r = rels[rng.randrange(len(rels))]
    tmpl = _GOLD_REL_TEMPLATES.get(r["type"])
    if not tmpl:
        return None
    return tmpl.format(s=r["source"].lower(), t=r["target"].lower())


def _sentence(rng: random.Random, surfaces: list[str]) -> str:
    a = _pick_surface(rng, surfaces)
    b = _pick_surface(rng, surfaces)
    if rng.random() < 0.25:
        gs = _gold_sentence(rng)
        if gs:
            return gs
    if rng.random() < 0.12:
        # part-number sentence → instance_of via pattern rules
        part = rng.choice(PART_PREFIXES) + str(rng.randint(100, 9999))
        a = part
    if rng.random() < 0.4:
        t = rng.choice(REL_TEMPLATES)
    else:
        t = rng.choice(PLAIN_TEMPLATES)
    sent = t.format(a=_maybe_noise(rng, a), b=_maybe_noise(rng, b), m=rng.choice(MANUFACTURERS))
    if rng.random() < 0.08:
        sent += " " + rng.choice(POISON)
    if rng.random() < 0.06:
        sent = rng.choice(BOILERPLATE_LINES) + " " + sent
    return sent


def generate_documents(n_docs: int = 200, seed: int = 42) -> list[dict]:
    """Rows of {doc_id, spans:[{kind,text,media_ref,offset}]}"""
    rng = random.Random(seed)
    surfaces = sorted({r["name"].lower() for r in baseline.entity_catalog()})
    docs = []
    for i in range(n_docs):
        doc_id = f"doc-{i:06d}"
        n_spans = rng.randint(3, 12)
        spans = []
        for off in range(n_spans):
            if rng.random() < 0.20:
                spans.append(
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": f"img://{doc_id}/{off}",
                        "offset": off,
                    }
                )
            else:
                n_sent = rng.randint(1, 3)
                text = " ".join(_sentence(rng, surfaces) for _ in range(n_sent))
                spans.append(
                    {"kind": "text", "text": text, "media_ref": None, "offset": off}
                )
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


def generate_alias_edges(seed: int = 42) -> list[dict]:
    """Surface-variant alias edges incl. chains (a→b→c) and a hub, for
    the connected-components canonicalizer (FIXTURES.md §5)."""
    rng = random.Random(seed + 1)
    rows: list[dict] = []
    canon = ["resistor", "capacitor", "antenna", "voltage regulator", "connector"]
    for c in canon:
        for v in (X.surface_variants(c)[-1], c.replace(" ", "-"), c + " (1)"):
            if v != c:  # hyphenation of a single-word name is a no-op
                rows.append({"surface": v, "alias_of": c})
    # chains: x2 -> x1 -> canonical
    rows.append({"surface": "smd resistor", "alias_of": "chip resistor"})
    rows.append({"surface": "chip resistor", "alias_of": "resistor"})
    rows.append({"surface": "thick film resistor", "alias_of": "chip resistor"})
    # hub: many variants onto 'antenna'
    for k in range(20):
        rows.append({"surface": f"antenna variant {k}", "alias_of": "antenna"})
    rng.shuffle(rows)
    return rows


DOCUMENT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
