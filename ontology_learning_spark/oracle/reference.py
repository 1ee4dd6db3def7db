"""Pure-Python oracle: reference pipeline semantics end-to-end.

Executes the deterministic rule set of ``functions.semantics`` /
``functions.extraction_rules`` imperatively over fixture documents —
the way the reference runs (eager, row-at-a-time) — and emits the
expected mention/decision/triple sets the Spark plan must reproduce at
P/R >= 0.95 (exact match expected, since both share the rules).

Flow mirrored (reference file:line):
  preprocess (data_loader.py:13-47) → extract (idea_extractor.py:63-124,
  relation_extractor.py:19-95) → validity filter (idea_extractor.py:49-61)
  → distinct → link M2/M3/M5 (ontology_extension_manager.py:225-366)
  → dedup M6 (:489-499) → decide M7 (:368-421) → route M11
  (integrated_schema_pipeline.py:182-216) → triples.
"""

from __future__ import annotations

from collections import defaultdict

from ..functions import extraction_rules as X
from ..functions import semantics as S
from ..fixtures import baseline


def doc_text(doc: dict) -> str:
    """Concatenate text spans in offset order (media spans contribute
    nothing to text but must survive untouched)."""
    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    return " ".join(s["text"] for s in spans if s["kind"] == "text" and s["text"])


def run(
    docs: list[dict],
    catalog: list[dict] | None = None,
    thresholds: dict | None = None,
) -> dict:
    catalog = catalog if catalog is not None else baseline.entity_catalog()
    th = thresholds or S.DEFAULT_THRESHOLDS
    surfaces = tuple(sorted({c["name"].lower() for c in catalog}))

    # --- extraction ---
    mentions_rows: list[dict] = []  # (doc_id, surface, norm_surface, char_offset)
    triple_rows: list[tuple[str, str, str]] = []
    clean_texts: dict[str, str] = {}
    for doc in docs:
        text = S.preprocess_text(doc_text(doc))
        clean_texts[doc["doc_id"]] = text
        mentions, relations = X.extract_document(text, surfaces)
        for m in mentions:
            if S.is_valid_concept(m.surface):
                mentions_rows.append(
                    {
                        "doc_id": doc["doc_id"],
                        "surface": m.surface,
                        "norm_surface": S.normalize_name(m.surface),
                        "char_offset": m.char_offset,
                    }
                )
        for (a, p, b) in relations:
            if S.is_valid_concept(a) and S.is_valid_concept(b):
                na, nb = S.normalize_name(a), S.normalize_name(b)
                if na != nb:  # plural variants can collapse to self-loops
                    triple_rows.append((na, p, nb))

    distinct_concepts = sorted({m["norm_surface"] for m in mentions_rows})

    # E7/E9: per-concept context (first 3 docs by doc_id, capped) → props
    concept_docs: dict[str, set[str]] = defaultdict(set)
    for m in mentions_rows:
        concept_docs[m["norm_surface"]].add(m["doc_id"])
    concept_props: dict[str, dict] = {}
    for concept, dids in concept_docs.items():
        ctx = " ".join(clean_texts[d] for d in sorted(dids)[: S.CONTEXT_CHUNKS])[: S.CONTEXT_CAP]
        concept_props[concept] = S.extract_props(ctx)

    # --- linking ---
    cat_by_name = {c["name"]: c for c in catalog}
    cat_norm = {c["name"]: S.normalize_name(c["name"]) for c in catalog}
    cat_emb = {
        c["name"]: S.hashed_embedding(S.concept_text(c)) for c in catalog
    }
    cat_blocks: dict[str, set[str]] = defaultdict(set)
    for c in catalog:
        for k in S.block_keys(cat_norm[c["name"]]):
            cat_blocks[k].add(c["name"])

    decisions: dict[str, dict] = {}
    for concept in distinct_concepts:
        category = S.infer_category(concept)
        # M2: embedding cosine vs every catalog entry (catalog is small →
        # broadcast cross in Spark)
        new_emb = S.hashed_embedding(
            S.concept_text({"name": concept, "category": category})
        )
        best: dict[str, tuple[float, str]] = {}  # cand -> (score, type)

        def _offer(cand: str, score: float, mtype: str):
            if cand not in best or score > best[cand][0]:
                best[cand] = (score, mtype)

        for cname, cemb in cat_emb.items():
            sim = S.cosine(new_emb, cemb)
            if sim >= th["low_similarity"]:
                _offer(cname, sim, "embedding")

        # M3: lexical exact on normalized names, else blocked fuzzy >= 0.8
        blocked = set()
        for k in S.block_keys(concept):
            blocked |= cat_blocks.get(k, set())
        for cname in cat_by_name:
            if concept == cat_norm[cname]:
                _offer(cname, 1.0, "lexical_exact_normalized")
        for cname in blocked:
            if concept == cat_norm[cname]:
                continue
            r = S.seq_ratio(concept, cat_norm[cname])
            if r >= 0.8:
                _offer(cname, r, "lexical_similar_normalized")

        # M4: technical-spec matches (props from context vs catalog specs)
        props = concept_props.get(concept, {})
        if sum(1 for p in props.values() if p) >= 2:
            for cname, c in cat_by_name.items():
                sim = S.technical_similarity(props, c)
                if sim is not None:
                    _offer(cname, sim, "technical_specs")

        # M5: category variant (same category, ratio >= 0.4) over blocked pairs
        for cname in blocked:
            c = cat_by_name[cname]
            if (c.get("category") or "").lower() == category.lower():
                r = S.seq_ratio(concept, cname.lower())
                if r >= 0.4:
                    _offer(cname, r, "category_variant")

        # M6 dedup is inherent (best-per-candidate); rank and take top-10
        ranked = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
        if ranked:
            best_name, (best_score, best_type) = ranked[0]
            best_cat = cat_by_name[best_name].get("category")
        else:
            best_name, best_score, best_type, best_cat = None, None, None, None

        decision, target, confidence = S.decide(
            best_score, concept, category, best_name, best_cat, th
        )
        decisions[concept] = {
            "concept": concept,
            "decision": decision,
            "target": target,
            "confidence": confidence,
            "best_score": best_score,
            "best_match": best_name,
            "parent": S.route_parent(decision, target, best_name),
        }

    # --- routed taxonomy triples + extracted relation triples ---
    triples: set[tuple[str, str, str]] = set()
    for d in decisions.values():
        if d["parent"]:
            triples.add((d["concept"], "subclass_of", S.normalize_name(d["parent"])))
    for t in triple_rows:
        triples.add(t)

    # --- M13 canonicalization over MAP_* alias edges (union-find) ---
    alias_pairs = [
        (d["concept"], S.normalize_name(d["target"]))
        for d in decisions.values()
        if d["decision"].startswith("MAP") and d["target"]
        and d["concept"] != S.normalize_name(d["target"])
    ]
    canon = canonicalize_aliases(alias_pairs)
    triples = {
        (canon.get(s, s), p, canon.get(o, o))
        for (s, p, o) in triples
        if canon.get(s, s) != canon.get(o, o)
    }

    return {
        "mentions": mentions_rows,
        "concepts": distinct_concepts,
        "decisions": decisions,
        "triples": triples,
    }


def canonicalize_aliases(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over (surface, alias_of) pairs → {node: canonical}.
    Canonical = min sink (alias target never seen as surface) in the
    component, else min node — same contract as
    operators.canonicalize.canonical_mapping."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    pairs = [(s, t) for s, t in pairs if s != t]  # self-aliases carry no information
    surfaces = {s for s, _ in pairs}
    targets = {t for _, t in pairs}
    for s, t in pairs:
        union(s, t)

    comps: dict[str, list[str]] = {}
    for node in set(parent):
        comps.setdefault(find(node), []).append(node)

    out: dict[str, str] = {}
    sinks = targets - surfaces
    for members in comps.values():
        cands = sorted(m for m in members if m in sinks)
        rep = cands[0] if cands else min(members)
        for m in members:
            if m != rep:
                out[m] = rep
    return out


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float, float]:
    tp = len(got & expected)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1
