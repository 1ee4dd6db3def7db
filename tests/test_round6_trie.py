"""Round-6 optimization pin: trie-structured vocabulary regexes.

``trie_pattern`` replaces the sorted-longest-first literal alternation
in the dictionary matcher and the relation mention slots (~5x scan
speed). These tests pin output equality — matches, capture texts AND
spans, i.e. backtracking order — against the alternation form it
replaced, on randomized vocabularies, adversarial glued texts, and the
real generator corpus. No Spark session needed.
"""

from __future__ import annotations

import random
import re

from ontology_learning_spark.fixtures import baseline
from ontology_learning_spark.fixtures.generator import generate_documents
from ontology_learning_spark.functions.extraction_rules import (
    _HASFEATURE_TEMPLATE,
    _VERB_ALTERNATION,
    PART_NUMBER_INNER,
    get_matcher,
    surface_variants,
    trie_pattern,
)


def _alternation_matcher_rx(vocab: set[str]) -> re.Pattern[str]:
    """The pre-round-6 DictionaryMatcher pattern (reference form)."""
    ordered = sorted(vocab, key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(re.escape(v) for v in ordered) + r")\b")


def _alternation_mention_pat(vocab: set[str]) -> str:
    ordered = sorted(vocab, key=len, reverse=True)
    alts = [re.escape(v) for v in ordered]
    alts.append(PART_NUMBER_INNER)
    return "(?:" + "|".join(alts) + ")"


def _trie_mention_pat(vocab: set[str]) -> str:
    return "(?:" + trie_pattern(vocab) + "|" + PART_NUMBER_INNER + ")"


def _catalog_vocab() -> set[str]:
    vocab: set[str] = set()
    for r in baseline.entity_catalog():
        vocab.update(surface_variants(r["name"].lower()))
    return vocab


def _generator_texts(n: int) -> list[str]:
    texts = []
    for r in generate_documents(n_docs=n, seed=42):
        spans = sorted(r["spans"], key=lambda s: s["offset"])
        texts.append(
            " ".join(s["text"] for s in spans if s["kind"] == "text" and s["text"]).lower()
        )
    return texts


def test_trie_equals_alternation_random_vocabs():
    rng = random.Random(0)
    for _ in range(120):
        n = rng.randint(1, 40)
        words = {
            "".join(rng.choice("abc d") for _ in range(rng.randint(1, 8))).strip()
            for _ in range(n)
        } - {""}
        if not words:
            continue
        old = _alternation_matcher_rx(words)
        new = re.compile(r"\b(" + trie_pattern(words) + r")\b")
        for _ in range(25):
            text = "".join(rng.choice("abc d") for _ in range(rng.randint(0, 120)))
            a = [(m.group(1), m.start(1)) for m in old.finditer(text)]
            b = [(m.group(1), m.start(1)) for m in new.finditer(text)]
            assert a == b, (sorted(words), text)


def test_trie_matcher_equals_alternation_on_generator_corpus():
    vocab = _catalog_vocab()
    old = _alternation_matcher_rx(vocab)
    matcher = get_matcher(tuple(sorted({r["name"].lower() for r in baseline.entity_catalog()})))
    assert matcher._rx is not None
    for text in _generator_texts(400):
        a = [(m.group(1), m.start(1)) for m in old.finditer(text)]
        b = [(m.group(1), m.start(1)) for m in matcher._rx.finditer(text)]
        assert a == b


def test_trie_relation_patterns_equal_alternation():
    vocab = _catalog_vocab()
    tmpl = "(?P<a>{M}) (?P<v>" + _VERB_ALTERNATION + ")(?P<b>{M})"
    old_c = re.compile(tmpl.replace("{M}", _alternation_mention_pat(vocab)))
    new_c = re.compile(tmpl.replace("{M}", _trie_mention_pat(vocab)))
    old_h = re.compile(_HASFEATURE_TEMPLATE.replace("{M}", _alternation_mention_pat(vocab)))
    new_h = re.compile(_HASFEATURE_TEMPLATE.replace("{M}", _trie_mention_pat(vocab)))

    for text in _generator_texts(400):
        a = [(m.group("a"), m.group("v"), m.group("b"), m.span()) for m in old_c.finditer(text)]
        b = [(m.group("a"), m.group("v"), m.group("b"), m.span()) for m in new_c.finditer(text)]
        assert a == b

    # adversarial glued texts: vocab fragments, part numbers, verb cues,
    # boundary-less concatenations (the relation slots have no \b)
    rng = random.Random(1)
    pieces = sorted(vocab) + [
        "lm317", "ad8232", "ne555x-7", "xsparky",
        " is a ", " contains the ", " conforms to ", " has a ",
        " feature", " ", "zz", "a",
    ]
    for _ in range(1500):
        text = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 14)))
        a = [(m.group("a"), m.group("v"), m.group("b"), m.span()) for m in old_c.finditer(text)]
        b = [(m.group("a"), m.group("v"), m.group("b"), m.span()) for m in new_c.finditer(text)]
        assert a == b, text
        ah = [(m.group("a"), m.group("b"), m.span()) for m in old_h.finditer(text)]
        bh = [(m.group("a"), m.group("b"), m.span()) for m in new_h.finditer(text)]
        assert ah == bh, text
