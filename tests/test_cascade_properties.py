"""Property / fuzz tests for the rule cascade (SURVEY.md §5: the reference's
inline invariants, promoted to generated-input properties).

Invariants mirrored from the reference:
- predicates contain at most one ``·X·`` placeholder (dudepparse.py:522,589,668)
- stop-word filtering is idempotent
- the cascade never crashes on an arbitrary well-formed dependency tree
- every emitted index triple refers to real token positions
"""

import random as _random

from hypothesis import given, settings, strategies as st

from chinese_open_relation_extraction_for_entgraph_ray.functions.cascade import (
    filter_stopword_triples,
    process_sentence,
)
from chinese_open_relation_extraction_for_entgraph_ray.functions.lexicon import (
    POS_GAZETTEER,
    pos_map_for_words,
)

_VOCAB = sorted(POS_GAZETTEER) + ["的", "了", "在", "把", "被", "是", "。", "，"]
_DEPRELS = ["SBV", "VOB", "ATT", "ADV", "POB", "CMP", "COO", "MT", "VV",
            "DBL", "DOB", "F", "IC", "HED"]


@st.composite
def random_parse(draw):
    """A random well-formed dependency tree: node i's head is drawn from
    {0 (root, exactly once)} ∪ {1..i} so heads always point left -> acyclic."""
    n = draw(st.integers(min_value=1, max_value=10))
    rng = _random.Random(draw(st.integers(0, 2**32 - 1)))
    words = [rng.choice(_VOCAB) for _ in range(n)]
    root = rng.randrange(n)
    heads = []
    for i in range(n):
        if i == root:
            heads.append(0)
        elif i == 0:
            heads.append(root + 1)
        else:
            heads.append(rng.choice([j + 1 for j in range(i)] + [root + 1]))
    deprels = [("HED" if h == 0 else rng.choice(_DEPRELS)) for h in heads]
    return {"word": words, "head": heads, "deprel": deprels}


@given(random_parse())
@settings(max_examples=300, deadline=None)
def test_cascade_never_crashes_and_invariants_hold(ddp):
    streams = process_sentence(ddp, pos_map_for_words(ddp["word"]))
    n = len(ddp["word"])
    for kind, rels in streams.items():
        for (names, rtype, idxs) in rels:
            pred = names[1]
            if pred:
                assert pred.count("·X·") <= 1, (kind, names)
            for ix in idxs:
                assert ix is None or 0 <= ix < n, (kind, idxs)


@given(random_parse())
@settings(max_examples=150, deadline=None)
def test_stopword_filter_idempotent_on_cascade_output(ddp):
    streams = process_sentence(ddp, pos_map_for_words(ddp["word"]))
    for rels in streams.values():
        once = filter_stopword_triples(list(rels))
        twice = filter_stopword_triples(list(once))
        assert [tuple(r[0]) for r in once] == [tuple(r[0]) for r in twice]


@given(random_parse())
@settings(max_examples=100, deadline=None)
def test_cascade_deterministic(ddp):
    a = process_sentence(ddp, pos_map_for_words(ddp["word"]))
    b = process_sentence(ddp, pos_map_for_words(ddp["word"]))
    assert a == b
