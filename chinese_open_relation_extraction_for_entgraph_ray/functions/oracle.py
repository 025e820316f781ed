"""Single-process oracle: reference-rule extraction without Ray.

Recomputes, for a deterministic synthetic corpus (seed, num_convs), every
triple the pipeline should emit, by running the same pure rule functions
in-process in generation order.  The Ray pipeline must match it exactly
(P/R >= 0.95 gate; in practice 1.0) — this validates the distributed plumbing
(explode, ordering, schema round-trips, aggregation), while the golden tests
in tests/test_cascade_golden.py validate the rules themselves against the
reference's documented examples.
"""

from __future__ import annotations

from collections import Counter

from ..sources.synthetic import iter_turns
from ..stages.canonicalize import link_surface
from .cascade import process_sentence
from .grammar import parse_sentence
from .lexicon import pos_map_for_words
from .textnorm import split_text


def oracle_triples(seed: int, num_convs: int) -> list[dict]:
    """All expected triple rows (same fields as TRIPLES_SCHEMA, minus links)."""
    rows: list[dict] = []
    for spec in iter_turns(seed, num_convs):
        for si, sent in enumerate(split_text(spec.raw_text)):
            ddp = parse_sentence(sent)
            streams = process_sentence(ddp, pos_map_for_words(ddp["word"]))
            for kind, rels in streams.items():
                for rel in rels:
                    rows.append({
                        "conv_id": spec.conv_id, "turn_idx": spec.turn_idx,
                        "sent_idx": si, "rel_kind": kind,
                        "subj": rel[0][0], "pred": rel[0][1], "obj": rel[0][2],
                        "subj_idx": rel[2][0], "pred_idx": rel[2][1],
                        "obj_idx": rel[2][2],
                    })
    return rows


def _idx(v):
    """Normalize nullable ints across Arrow/pandas round-trips (5.0/nan -> 5/None)."""
    if v is None:
        return None
    try:
        if v != v:   # NaN
            return None
    except TypeError:
        pass
    return int(v)


def triple_key(row: dict) -> tuple:
    return (row["conv_id"], int(row["turn_idx"]), int(row["sent_idx"]),
            row["rel_kind"], row["subj"] or None, row["pred"], row["obj"] or None,
            _idx(row["subj_idx"]), _idx(row["pred_idx"]), _idx(row["obj_idx"]))


def oracle_edges(seed: int, num_convs: int,
                 rel_kinds=("fine", "amend_fine")) -> dict[tuple, int]:
    """Expected canonical (subj, pred, obj) -> weight for the edge table."""
    weights: Counter = Counter()
    for row in oracle_triples(seed, num_convs):
        if row["rel_kind"] not in rel_kinds:
            continue
        key = (row["subj"] or "", row["pred"], row["obj"] or "",
               link_surface(row["subj"]) or "", link_surface(row["obj"]) or "")
        weights[key] += 1
    return dict(weights)


def precision_recall(expected_keys: set, got_keys: set) -> tuple[float, float]:
    if not got_keys or not expected_keys:
        return (0.0, 0.0)
    tp = len(expected_keys & got_keys)
    return tp / len(got_keys), tp / len(expected_keys)
