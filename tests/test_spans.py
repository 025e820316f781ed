"""Exact duplicate-substring span detection (stages/spans.py) vs a
brute-force single-process oracle, plus the fallback/stride/edge paths."""

import numpy as np
import pytest


def brute_spans(docs: dict[int, str], window: int, stride: int = 1):
    """Reference implementation: literal substrings, set counting, interval
    union — O(n^2)-ish, fine at test scale."""
    from collections import Counter

    wins = []
    for doc_id, text in docs.items():
        for pos in range(0, max(len(text) - window + 1, 0), 1):
            if pos % stride == 0:
                wins.append((doc_id, pos, text[pos:pos + window]))
    counts = Counter(w for _, _, w in wins)
    marked = [(d, p) for d, p, w in wins if counts[w] >= 2]
    spans = []
    for d in sorted({d for d, _ in marked}):
        positions = sorted(p for dd, p in marked if dd == d)
        start, end = positions[0], positions[0] + window
        for p in positions[1:]:
            if p > end:
                spans.append((d, start, end))
                start = p
            end = max(end, p + window)
        spans.append((d, start, end))
    return sorted(spans)


def _corpus():
    rng = np.random.RandomState(7)
    alpha = "abcdefghij"
    dup_a = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-AGAIN"
    dup_b = "zzzz-repeated-block-zzzz"
    docs = {}
    for i in range(40):
        body = "".join(rng.choice(list(alpha), size=200))
        if i % 5 == 0:
            body = body[:50] + dup_a + body[50:]
        if i % 7 == 0:
            body = body[:120] + dup_b + body[120:]
        docs[i] = body
    # intra-doc duplication: the same block twice inside ONE doc
    docs[100] = "XYXYXY" + dup_b + "qqqqqqqqqq" + dup_b + "ZZZZ"
    # short + empty docs must be ignored without error
    docs[101] = "tiny"
    docs[102] = ""
    return docs


def _run(docs, ray_session, monkeypatch=None, force_join=False, **kw):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages import spans

    if force_join:
        monkeypatch.setattr(spans, "MAX_BROADCAST_DUP_HASHES", 2)
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()]) \
           .repartition(6)
    result = spans.duplicate_spans(ds, **kw)
    assert [f for f in result.schema().names] == \
        ["doc_id", "span_start", "span_end"]   # schema survives even empty
    out = result.to_pandas()
    if len(out) == 0:                 # Ray quirk: empty to_pandas drops cols
        return []
    return sorted(map(tuple, out[["doc_id", "span_start",
                                  "span_end"]].itertuples(index=False)))


def test_duplicate_spans_matches_bruteforce(ray_session):
    docs = _corpus()
    got = _run(docs, ray_session, window=20)
    exp = brute_spans(docs, window=20)
    assert got == exp
    assert any(d == 100 for d, _, _ in exp)      # intra-doc dup detected
    assert len(exp) > 10                          # non-trivial corpus


def test_duplicate_spans_semi_join_fallback(ray_session, monkeypatch):
    """Over the broadcast budget the operator must switch to the semi-join
    path and produce IDENTICAL spans."""
    docs = _corpus()
    got = _run(docs, ray_session, monkeypatch, force_join=True, window=20)
    assert got == brute_spans(docs, window=20)


def test_duplicate_spans_adjacent_windows_merge(ray_session):
    """A duplicated region longer than the window collapses to ONE span
    covering it (stride-1 windows tile the region)."""
    blk = "0123456789" * 6                       # 60 chars, window 20
    docs = {1: "aaa" + blk + "bbb", 2: "cc" + blk + "dd"}
    got = _run(docs, ray_session, window=20)
    # every window inside blk duplicates across docs -> one span per doc
    # covering exactly blk  (the 10-char period also self-duplicates
    # WITHIN blk, but coverage is the same union)
    by_doc = {}
    for d, s, e in got:
        by_doc.setdefault(d, []).append((s, e))
    assert by_doc[1] == [(3, 3 + 60)]
    assert by_doc[2] == [(2, 2 + 60)]


def test_duplicate_spans_stride(ray_session):
    docs = _corpus()
    got = _run(docs, ray_session, window=20, stride=4)
    exp = brute_spans(docs, window=20, stride=4)
    assert got == exp


def test_duplicate_spans_no_dups_empty(ray_session):
    docs = {1: "abcdefghijklmnopqrstuvwxyz0123456789", 2: "ZYXWVUTSRQPON"}
    got = _run(docs, ray_session, window=30)
    assert got == []


def test_remove_duplicate_spans_matches_bruteforce(ray_session):
    """Cleaned text = out-of-span remainder, verified against the brute
    spans + literal Python splice per doc."""
    import hashlib

    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.spans import (
        remove_duplicate_spans,
    )

    docs = _corpus()
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()]) \
           .repartition(6)
    out = remove_duplicate_spans(ds, window=20).to_pandas() \
        .set_index("doc_id").sort_index()
    spans = brute_spans(docs, window=20)
    for did, text in docs.items():
        mine = [(s, e) for d, s, e in spans if d == did]
        prev, parts = 0, []
        for s, e in mine:
            parts.append(text[prev:s])
            prev = e
        parts.append(text[prev:])
        cleaned = "".join(parts)
        row = out.loc[did]
        assert row["n_spans"] == len(mine)
        assert row["n_chars_removed"] == len(text) - len(cleaned)
        assert row["cleaned_md5"] == \
            hashlib.md5(cleaned.encode()).hexdigest()
    assert len(out) == len(docs)      # every doc present, spans or not


def test_remove_duplicate_spans_overflow_raises(ray_session, monkeypatch):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages import spans

    monkeypatch.setattr(spans, "MAX_BROADCAST_DUP_HASHES", 1)
    docs = _corpus()
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
    with pytest.raises(ValueError, match="broadcast budget"):
        spans.remove_duplicate_spans(ds, window=20)
