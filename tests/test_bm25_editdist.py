"""BM25 ranked retrieval (stages/bm25.py) and edit-distance pair
verification (stages/editdist.py): hand-checked scores vs the closed-form
BM25 formula, explicit-query vs data-derived-query paths, Levenshtein DP
vs a quadratic reference (property sweep + the DuckDB byte convention),
and the pair-join plumbing end-to-end."""

import math

import numpy as np
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.editdist import (
    levenshtein_bytes,
)


def _bm25_ref(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_explicit_query_scores(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.bm25 import (
        bm25_topk,
    )

    rows = [{"doc_id": 1, "text": "apple apple banana"},
            {"doc_id": 2, "text": "apple cherry cherry cherry"},
            {"doc_id": 3, "text": "banana cherry"},
            {"doc_id": 4, "text": "date elder fig grape"}]
    out = bm25_topk(rd.from_items(rows).repartition(3), k=10,
                    query_terms=["apple", "banana"]).to_pandas()
    n, avgdl = 4.0, (3 + 4 + 2 + 4) / 4.0
    want = {
        1: _bm25_ref(2, 2, n, 3, avgdl) + _bm25_ref(1, 2, n, 3, avgdl),
        2: _bm25_ref(1, 2, n, 4, avgdl),
        3: _bm25_ref(1, 2, n, 2, avgdl),
    }
    got = dict(zip(out["doc_id"], out["bm25"]))
    assert set(got) == set(want)            # doc 4 has no query term
    for d, w in want.items():
        assert abs(got[d] - round(w, 4)) < 1e-9, d
    # ranking: doc 1 (two matching terms) first
    assert out["doc_id"].iloc[0] == 1
    assert list(out["bm25"]) == sorted(out["bm25"], reverse=True)


def test_bm25_derived_query_is_top_cf_terms(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.bm25 import (
        bm25_topk,
    )

    # 'z' dominates collection frequency; with n_query_terms=1 only docs
    # containing 'z' can score.
    rows = [{"doc_id": 1, "text": "z z z z"},
            {"doc_id": 2, "text": "z q"},
            {"doc_id": 3, "text": "q r"}]
    out = bm25_topk(rd.from_items(rows), k=10,
                    n_query_terms=1).to_pandas()
    assert set(out["doc_id"]) == {1, 2}


def test_levenshtein_matches_reference_dp():
    def ref(a: bytes, b: bytes) -> int:
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                              m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return m[len(a)][len(b)]

    rng = np.random.default_rng(11)
    for _ in range(200):
        a = bytes(rng.integers(97, 101, rng.integers(0, 15)).tolist())
        b = bytes(rng.integers(97, 101, rng.integers(0, 15)).tolist())
        assert levenshtein_bytes(a, b) == ref(a, b), (a, b)


def test_levenshtein_byte_convention_matches_duckdb():
    import duckdb

    pairs = [("kitten", "sitting"), ("中文测", "中文别"), ("", "abc"),
             ("café", "cafe"), ("αβγ", "αβδ")]
    for x, y in pairs:
        want = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[x, y]).fetchone()[0]
        assert levenshtein_bytes(x.encode(), y.encode()) == want, (x, y)


def test_edit_distance_pairs_join(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.editdist import (
        edit_distance_pairs,
    )

    docs = rd.from_items([
        {"doc_id": 1, "text": "the quick brown fox"},
        {"doc_id": 2, "text": "the quick brown fix"},
        {"doc_id": 3, "text": "completely different words"},
    ]).repartition(2)
    pairs = rd.from_items([{"a": 1, "b": 2, "jaccard": 0.6},
                           {"a": 1, "b": 3, "jaccard": 0.5}])
    out = edit_distance_pairs(pairs, docs, prefix_chars=64).to_pandas()
    got = {(r.a, r.b): r.lev for r in out.itertuples()}
    assert got[(1, 2)] == 1                  # fox -> fix
    assert got[(1, 3)] == levenshtein_bytes(
        b"the quick brown fox", b"completely different words")
    assert sorted(out.columns) == ["a", "b", "jaccard", "lev"]


def test_edit_distance_prefix_truncation(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.editdist import (
        edit_distance_pairs,
    )

    # identical 8-char prefixes, wildly different tails: prefix_chars=8
    # must report 0.
    docs = rd.from_items([
        {"doc_id": 1, "text": "same8pre" + "x" * 50},
        {"doc_id": 2, "text": "same8pre" + "y" * 90},
    ])
    pairs = rd.from_items([{"a": 1, "b": 2, "jaccard": 0.9}])
    out = edit_distance_pairs(pairs, docs, prefix_chars=8).to_pandas()
    assert out["lev"].tolist() == [0]
