"""TF-IDF top-terms (stages/tfidf.py): hand-checked scores, rounded-score
ranking determinism, and the distributed pipeline vs a local reference."""

import math

import numpy as np
import pyarrow as pa

from chinese_open_relation_extraction_for_entgraph_ray.stages.tfidf import (
    _term_freqs,
    tfidf_top_terms,
)


def test_term_freqs_in_batch():
    batch = pa.table({"doc_id": [1, 2, 3],
                      "text": ["a b a", "b c", None]})
    out = _term_freqs(batch, "doc_id", "text")
    got = {(r["doc_id"], r["term"]): r["tf"] for r in out.to_pylist()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1, (2, "c"): 1}


def test_tfidf_scores_and_ranks(ray_session):
    import ray.data as rd

    rows = [{"doc_id": 1, "text": "apple apple banana common"},
            {"doc_id": 2, "text": "banana cherry common"},
            {"doc_id": 3, "text": "cherry date common"},
            {"doc_id": 4, "text": "date elder common"}]
    out = tfidf_top_terms(rd.from_items(rows).repartition(3),
                          k=2).to_pandas()
    n = 4.0
    by = {(r.doc_id, r.term): r for r in out.itertuples()}
    # 'apple': tf=2, df=1 -> top of doc 1; 'common': df=4 -> idf 0
    a = by[(1, "apple")]
    assert a.rank == 1 and a.df == 1
    assert abs(a.tfidf - round(2 * math.log(n / 1), 4)) < 1e-9
    assert (1, "common") not in by          # idf 0 never beats k=2 cutoff
    # every doc emits exactly k=2 rows with ranks 1..2
    counts = out.groupby("doc_id")["rank"].agg(["count", "max"])
    assert (counts["count"] == 2).all() and (counts["max"] == 2).all()
    # rank ties on rounded score break by term ascending
    d2 = out[out.doc_id == 2].sort_values("rank")
    same = d2[d2.tfidf == d2.tfidf.iloc[0]]
    assert list(same.term) == sorted(same.term)
