"""Bigram PMI (stages/collocation.py): adjacency/alignment edge cases
(empty docs, single-token docs, cross-doc boundaries) and hand-checked
PMI values vs the closed form."""

import math

import pyarrow as pa

from chinese_open_relation_extraction_for_entgraph_ray.stages.collocation import (
    _bigram_rows,
    bigram_pmi,
)


def test_bigram_rows_alignment():
    batch = pa.table({"doc_id": [1, 2, 3, 4, 5],
                      "text": ["a b c", "", None, "x", "b c"]})
    out = _bigram_rows(batch, "doc_id", "text").to_pylist()
    got = sorted((r["w1"], r["w2"]) for r in out)
    # no cross-doc bigram (c from doc 1 never pairs with x from doc 4)
    assert got == [("a", "b"), ("b", "c"), ("b", "c")]


def test_bigram_rows_empty_batch():
    batch = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert _bigram_rows(batch, "doc_id", "text").num_rows == 0


def test_bigram_pmi_values(ray_session):
    import ray.data as rd

    # "a b" x3, "a c" x1; unigrams: a=4, b=3, c=1 -> T=8, B=4
    rows = [{"doc_id": 1, "text": "a b"},
            {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": "a b"},
            {"doc_id": 4, "text": "a c"}]
    out = bigram_pmi(rd.from_items(rows).repartition(2),
                     min_count=3).to_pandas()
    assert len(out) == 1                  # "a c" pruned by min_count
    r = out.iloc[0]
    assert (r["w1"], r["w2"], r["n"]) == ("a", "b", 3)
    want = math.log((3 / 4) / ((4 / 8) * (3 / 8)))
    assert abs(r["pmi"] - round(want, 4)) < 1e-9
