"""DSIR importance resampling (stages/dsir.py): bucket-hash parity with
the DuckDB oracle, weight arithmetic vs a brute-force single-process
reference, and selection determinism."""

import math

import numpy as np
import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.dsir import (
    NUM_BUCKETS,
    _buckets_of,
    dsir_log_ratio,
    dsir_select,
    dsir_weights,
)

DOCS = [
    # (doc_id, text, lang) — zh is the target slice
    (1, "把 他 桌子 拿走", "zh"),
    (2, "table scan fast value", "en"),
    (3, "把 value 拿走 fast", "zh"),
    (4, "scan scan scan scan", "en"),
    (5, "", "en"),                       # token-less: no weight row
    (6, "把 把 把", "zh"),
]


def _docs_table():
    ids, txt, lang = zip(*DOCS)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(txt, pa.string()),
         pa.array(lang, pa.string())],
        names=["doc_id", "text", "lang"])


def _brute_force_weights():
    """Single-process reference: same math, pure Python."""
    tok_rows = [(d, t.split(), g) for d, t, g in DOCS]
    c_tgt = np.zeros(NUM_BUCKETS)
    c_raw = np.zeros(NUM_BUCKETS)
    for _, toks, lang in tok_rows:
        for t in toks:
            b = _buckets_of(np.array([t], dtype=object))[0]
            c_raw[b] += 1
            if lang == "zh":
                c_tgt[b] += 1
    n_t, n_r = c_tgt.sum(), c_raw.sum()
    lr = (np.log((c_tgt + 1) / (n_t + NUM_BUCKETS))
          - np.log((c_raw + 1) / (n_r + NUM_BUCKETS)))
    out = {}
    for d, toks, _ in tok_rows:
        if toks:
            out[d] = sum(lr[_buckets_of(np.array([t], dtype=object))[0]]
                         for t in toks)
    return out


def test_bucket_hash_matches_duckdb():
    import duckdb

    toks = np.array(["把", "table", "scan", "窗口", "a", "value", "x y"],
                    dtype=object)
    got = _buckets_of(toks)
    exp = [r[0] for r in duckdb.connect().execute(
        "SELECT ('0x' || substr(md5(t),1,4))::INT % 1024 "
        "FROM (SELECT unnest(?) AS t)", [list(toks)]).fetchall()]
    assert list(got) == exp


def test_weights_match_brute_force(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(_docs_table())
    lr = dsir_log_ratio(docs, target_col="lang", target_value="zh")
    got = dsir_weights(docs, lr).to_pandas().set_index("doc_id")
    exp = _brute_force_weights()
    assert set(got.index) == set(exp)          # doc 5 absent (no tokens)
    for d, w in exp.items():
        assert got.loc[d, "dsir_weight"] == pytest.approx(w, abs=5e-5)
    # the all-target-token doc must outrank the all-raw-token doc
    assert got.loc[6, "dsir_weight"] > got.loc[4, "dsir_weight"]
    assert got.loc[1, "n_tokens"] == 4


def test_select_is_deterministic_topk(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(_docs_table())
    lr = dsir_log_ratio(docs, target_col="lang", target_value="zh")
    w = dsir_weights(docs, lr)
    top2 = dsir_select(w, k=2).to_pandas()
    full = w.to_pandas().sort_values(
        ["dsir_weight", "doc_id"], ascending=[False, True])
    assert list(top2["doc_id"]) == list(full["doc_id"][:2])
    # weights are rounded half-away to 4 digits (the ranking contract)
    assert all(abs(v * 10_000 - round(v * 10_000)) < 1e-6
               for v in top2["dsir_weight"])


def test_smoothing_floor_is_finite():
    # every bucket unseen: lr must still be finite (add-one smoothing)
    lr = (math.log(1.0 / NUM_BUCKETS) - math.log(1.0 / NUM_BUCKETS))
    assert lr == 0.0
