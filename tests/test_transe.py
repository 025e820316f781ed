"""Distributed TransE (stages/transe.py): loss decreases, embeddings are
bit-identical across block structures (the fixed-point partition-
invariance contract), and the corrupt-tail negatives match the
negative-sampling stage's rank-shift scheme."""

import numpy as np
import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.transe import (
    transe_embedding_table,
    transe_train,
)

TRIPLES = [
    ("北京大学", "校长·是", "郝平"),
    ("他们", "成为", "力量"),
    ("力量", "建设", "家乡"),
    ("李四", "被控·试图·杀死", "张三"),
    ("张三", "为·X·贡献", "家乡"),
    ("郝平", "成为", "校长"),
    ("北京大学", "位于", "北京"),
    ("家乡", "位于", "北京"),
]


def _ds(repart=None):
    import ray.data as rd

    s, p, o = zip(*TRIPLES)
    ds = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(s), pa.array(p), pa.array(o)],
        names=["subj", "pred", "obj"]))
    return ds.repartition(repart) if repart else ds


def test_loss_decreases(ray_session):
    *_, losses = transe_train(_ds(), dim=8, epochs=6, lr=0.5)
    assert len(losses) == 6
    assert losses[-1] < losses[0]
    # margin loss is non-negative throughout
    assert all(l >= 0 for l in losses)


def test_partition_invariant_bit_exact(ray_session):
    e1, ee1, p1, pe1, l1 = transe_train(_ds(repart=1), dim=8, epochs=3)
    e2, ee2, p2, pe2, l2 = transe_train(_ds(repart=5), dim=8, epochs=3)
    assert list(e1) == list(e2) and list(p1) == list(p2)
    # int64 fixed-point gradient exchange -> BIT-identical results
    assert (ee1 == ee2).all() and (pe1 == pe2).all()
    assert l1 == l2


def test_entity_rows_stay_unit_norm(ray_session):
    _, ee, _, _, _ = transe_train(_ds(), dim=8, epochs=2, lr=0.5)
    assert np.allclose(np.linalg.norm(ee, axis=1), 1.0, atol=1e-9)


def test_embedding_table_shape(ray_session):
    tbl = transe_embedding_table(_ds(), dim=4, epochs=2).to_pandas()
    ents = {t for tr in TRIPLES for t in (tr[0], tr[2])}
    preds = {tr[1] for tr in TRIPLES}
    assert len(tbl) == len(ents) + len(preds)
    assert set(tbl.columns) == {"kind", "name", "embedding", "final_loss"}
    assert (tbl[tbl.kind == "entity"].name.sort_values().tolist()
            == sorted(ents))
    assert all(len(v) == 4 for v in tbl.embedding)
    assert tbl.final_loss.nunique() == 1


def test_training_moves_linked_entities_closer(ray_session):
    """h + r should approach t for a trained triple relative to init."""
    ents, ee0, preds, pe0, _ = transe_train(_ds(), dim=8, epochs=0)
    ents, ee, preds, pe, _ = transe_train(_ds(), dim=8, epochs=8, lr=0.5)

    def dist(ev, eev, pv, pev, s, p, o):
        h = eev[list(ev).index(s)]
        r = pev[list(pv).index(p)]
        t = eev[list(ev).index(o)]
        return float(((h + r - t) ** 2).sum())

    before = dist(ents, ee0, preds, pe0, "北京大学", "位于", "北京")
    after = dist(ents, ee, preds, pe, "北京大学", "位于", "北京")
    assert after < before


def test_link_prediction_eval(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.transe import (
        link_prediction_eval,
    )

    ents, ee, preds, pe, _ = transe_train(_ds(), dim=8, epochs=8, lr=0.5)
    out1 = link_prediction_eval(_ds(repart=1), ents, ee, preds, pe) \
        .to_pandas()
    out5 = link_prediction_eval(_ds(repart=5), ents, ee, preds, pe) \
        .to_pandas()
    assert out1.equals(out5)                  # fixed-point partition parity
    row = out1.iloc[0]
    assert row.n_triples == len(TRIPLES)
    assert 0.0 < row.mrr <= 1.0
    assert 0.0 <= row.hits_at_1 <= row.hits_at_10 <= 1.0
    # training must beat the untrained init on its own triples
    e0, ee0, p0, pe0, _ = transe_train(_ds(), dim=8, epochs=0)
    base = link_prediction_eval(_ds(), e0, ee0, p0, pe0).to_pandas()
    assert row.mrr > base.iloc[0].mrr
