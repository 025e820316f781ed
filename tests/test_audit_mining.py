"""Unit tests for stages/audit.py (data-quality audit) and
stages/similarity.hard_negative_mining (triplet mining).  SQL parity of
the full queries lives in the driver gate (lineitem_integrity_audit,
embeddings_hard_negatives); these pin stage semantics on hand-checkable
fixtures, including the layout-invariance of the two-stage reduces."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from chinese_open_relation_extraction_for_entgraph_ray.stages.audit import (
    duplicate_key_counts,
    integrity_audit,
    orphan_counts,
    predicate_counts,
)
from chinese_open_relation_extraction_for_entgraph_ray.stages.similarity import (
    hard_negative_mining,
)


def _audit_fixture():
    # 6 rows: one orphan key (99), one duplicated (1, 1) key, one
    # non-positive qty, one negative price, one null flag
    return rd.from_arrow(pa.table({
        "okey": pa.array([1, 1, 2, 3, 99, 4], pa.int64()),
        "lineno": pa.array([1, 1, 1, 2, 1, 1], pa.int32()),
        "qty": pa.array([5.0, 5.0, -2.0, 1.0, 3.0, 0.0], pa.float64()),
        "price": pa.array([10.0, 10.0, 4.0, -7.0, 1.0, 2.0],
                          pa.float64()),
        "flag": pa.array(["A", "A", None, "B", "C", "D"], pa.string()),
    }))


def _refs():
    return rd.from_arrow(pa.table({"okey_ref":
                                   pa.array([1, 2, 3, 4], pa.int64())}))


def _summary(ds):
    df = ds.to_pandas()
    return dict(zip(df["metric"], df["n"]))


def test_integrity_audit_counts(ray_session):
    ds = _audit_fixture()
    preds = predicate_counts(ds, {
        "total_rows": lambda b: np.ones(b.num_rows, dtype=bool),
        "nonpos_qty": lambda b: pc.less_equal(b.column("qty"), 0.0),
        "neg_price": lambda b: pc.less(b.column("price"), 0.0),
        "null_flag": lambda b: pc.is_null(b.column("flag")),
    })
    dups = duplicate_key_counts(ds, ["okey", "lineno"], metric="dup_keys")
    orph = orphan_counts(ds, _refs(), left_key="okey",
                         right_key="okey_ref", metric="orphan_rows")
    got = _summary(integrity_audit(
        [preds, dups, orph],
        ["total_rows", "nonpos_qty", "neg_price", "null_flag",
         "dup_keys", "orphan_rows"]))
    assert got == {"total_rows": 6, "nonpos_qty": 2, "neg_price": 1,
                   "null_flag": 1, "dup_keys": 1, "orphan_rows": 1}


def test_integrity_audit_zero_metrics_present(ray_session):
    # a clean table still yields every metric (seed rows), each 0 except
    # total_rows — absence of a row is never the signal
    clean = rd.from_arrow(pa.table({
        "okey": pa.array([1, 2], pa.int64()),
        "lineno": pa.array([1, 1], pa.int32()),
        "qty": pa.array([1.0, 2.0], pa.float64()),
    }))
    preds = predicate_counts(clean, {
        "total_rows": lambda b: np.ones(b.num_rows, dtype=bool),
        "nonpos_qty": lambda b: pc.less_equal(b.column("qty"), 0.0),
    })
    dups = duplicate_key_counts(clean, ["okey", "lineno"],
                                metric="dup_keys")
    orph = orphan_counts(clean, _refs(), left_key="okey",
                         right_key="okey_ref", metric="orphan_rows")
    got = _summary(integrity_audit(
        [preds, dups, orph],
        ["total_rows", "nonpos_qty", "dup_keys", "orphan_rows"]))
    assert got == {"total_rows": 2, "nonpos_qty": 0, "dup_keys": 0,
                   "orphan_rows": 0}


def _emb_ds(rows, blocks=1):
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[2] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in rows], pa.int32()),
    }))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_hard_negative_mining_hand_checked(ray_session):
    # anchor 0 (label 1) at +x; positives: (1) at +x (cos 1) and (2)
    # rotated 90deg (cos 0) -> hardest positive is 2; negatives: (3)
    # near +x (cos ~.8944) and (4) at -x (cos -1) -> hardest negative 3
    rows = [
        (0, 1, [1.0, 0.0]),
        (1, 1, [2.0, 0.0]),
        (2, 1, [0.0, 1.0]),
        (3, 2, [2.0, 1.0]),
        (4, 2, [-1.0, 0.0]),
    ]
    df = hard_negative_mining(_emb_ds(rows), anchor_mod=100).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r.anchor_id, r.anchor_label) == (0, 1)
    assert (r.hard_pos_id, r.hard_pos_sim) == (2, 0.0)
    assert r.hard_neg_id == 3
    assert abs(r.hard_neg_sim - 0.894427) < 1e-9
    assert abs(r.margin - (0.0 - 0.894427)) < 1e-9


def test_hard_negative_mining_tiebreak_and_layout(ray_session):
    # candidates 5 and 6 are identical vectors (same rounded cosine):
    # the LOWER cand_id must win, on any block layout
    rows = [
        (0, 1, [1.0, 0.0]),
        (5, 1, [0.0, 1.0]),
        (6, 1, [0.0, 2.0]),
        (7, 2, [1.0, 1.0]),
        (8, 2, [3.0, 3.0]),
    ]
    outs = []
    for blocks in (1, 4):
        df = hard_negative_mining(_emb_ds(rows, blocks),
                                  anchor_mod=100).to_pandas()
        outs.append(df.sort_values("anchor_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    r = outs[0].iloc[0]
    assert r.hard_pos_id == 5      # tie with 6 broken by id
    assert r.hard_neg_id == 7      # tie with 8 broken by id


def test_hard_negative_mining_requires_both_sides(ray_session):
    # anchor 100's label is unique -> no positive -> anchor omitted
    rows = [
        (0, 1, [1.0, 0.0]),
        (1, 1, [0.0, 1.0]),
        (2, 2, [1.0, 1.0]),
        (100, 3, [0.5, 0.5]),
    ]
    df = hard_negative_mining(_emb_ds(rows), anchor_mod=100).to_pandas()
    assert sorted(df["anchor_id"]) == [0]
