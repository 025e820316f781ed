"""Sequence packing (stages/packing.py): greedy first-fit-in-order per
group, bin-search packer vs a plain sequential reference, layout
independence, and the longer-than-capacity edge case."""

import numpy as np
import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.packing import (
    _pack_group,
    pack_sequences,
)


def _reference_pack(tokens, capacity):
    """The definitional sequential greedy rule."""
    bins, offs = [], []
    b, fill = 0, 0
    for n in tokens:
        if fill > 0 and fill + n > capacity:
            b += 1
            fill = 0
        offs.append(fill)
        bins.append(b)
        fill += n
    return bins, offs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_group_matches_sequential_reference(seed):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, 600, size=500).astype(np.int64)
    got_b, got_o = _pack_group(tokens, 1024)
    exp_b, exp_o = _reference_pack(tokens.tolist(), 1024)
    assert got_b.tolist() == exp_b
    assert got_o.tolist() == exp_o


def test_pack_group_oversize_doc_gets_own_bin():
    tokens = np.array([100, 5000, 100, 100], dtype=np.int64)
    b, o = _pack_group(tokens, 1024)
    assert b.tolist() == [0, 1, 2, 2]
    assert o.tolist() == [0, 0, 0, 100]


def test_pack_group_zero_token_docs_ride_along():
    tokens = np.array([0, 0, 1000, 0, 100], dtype=np.int64)
    b, o = _pack_group(tokens, 1024)
    assert (b.tolist(), o.tolist()) == \
        tuple(map(list, zip(*[(0, 0), (0, 0), (0, 0), (0, 1000), (1, 0)])))
    assert _reference_pack(tokens.tolist(), 1024) == \
        (b.tolist(), o.tolist())


def test_pack_sequences_distributed(ray_session):
    import ray.data as rd

    rows = []
    for g in ("en", "zh", "de"):
        for i in range(40):
            rows.append({"doc_id": i, "lang": g,
                         "text": " ".join(["tok"] * ((i * 7) % 90 + 1))})
    ds = rd.from_items(rows).repartition(5)
    out = pack_sequences(ds, capacity=128).to_pandas()
    assert len(out) == 120
    for g in ("en", "zh", "de"):
        grp = out[out["lang"] == g].sort_values("doc_id")
        toks = [(i * 7) % 90 + 1 for i in range(40)]
        assert grp["n_tokens"].tolist() == toks
        exp_b, exp_o = _reference_pack(toks, 128)
        assert grp["pack_bin"].tolist() == exp_b
        assert grp["bin_offset"].tolist() == exp_o
    # every bin respects capacity unless it is a single oversize doc
    per_bin = out.groupby(["lang", "pack_bin"])["n_tokens"].agg(["sum", "count"])
    over = per_bin[per_bin["sum"] > 128]
    assert (over["count"] == 1).all()


def test_pack_sequences_layout_independent(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "lang": "en",
             "text": " ".join(["w"] * ((i * 13) % 50 + 1))}
            for i in range(100)]
    a = pack_sequences(rd.from_items(rows).repartition(2),
                       capacity=64).to_pandas().sort_values(
                           "doc_id", ignore_index=True)
    b = pack_sequences(rd.from_items(rows[::-1]).repartition(9),
                       capacity=64).to_pandas().sort_values(
                           "doc_id", ignore_index=True)
    assert a.equals(b)
