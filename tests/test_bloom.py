"""Bloom-filter broadcast membership (stages/bloom.py) and the Bloom
decontamination path (decontaminate_bloom)."""

import numpy as np
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.bloom import (
    _positions,
    _set_bits,
    _test_bits,
    bloom_params,
)


def test_bloom_params_shape():
    m, k = bloom_params(10_000, 1e-4)
    assert m % 64 == 0
    assert m / 10_000 == pytest.approx(19.2, rel=0.05)   # ~19.17 bits/elem
    assert k in (13, 14)
    assert bloom_params(0, 1e-4) == (64, 1)


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.RandomState(11)
    members = rng.randint(-2**62, 2**62, size=20_000).astype(np.int64)
    m, k = bloom_params(len(members), 1e-3)
    bm = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(bm, _positions(members, m, k))
    # every inserted value tests positive (the Bloom guarantee)
    assert _test_bits(bm, _positions(members, m, k)).all()
    # FP rate on fresh values within ~4x of the target
    probes = rng.randint(-2**62, 2**62, size=100_000).astype(np.int64)
    probes = np.setdiff1d(probes, members)
    fp = _test_bits(bm, _positions(probes, m, k)).mean()
    assert fp < 4e-3, fp


def test_bloom_from_dataset_merges_blocks(ray_session):
    """The distributed OR-merge over many blocks admits exactly the same
    membership as a single-block build."""
    import ray
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.bloom import (
        bloom_from_dataset,
        bloom_semi_join,
    )

    rng = np.random.RandomState(5)
    members = rng.randint(0, 2**60, size=5_000).astype(np.int64)
    ds = rd.from_items([{"h": int(v)} for v in members]).repartition(9)
    ref, m, k = bloom_from_dataset(ds, "h", n_expected=5_000, fp_rate=1e-5)
    bm = ray.get(ref)
    assert _test_bits(bm, _positions(members, m, k)).all()
    # semi keeps every member row; anti drops every member row
    probe = rd.from_items(
        [{"h": int(v), "is_member": True} for v in members[:500]] +
        [{"h": int(v), "is_member": False}
         for v in rng.randint(2**61, 2**62, size=500).astype(np.int64)]) \
        .repartition(4)
    kept = bloom_semi_join(probe, "h", ref, m, k).to_pandas()
    assert kept["is_member"].sum() == 500          # all members kept
    dropped = bloom_semi_join(probe, "h", ref, m, k, anti=True).to_pandas()
    assert not dropped["is_member"].any()          # anti never keeps one


def test_decontaminate_bloom_subset_of_exact(ray_session):
    """Bloom decontamination keeps a SUBSET of the exact path's survivors
    (FPs only over-remove) and removes EVERY truly contaminated doc."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.decontaminate import (
        decontaminate,
        decontaminate_bloom,
    )

    rng = np.random.RandomState(23)
    vocab = [f"w{i}" for i in range(500)]
    eval_docs = [{"doc_id": i,
                  "text": " ".join(rng.choice(vocab, size=30))}
                 for i in range(20)]
    train, contaminated = [], set()
    for i in range(200):
        text = " ".join(rng.choice(vocab, size=40))
        if i % 10 == 3:     # plant a verbatim eval phrase
            src = eval_docs[i % 20]["text"].split()[:8]
            text = text + " " + " ".join(src)
            contaminated.add(1000 + i)
        train.append({"doc_id": 1000 + i, "text": text})
    eval_ds = rd.from_items(eval_docs).repartition(3)
    train_ds = rd.from_items(train).repartition(5)
    exact = set(decontaminate(train_ds, eval_ds)
                .to_pandas()["doc_id"])
    bloomed = set(decontaminate_bloom(train_ds, eval_ds, fp_rate=1e-4)
                  .to_pandas()["doc_id"])
    assert bloomed <= exact                       # FPs only over-remove
    assert not (bloomed & contaminated)           # no contaminated survivor
    assert len(bloomed) >= len(exact) - 3         # and barely over-removes
