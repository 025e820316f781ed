"""Distributed Lloyd's k-means (stages/kmeans.py) pinned against a
single-process reference with identical init."""

import numpy as np
import pyarrow as pa

from chinese_open_relation_extraction_for_entgraph_ray.stages.kmeans import (
    kmeans_embeddings,
)
from chinese_open_relation_extraction_for_entgraph_ray.stages.similarity import (
    normalize,
    train_centroids,
)


def _reference_lloyds(emb, centroids, iters):
    emb = normalize(emb)
    for _ in range(iters):
        assign = (emb @ centroids.T).argmax(axis=1)
        new = centroids.copy()
        for c in range(len(centroids)):
            m = emb[assign == c]
            if len(m):
                new[c] = m.mean(axis=0)
        centroids = normalize(new)
    return centroids, (emb @ centroids.T).argmax(axis=1)


def test_kmeans_matches_single_process_reference(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    # 3 well-separated blobs of 60 vectors
    blobs = [rng.standard_normal(8) * 0.05 + center
             for center in (np.eye(8)[0] * 4, np.eye(8)[3] * 4,
                            -np.eye(8)[5] * 4)
             for _ in range(60)]
    emb = np.array([b + 0.05 * rng.standard_normal(8) for b in blobs])
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(emb)]
    ds = rd.from_items(rows).repartition(6)
    assigned, cents = kmeans_embeddings(ds, n_clusters=3, iters=3,
                                        train_sample=4096)
    got = assigned.to_pandas().sort_values("vec_id", ignore_index=True)

    # identical init: limit(train_sample) preserves row order here
    init = train_centroids(emb, nlist=3, iters=1)
    exp_cents, exp_assign = _reference_lloyds(emb, init, iters=3)
    assert np.allclose(cents, exp_cents, atol=1e-12)
    assert got["cluster"].tolist() == exp_assign.tolist()
    # blob members cluster together
    labels = got["cluster"].to_numpy()
    for s in (slice(0, 60), slice(60, 120), slice(120, 180)):
        assert len(set(labels[s])) == 1
    assert len(set(labels[::60])) == 3
    assert (got["cosine_to_centroid"] > 0.9).all()


def test_kmeans_explicit_init_matches_reference(ray_session):
    """init_ids path: pure function of (init_ids, iters, data) — identical
    to the single-process reference and invariant to partitioning (the
    SQL-oracle contract of embeddings_kmeans_explicit)."""
    import pytest
    import ray.data as rd

    rng = np.random.RandomState(11)
    emb = rng.standard_normal((90, 8))
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(emb)]
    init_ids = [i * 90 // 4 for i in range(4)]

    outs = []
    for parts in (3, 11):
        ds = rd.from_items(rows).repartition(parts)
        assigned, cents = kmeans_embeddings(
            ds, n_clusters=4, iters=3, init_ids=init_ids)
        outs.append((assigned.to_pandas()
                     .sort_values("vec_id", ignore_index=True), cents))

    init = normalize(emb[init_ids].astype(np.float64))
    exp_cents, exp_assign = _reference_lloyds(emb, init, iters=3)
    for got, cents in outs:
        assert np.allclose(cents, exp_cents, atol=1e-12)
        assert got["cluster"].tolist() == exp_assign.tolist()
    # the OUTPUT (6-dp-rounded assignments) is partition-invariant bit for
    # bit — that is the oracle contract; raw centroid floats may differ in
    # the last ulp with block merge order (covered by allclose above)
    assert outs[0][0].equals(outs[1][0])

    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="distinct"):
        kmeans_embeddings(ds, n_clusters=2, iters=1, init_ids=[0, 0])
    with pytest.raises(ValueError, match="entries for"):
        kmeans_embeddings(ds, n_clusters=3, iters=1, init_ids=[0, 1])
    with pytest.raises(ValueError, match="not found"):
        kmeans_embeddings(ds, n_clusters=2, iters=1, init_ids=[0, 999])


def test_kmeans_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"vec_id": 1, "embedding": [1.0, 0.0]}]).filter(
        lambda r: False)
    assigned, cents = kmeans_embeddings(ds, n_clusters=2, iters=2)
    assert cents.size == 0
