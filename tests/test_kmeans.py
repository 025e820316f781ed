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


def test_kmeans_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"vec_id": 1, "embedding": [1.0, 0.0]}]).filter(
        lambda r: False)
    assigned, cents = kmeans_embeddings(ds, n_clusters=2, iters=2)
    assert cents.size == 0
