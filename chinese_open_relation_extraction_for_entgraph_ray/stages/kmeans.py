"""Distributed spherical k-means over an embedding column — corpus
clustering for data mixes, topic bucketing and diversity sampling in
training-data pipelines.

Proper distributed Lloyd's, not a sample-only shortcut (that is
:func:`similarity.train_centroids`'s job for IVF): every round streams the
FULL dataset once through ``map_batches``, emitting only k partial
(sum_vec, count) rows per block — the per-round exchange is O(blocks * k),
independent of row count, and the k x dim centroid matrix is the only
driver-side state (small by definition; collected via ``take_all`` on the
partial rows, which is bounded, never the data).  Centroids re-broadcast
per round via closure capture (cloudpickle ships them once per task).

Deterministic end to end: seeded init from a bounded ``limit()`` sample
(same recipe as IVF), fixed round count, argmax ties broken by lowest
cluster id (numpy argmax semantics) — pinned against a single-process
Lloyd's reference in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _embedding_matrix, normalize, train_centroids


def _partial_sums(batch: pa.Table, centroids: np.ndarray) -> pa.Table:
    k, dim = centroids.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    if batch.num_rows:
        emb = normalize(_embedding_matrix(batch))
        assign = (emb @ centroids.T).argmax(axis=1)
        np.add.at(sums, assign, emb)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
    return pa.Table.from_arrays(
        [pa.array(np.arange(k, dtype=np.int64)),
         pa.array(list(sums), pa.list_(pa.float64())),
         pa.array(counts)],
        names=["cluster", "sum_vec", "count"])


def kmeans_embeddings(embeddings_ds, *, n_clusters: int = 16,
                      iters: int = 4, train_sample: int = 4096,
                      id_col: str = "vec_id",
                      init_ids: "list | None" = None):
    """embeddings -> one row per vector: (id_col, cluster,
    cosine_to_centroid), plus the trained centroids as the second return
    value (k x dim numpy).

    ``init_ids`` (optional): explicit id_col values whose normalized
    embeddings become the initial centroids, in the listed order, and the
    seeded-sample warm-up round is skipped — cluster i starts at
    init_ids[i] exactly.  This makes the WHOLE computation a pure
    function of (init_ids, iters, data), reproducible by any engine —
    the cross-engine verification seam (the DuckDB oracle of
    ``embeddings_kmeans_explicit`` mirrors it round for round); the
    seeded-sample default stays the scale path."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if init_ids is not None:
        if len(init_ids) != n_clusters:
            raise ValueError(
                f"init_ids has {len(init_ids)} entries for "
                f"n_clusters={n_clusters}")
        if len(set(init_ids)) != len(init_ids):
            raise ValueError("init_ids must be distinct")
        wanted = set(init_ids)

        def pick(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(
                pc.is_in(batch.column(id_col),
                         pa.array(list(wanted),
                                  batch.schema.field(id_col).type)))

        rows = embeddings_ds.map_batches(
            pick, batch_format="pyarrow").take_all()
        by_id = {r[id_col]: r["embedding"] for r in rows}
        missing = [i for i in init_ids if i not in by_id]
        if missing:
            raise ValueError(f"init_ids not found in dataset: {missing}")
        centroids = normalize(np.asarray(
            [by_id[i] for i in init_ids], dtype=np.float64))
        return _lloyd_rounds(embeddings_ds, centroids, iters, id_col)
    sample_rows = embeddings_ds.limit(train_sample).take_all()
    if not sample_rows:
        empty = pa.schema([(id_col, pa.int64()),
                           ("cluster", pa.int64()),
                           ("cosine_to_centroid", pa.float64())])

        def _empty(batch: pa.Table) -> pa.Table:
            return empty.empty_table()

        return (embeddings_ds.map_batches(_empty, batch_format="pyarrow"),
                np.zeros((0, 0)))
    sample = np.asarray([r["embedding"] for r in sample_rows],
                        dtype=np.float64)
    centroids = train_centroids(sample, nlist=n_clusters, iters=1)
    return _lloyd_rounds(embeddings_ds, centroids, iters, id_col)


def _lloyd_rounds(embeddings_ds, centroids: np.ndarray, iters: int,
                  id_col: str):
    """The distributed Lloyd loop + final assignment, from given initial
    centroids (already normalized)."""
    for _ in range(iters):
        c = centroids   # bind per round for closure capture

        def partial(batch: pa.Table, _c=c) -> pa.Table:
            return _partial_sums(batch, _c)

        parts = embeddings_ds.map_batches(
            partial, batch_format="pyarrow").take_all()   # O(blocks * k)
        k, dim = centroids.shape
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sum_vec"])
            counts[r["cluster"]] += r["count"]
        new = centroids.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        centroids = normalize(new)

    final = centroids

    def assign_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], batch.schema.field(id_col).type),
                 pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=[id_col, "cluster", "cosine_to_centroid"])
        from ..functions.fputil import np_round_away

        emb = normalize(_embedding_matrix(batch))
        sims = emb @ final.T
        assign = sims.argmax(axis=1)
        best = np_round_away(sims[np.arange(len(assign)), assign], 6)
        return pa.Table.from_arrays(
            [batch.column(id_col),
             pa.array(assign.astype(np.int64)),
             pa.array(best, pa.float64())],
            names=[id_col, "cluster", "cosine_to_centroid"])

    return (embeddings_ds.map_batches(assign_fn, batch_format="pyarrow"),
            final)
