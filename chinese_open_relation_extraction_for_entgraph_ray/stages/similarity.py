"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put`` when large; literal capture here), each batch does one numpy
matmul, and per-batch top-k candidates are reduced by a final sort+limit over
the (tiny) candidate stream.  Scale path: LSH bucketing via random
hyperplanes, same groupby pattern as MinHash — per-bucket exact rerank.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.fputil import np_round_away

N_HYPERPLANES = 12
_rng = np.random.RandomState(0xBEEF)


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    """(n, dim) float64 matrix from the embedding column — via the Arrow
    buffer (flatten() respects offsets/slices), not to_pylist(): the
    Python-object round-trip was the dominant per-batch cost of every
    similarity kernel at scale."""
    col = batch.column("embedding").combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            flat = col.flatten()
            if flat.null_count == 0:
                return np.asarray(flat, dtype=np.float64).reshape(
                    n, col.type.list_size)
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lens = np.diff(np.asarray(col.offsets))
            flat = col.flatten()
            if len(lens) and (lens == lens[0]).all() and lens[0] > 0 \
                    and flat.null_count == 0:
                return np.asarray(flat, dtype=np.float64).reshape(
                    n, int(lens[0]))
    # ragged/null rows — correctness fallback (never hit by valid input)
    return np.asarray(col.to_pylist(), dtype=np.float64)


def normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return v / n


class CosineTopK:
    """Per-batch brute-force scorer against a fixed query vector (held per
    actor; with many queries this would be a matrix and one GEMM per batch)."""

    def __init__(self, query_vec: np.ndarray, round_digits: int = 6):
        q = np.asarray(query_vec, dtype=np.float64)
        self.q = q / (np.linalg.norm(q) or 1.0)
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = normalize(_embedding_matrix(batch))
        sims = np_round_away(emb @ self.q, self.round_digits)
        return pa.Table.from_arrays(
            [batch.column("vec_id"), pa.array(sims, pa.float64())],
            names=["vec_id", "cosine_sim"])


def brute_force_top_k(embeddings_ds, query_vec, k: int = 10):
    """Top-k most-similar vec_ids (ties broken by vec_id asc, like the SQL
    oracle's ORDER BY sim DESC, vec_id ASC)."""
    scored = embeddings_ds.map_batches(
        CosineTopK(query_vec), batch_format="pyarrow", batch_size=4096)
    # per-batch prune to k candidates before the global sort
    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(batch, sort_keys=[("cosine_sim", "descending"),
                                                  ("vec_id", "ascending")])
        return batch.take(order[:k])

    pruned = scored.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["cosine_sim", "vec_id"], descending=[True, False]).limit(k)


def add_lsh_bucket(batch: pa.Table) -> pa.Table:
    """Random-hyperplane LSH bucket id per vector (the IVF/LSH scale path:
    candidate buckets only, then exact rerank inside the bucket)."""
    emb = _embedding_matrix(batch)
    planes = _hyperplanes(emb.shape[1])
    bits = (emb @ planes.T) > 0
    buckets = bits @ (1 << np.arange(N_HYPERPLANES))
    return pa.Table.from_arrays(
        [batch.column("vec_id"), batch.column("embedding"),
         pa.array(buckets.astype(np.int32), pa.int32())],
        names=["vec_id", "embedding", "bucket"])


# --- multi-band hyperplane LSH (near-dup recall path) ------------------------
# One 12-bit table keeps cos>=0.8 pairs together with prob (1-θ/π)^12 ≈ 6% —
# useless recall.  N_TABLES independent 8-bit tables raise that to
# 1-(1-p^8)^N ≈ 75% at cos 0.8 and ≈ 99% at cos 0.95 (true near-dups).
N_TABLES = 8
BITS_PER_TABLE = 8
_TABLE_PLANES: dict[int, np.ndarray] = {}


def _table_planes(dim: int) -> np.ndarray:
    if dim not in _TABLE_PLANES:
        _TABLE_PLANES[dim] = np.random.RandomState(0xD00D).standard_normal(
            (N_TABLES, BITS_PER_TABLE, dim))
    return _TABLE_PLANES[dim]


def add_lsh_bands(batch: pa.Table) -> pa.Table:
    """Explode each vector to N_TABLES (table, bucket) rows, embedding
    carried along for in-bucket exact verification."""
    emb = _embedding_matrix(batch)
    if emb.size == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int32()),
             pa.array([], pa.int32()),
             pa.array([], batch.schema.field("embedding").type)],
            names=["vec_id", "table", "bucket", "embedding"])
    planes = _table_planes(emb.shape[1])
    vec_ids = batch.column("vec_id")
    out_vid, out_tbl, out_bkt, out_emb = [], [], [], []
    weights = 1 << np.arange(BITS_PER_TABLE)
    proj = np.einsum("nd,tbd->tnb", emb, planes)      # (T, n, B)
    buckets = (proj > 0) @ weights                     # (T, n)
    emb_col = batch.column("embedding")
    n = emb.shape[0]
    for t in range(N_TABLES):
        out_vid.append(vec_ids)
        out_tbl.append(pa.array(np.full(n, t, dtype=np.int32), pa.int32()))
        out_bkt.append(pa.array(buckets[t].astype(np.int32), pa.int32()))
        out_emb.append(emb_col)
    return pa.Table.from_arrays(
        [pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                           else a for a in out_vid]),
         pa.concat_arrays(out_tbl),
         pa.concat_arrays(out_bkt),
         pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                           else a for a in out_emb])],
        names=["vec_id", "table", "bucket", "embedding"])


def embedding_near_dups(embeddings_ds, threshold: float = 0.8):
    """Exact-verified near-dup pairs (a < b, cosine >= threshold) via
    multi-band hyperplane LSH: explode to (table, bucket) rows -> groupby
    bucket -> in-bucket exact cosine -> dedup pairs across tables.

    Shuffle shape: one bucket groupby + one tiny pair groupby; bucket sizes
    are ~n/2^BITS_PER_TABLE per table — skew-capped by construction."""
    import pandas as pd

    from ..functions.fputil import np_round_away

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        emb = normalize(np.asarray(list(group["embedding"]), dtype=np.float64))
        sims = emb @ emb.T
        out_a, out_b, out_s = [], [], []
        order = np.argsort(ids)
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                a, b = order[ii], order[jj]
                s = sims[a, b]
                if s >= threshold:
                    out_a.append(int(ids[a]))
                    out_b.append(int(ids[b]))
                    out_s.append(float(np_round_away(np.array([s]), 4)[0]))
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "cosine_sim": pd.Series(out_s, dtype="float64")})

    pairs = (embeddings_ds
             .map_batches(add_lsh_bands, batch_format="pyarrow")
             .groupby(["table", "bucket"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # cross-table pair dedup on the sorted-block aggregate — pair count at
    # scale is high-cardinality, where the builtin groupby reduce pays
    # ~linear-in-groups Python cost (VERDICT r2 #2)
    from .groupagg import sorted_hash_aggregate

    return sorted_hash_aggregate(pairs, ["a", "b"],
                                 [("cosine_sim", "max")])


# --- IVF (inverted-file) approximate top-k -----------------------------------

IVF_NLIST = 64       # centroids
IVF_NPROBE = 8       # probed cells per query
IVF_KMEANS_ITERS = 5


def train_centroids(sample: np.ndarray, nlist: int = IVF_NLIST,
                    iters: int = IVF_KMEANS_ITERS) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the classic IVF
    training step: sample is small; the full assign/search stays
    distributed).  Seeded init, normalized centroids (spherical k-means,
    cosine metric)."""
    sample = normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(0x5EED)
    nlist = min(nlist, len(sample))
    centroids = sample[rng.choice(len(sample), size=nlist, replace=False)]
    for _ in range(iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = normalize(centroids)
    return centroids


def ivf_top_k(embeddings_ds, query_vec, k: int = 10,
              nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
              train_sample: int = 4096):
    """Approximate top-k: assign every vector to its nearest centroid inside
    map_batches (centroids broadcast via closure — ``ray.put`` for large
    codebooks), score only vectors whose cell is among the query's nprobe
    nearest cells, then exact cosine + global top-k on the surviving ~nprobe/
    nlist fraction.  The scale path for similarity_topk's brute force."""
    sample_rows = embeddings_ds.limit(train_sample).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    centroids = train_centroids(sample, nlist)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe_cells = set(np.argsort(-(centroids @ q))[:nprobe].tolist())

    from ..functions.fputil import np_round_away

    def probe_and_score(batch: pa.Table) -> pa.Table:
        emb = normalize(_embedding_matrix(batch))
        if emb.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["vec_id", "cosine_sim"])
        cells = (emb @ centroids.T).argmax(axis=1)
        mask = np.isin(cells, list(probe_cells))
        sims = np_round_away(emb[mask] @ q, 6)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())[mask]
        return pa.Table.from_arrays(
            [pa.array(vec_ids, pa.int64()), pa.array(sims, pa.float64())],
            names=["vec_id", "cosine_sim"])

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(batch, sort_keys=[("cosine_sim", "descending"),
                                                  ("vec_id", "ascending")])
        return batch.take(order[:k])

    return (embeddings_ds.map_batches(probe_and_score, batch_format="pyarrow")
            .map_batches(local_topk, batch_format="pyarrow")
            .sort(["cosine_sim", "vec_id"], descending=[True, False]).limit(k))


_PLANES: dict[int, np.ndarray] = {}


def _hyperplanes(dim: int) -> np.ndarray:
    if dim not in _PLANES:
        _PLANES[dim] = np.random.RandomState(0xBEEF).standard_normal(
            (N_HYPERPLANES, dim))
    return _PLANES[dim]


def embedding_norms(batch: pa.Table) -> pa.Table:
    emb = _embedding_matrix(batch)
    norms = np_round_away(np.linalg.norm(emb, axis=1), 6)
    return pa.Table.from_arrays(
        [batch.column("vec_id"), batch.column("label"),
         pa.array(norms, pa.float64())],
        names=["vec_id", "label", "l2_norm"])
