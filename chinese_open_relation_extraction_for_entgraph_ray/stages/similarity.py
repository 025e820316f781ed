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
    col = batch.column("embedding")
    arr = np.asarray(col.to_pylist(), dtype=np.float64)
    return arr


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
