"""Product quantization (PQ) — the compressed-vector leg of the ANN
family (Jégou et al. 2011), completing this engine's similarity-search
scale ladder: brute-force GEMM (exact baseline) -> IVF (bucketed scan)
-> IVF-PQ (bucketed scan over 8-bit codes, the only representation that
fits 100 TB of embeddings in cluster RAM: m bytes/vector instead of
4*dim).

Pipeline shape:

- **train** — sub-codebooks come from a bounded ``limit()`` sample via
  driver-side L2 Lloyd's per subspace (the same sample-trained recipe as
  IVF's coarse centroids; a full-corpus refinement would reuse
  :mod:`kmeans`'s O(blocks x k) partial-sum exchange per subspace).
  Deterministic: seeded init, fixed iteration count, argmin ties to the
  lowest code.
- **encode** — codebooks broadcast once via ``ray.put``; each batch
  computes all m subspace assignments with one GEMM per subspace
  (||x-c||^2 = |x|^2 - 2x.c + |c|^2, |x|^2 constant per row drops out of
  the argmin) and emits uint8 codes + the per-vector reconstruction
  error.  No shuffle.
- **search (ADC)** — the query builds an (m, ksub) distance lookup
  table; scoring a coded vector is m table gathers + a sum (vectorized
  per block with ``np.take``), then per-block top-k pruning before the
  final k-row sort — the asymmetric distance computation path, never
  decompressing the corpus.

Vectors are L2-normalized before quantization, so ADC L2 ranking agrees
with the cosine ranking used by the exact/IVF paths (|q-x|^2 = 2-2cos on
the unit sphere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _embedding_matrix, normalize


def train_pq(sample: np.ndarray, *, m: int = 4, ksub: int = 16,
             iters: int = 8, seed: int = 11,
             init: np.ndarray | None = None) -> np.ndarray:
    """(n, dim) training sample -> (m, ksub, dim//m) codebooks via
    per-subspace L2 Lloyd's.  dim must divide evenly by m.

    ``init`` (optional, (ksub, dim) raw rows): codeword k of every
    subspace starts at init[k]'s subvector (normalized like the sample)
    and the seeded-RNG pick is skipped — the whole training becomes a
    pure function of (init, iters, sample), reproducible by the DuckDB
    oracle of ``embeddings_pq_topk_explicit``."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = normalize(sample.astype(np.float64))
    if init is not None and init.shape != (ksub, dim):
        raise ValueError(f"init shape {init.shape} != ({ksub}, {dim})")
    init_n = normalize(init.astype(np.float64)) if init is not None \
        else None
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * dsub:(j + 1) * dsub]
        if init_n is not None:
            c = init_n[:, j * dsub:(j + 1) * dsub].copy()
        else:
            init_idx = rng.choice(n, size=min(ksub, n), replace=False)
            c = x[np.sort(init_idx)].copy()
        if len(c) < ksub:   # tiny sample: pad with jittered repeats
            pad = c[rng.randint(0, len(c), ksub - len(c))]
            c = np.vstack([c, pad + 1e-6 * rng.standard_normal(pad.shape)])
        for _ in range(iters):
            d = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                 + (c * c).sum(1)[None, :])
            assign = d.argmin(axis=1)
            for k in range(ksub):
                mask = assign == k
                if mask.any():
                    c[k] = x[mask].mean(axis=0)
        books[j] = c
    return books


def pq_encode(embeddings_ds, books_ref, *, id_col: str = "vec_id",
              round_digits: int = 6):
    """embeddings -> (id_col, code list<uint8> of length m,
    reconstruction_err) — one GEMM per subspace per batch, no shuffle."""
    import ray

    from ..functions.fputil import np_round_away

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        m, ksub, dsub = books.shape
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], batch.schema.field(id_col).type),
                 pa.array([], pa.list_(pa.uint8())),
                 pa.array([], pa.float64())],
                names=[id_col, "code", "reconstruction_err"])
        emb = normalize(_embedding_matrix(batch))
        codes = np.empty((len(emb), m), dtype=np.uint8)
        err = np.zeros(len(emb), dtype=np.float64)
        for j in range(m):
            x = emb[:, j * dsub:(j + 1) * dsub]
            c = books[j]
            d = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                 + (c * c).sum(1)[None, :])
            a = d.argmin(axis=1)
            codes[:, j] = a
            diff = x - c[a]
            err += (diff * diff).sum(1)
        return pa.Table.from_arrays(
            [batch.column(id_col),
             pa.array(list(codes), pa.list_(pa.uint8())),
             pa.array(np_round_away(np.sqrt(err), round_digits),
                      pa.float64())],
            names=[id_col, "code", "reconstruction_err"])

    return embeddings_ds.map_batches(encode, batch_format="pyarrow")


def pq_search(codes_ds, books: np.ndarray, query: np.ndarray, *,
              k: int = 10, id_col: str = "vec_id",
              round_digits: int = 6):
    """Coded corpus + codebooks + query -> top-k (id_col, adc_dist) by
    asymmetric distance; per-block pruning bounds the final exchange at
    k rows per block."""
    import pandas as pd

    from ..functions.fputil import np_round_away

    m, ksub, dsub = books.shape
    q = normalize(query.astype(np.float64).reshape(1, -1))[0]
    # (m, ksub) LUT: distance of each query subvector to each codeword
    lut = np.stack([
        ((books[j] - q[j * dsub:(j + 1) * dsub]) ** 2).sum(1)
        for j in range(m)])

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], batch.schema.field(id_col).type),
                 pa.array([], pa.float64())],
                names=[id_col, "adc_dist"])
        codes = np.asarray(
            batch.column("code").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)).reshape(-1, m)
        # ADC: gather each subspace's LUT row at the stored code, sum
        d = np.zeros(len(codes), dtype=np.float64)
        for j in range(m):
            d += np.take(lut[j], codes[:, j])
        return pa.Table.from_arrays(
            [batch.column(id_col),
             pa.array(np_round_away(np.sqrt(d), round_digits),
                      pa.float64())],
            names=[id_col, "adc_dist"])

    def block_head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["adc_dist", id_col]).head(k)

    scored = codes_ds.map_batches(score, batch_format="pyarrow") \
        .map_batches(block_head, batch_format="pandas")
    return scored.sort(["adc_dist", id_col]).limit(k)


def pq_topk(embeddings_ds, query: np.ndarray, *, k: int = 10,
            m: int = 4, ksub: int = 16, train_sample: int = 4096,
            id_col: str = "vec_id", init_ids=None):
    """End-to-end: sample-train codebooks, encode the corpus, ADC top-k.

    ``init_ids``: explicit id_col values for the codeword init (see
    train_pq); ids must be present in the training sample."""
    import ray

    rows = embeddings_ds.limit(train_sample).take_all()
    sample = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    init = None
    if init_ids is not None:
        by_id = {r[id_col]: r["embedding"] for r in rows}
        missing = [i for i in init_ids if i not in by_id]
        if missing:
            raise ValueError(
                f"init_ids not in the training sample: {missing}")
        init = np.asarray([by_id[i] for i in init_ids], dtype=np.float64)
    books = train_pq(sample, m=m, ksub=ksub, init=init)
    codes = pq_encode(embeddings_ds, ray.put(books), id_col=id_col)
    return pq_search(codes, books, query, k=k, id_col=id_col)
