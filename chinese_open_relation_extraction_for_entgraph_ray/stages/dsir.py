"""DSIR-style data selection via hashed-n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): estimate the target-domain and raw-corpus token
distributions over a FIXED hashed feature space, score every raw
document by its log-likelihood ratio under the two distributions, and
keep the best-scoring k — the standard scalable answer to "select raw
web documents that look like my curated target domain" in an LLM
pretraining-data build.

Feature space: tokens hash into ``num_buckets`` buckets via the low 16
bits of ``md5(token)`` (deliberately chosen because DuckDB can compute
the identical bucket with ``('0x' || substr(md5(t),1,4))::int %% B``,
making the whole operator SQL-oracle-able bit-for-bit).  Bucket
distributions use add-one smoothing, so the per-bucket log ratio is

    lr[b] = ln((c_tgt[b] + 1) / (N_tgt + B)) - ln((c_raw[b] + 1) / (N_raw + B))

and a document's importance weight is the sum of ``lr`` over its tokens
(multiset, not set).  Ranking uses the weight rounded half-away-from-
zero (4 digits, ties broken by doc id) — the same rounded-before-ranked
contract as :mod:`tfidf`, so a 1-ulp libm difference can never reorder
near-ties between the engine and the oracle.

Distributed shape (the part that must survive 100 TB):

1. **bucket counts** — ONE ``map_batches`` emitting per-block bincounts
   (``<= num_buckets`` rows per block regardless of block size: the
   pre-combine IS the bincount) followed by one
   :func:`groupagg.auto_hash_aggregate` whose output cardinality is the
   constant ``num_buckets``, never corpus-sized.
2. **broadcast** — the (num_buckets,) float64 log-ratio vector is
   ``ray.put`` ONCE and read inside every scoring task; there is no
   shuffle and no re-ship per batch.
3. **score** — one vectorized ``map_batches``: polars tokenize/explode,
   md5 evaluated only on the block's UNIQUE tokens (numpy unique +
   inverse — O(block vocab), not O(block tokens)), per-doc sums via
   ``np.bincount``.  Streaming, stateless, no Python row loop.
4. **select** — top-k via per-block head + one tiny final sort (k rows
   per block enter the exchange, not the corpus).

Production note: DSIR proper samples with Gumbel noise on the weights
instead of taking the arg-top-k; that variant is this operator plus a
deterministic per-doc Gumbel column (hash the doc id, as the weighted
sampler in ``__ray_entry__`` already does) — selection stays top-k on
(weight + gumbel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import TOKEN_RE_PORTABLE

#: hashed feature-space size; must match the SQL oracle's modulus
NUM_BUCKETS = 1024


def _buckets_of(tokens: np.ndarray) -> np.ndarray:
    """Unique-token array -> int64 bucket ids (low 16 bits of md5 mod
    NUM_BUCKETS; parity with DuckDB pinned in tests/test_dsir.py)."""
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):   # O(block vocabulary), not tokens
        out[i] = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16)
    out %= NUM_BUCKETS
    return out


def _explode_tokens(batch: pa.Table, id_col: str, text_col: str):
    """batch -> (doc_ids ndarray, token ndarray, per-doc token counts)
    with empty/missing texts contributing zero tokens."""
    import polars as pl

    frame = pl.DataFrame({
        id_col: pl.from_arrow(batch.column(id_col).combine_chunks()),
        "tok": pl.from_arrow(
            pa.compute.fill_null(batch.column(text_col), "")
            .combine_chunks()).str.extract_all(TOKEN_RE_PORTABLE),
    })
    exploded = frame.explode("tok").drop_nulls("tok")
    return (exploded[id_col].to_numpy(), exploded["tok"].to_numpy())


def dsir_log_ratio(docs_ds, *, target_col: str, target_value: str,
                   text_col: str = "text",
                   num_buckets: int = NUM_BUCKETS):
    """documents -> ``ray.put`` handle of the (num_buckets,) float64
    log-ratio vector between the ``target_col == target_value`` slice
    and the full corpus (add-one smoothing; see module docstring)."""
    import ray

    from .groupagg import auto_hash_aggregate

    def bucket_counts(batch: pa.Table) -> pa.Table:
        # _explode_tokens pairs each token with its row's target_col
        # value, which doubles as the target-membership flag
        flags, toks = _explode_tokens(batch, target_col, text_col)
        if len(toks) == 0:
            empty = pa.array([], pa.int64())
            return pa.Table.from_arrays(
                [empty, empty, empty], names=["bucket", "c_tgt", "c_raw"])
        uniq, inv = np.unique(toks, return_inverse=True)
        buckets = _buckets_of(uniq)[inv]
        is_tgt = flags == target_value
        c_raw = np.bincount(buckets, minlength=num_buckets)
        c_tgt = np.bincount(buckets[is_tgt], minlength=num_buckets)
        nz = np.flatnonzero(c_raw)
        return pa.Table.from_arrays(
            [pa.array(nz, pa.int64()),
             pa.array(c_tgt[nz], pa.int64()),
             pa.array(c_raw[nz], pa.int64())],
            names=["bucket", "c_tgt", "c_raw"])

    agg = auto_hash_aggregate(
        docs_ds.map_batches(bucket_counts, batch_format="pyarrow"),
        ["bucket"], [("c_tgt", "sum"), ("c_raw", "sum")])

    c_tgt = np.zeros(num_buckets, dtype=np.float64)
    c_raw = np.zeros(num_buckets, dtype=np.float64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        idx = b.column("bucket").to_numpy()
        c_tgt[idx] = b.column("c_tgt").to_numpy()
        c_raw[idx] = b.column("c_raw").to_numpy()
    n_tgt, n_raw = c_tgt.sum(), c_raw.sum()
    lr = (np.log((c_tgt + 1.0) / (n_tgt + num_buckets))
          - np.log((c_raw + 1.0) / (n_raw + num_buckets)))
    return ray.put(lr)


def dsir_weights(docs_ds, lr_ref, *, id_col: str = "doc_id",
                 text_col: str = "text", round_digits: int = 4):
    """documents -> (id_col, n_tokens, dsir_weight) for every document
    with >= 1 token; weight rounded half-away (``round_digits``)."""
    import ray

    from ..functions.fputil import np_round_away

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        ids, toks = _explode_tokens(batch, id_col, text_col)
        if len(toks) == 0:
            return pa.Table.from_arrays(
                [pa.array([], id_type), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=[id_col, "n_tokens", "dsir_weight"])
        uniq_tok, inv = np.unique(toks, return_inverse=True)
        tok_lr = lr[_buckets_of(uniq_tok)][inv]
        uniq_id, id_inv = np.unique(ids, return_inverse=True)
        w = np.bincount(id_inv, weights=tok_lr, minlength=len(uniq_id))
        n = np.bincount(id_inv, minlength=len(uniq_id))
        return pa.Table.from_arrays(
            [pa.array(uniq_id, id_type),
             pa.array(n.astype(np.int64), pa.int64()),
             pa.array(np_round_away(w, round_digits), pa.float64())],
            names=[id_col, "n_tokens", "dsir_weight"])

    return docs_ds.map_batches(score, batch_format="pyarrow")


def dsir_select(weights_ds, *, k: int, id_col: str = "doc_id"):
    """(id, n_tokens, dsir_weight) -> the k rows with the largest
    (dsir_weight, -id) — per-block head first so only k rows per block
    reach the final exchange."""
    import pandas as pd

    def block_head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["dsir_weight", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    pruned = weights_ds.map_batches(block_head, batch_format="pandas")
    return pruned.sort(["dsir_weight", id_col],
                       descending=[True, False]).limit(k)
