"""Fixed-size token-window chunking with overlap — the context-window
preparation op of retrieval / long-document training pipelines: each
document becomes ``1 + ceil(max(n_tokens - size, 0) / stride)`` chunks
of up to ``size`` tokens, consecutive chunks sharing ``size - stride``
tokens of overlap, so every token lands in at least one chunk and no
degenerate fully-contained tail chunk is emitted.

Scale shape: pure per-row expansion — ONE vectorized ``map_batches``
(polars tokenize once per doc, numpy offset arithmetic for all chunk
boundaries at once, a single join-with-spaces per chunk via reduceat-
style slicing), no shuffle, no per-token Python.  Output grows by the
overlap factor (size / stride); block sizes stay bounded because the
expansion factor is a constant of the config, not of the data.

SQL-oracle-able bit-for-bit: DuckDB reproduces the chunk boundaries
with list slicing + ``generate_series`` (the oracle in
``__ray_entry__`` does exactly that), which pins both the boundary
arithmetic and the token-joining convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import TOKEN_RE_PORTABLE


def chunk_documents(docs_ds, *, size: int = 32, stride: int = 24,
                    id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (id_col, chunk_idx, n_tok, chunk_text); token-less
    documents emit no chunks.  ``stride <= size`` required."""
    if not 0 < stride <= size:
        raise ValueError(f"need 0 < stride <= size, got {stride}/{size}")

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def chunk(batch: pa.Table) -> pa.Table:
        import polars as pl

        empty = pa.Table.from_arrays(
            [pa.array([], id_type), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.string())],
            names=[id_col, "chunk_idx", "n_tok", "chunk_text"])
        if batch.num_rows == 0:
            return empty
        frame = pl.DataFrame({
            id_col: pl.from_arrow(batch.column(id_col).combine_chunks()),
            "tok": pl.from_arrow(
                pa.compute.fill_null(batch.column(text_col), "")
                .combine_chunks()).str.extract_all(TOKEN_RE_PORTABLE),
        })
        n = frame["tok"].list.len().to_numpy().astype(np.int64)
        n_chunks = np.where(
            n == 0, 0, 1 + (np.maximum(n - size, 0) + stride - 1) // stride)
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        # flat (doc, chunk_idx) pairs for every chunk in the batch
        doc_pos = np.repeat(np.arange(len(n)), n_chunks)
        starts_of_doc = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_idx = np.arange(total) - starts_of_doc[doc_pos]
        lo = chunk_idx * stride
        hi = np.minimum(lo + size, n[doc_pos])
        # join tokens per chunk: one Python join per CHUNK over a numpy
        # object array (bounded by size tokens) — the string-assembly
        # floor; boundaries themselves are fully vectorized above
        toks = frame["tok"].to_numpy()          # array of object arrays
        texts = [" ".join(toks[d][a:b])
                 for d, a, b in zip(doc_pos, lo, hi)]
        ids = frame[id_col].to_numpy()[doc_pos]
        return pa.Table.from_arrays(
            [pa.array(ids, id_type),
             pa.array(chunk_idx, pa.int64()),
             pa.array(hi - lo, pa.int64()),
             pa.array(texts, pa.string())],
            names=[id_col, "chunk_idx", "n_tok", "chunk_text"])

    return docs_ds.map_batches(chunk, batch_format="pyarrow")
