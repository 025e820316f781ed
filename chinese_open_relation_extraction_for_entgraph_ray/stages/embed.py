"""Batched text-embedding stage (the "batched model inference" pattern).

A real sentence encoder loads once per actor in ``__init__`` (weights on GPU,
``num_gpus`` fractional) and encodes a whole batch per ``__call__``.  This
container has no model weights, so the default encoder is a deterministic
feature-hashing embedder: token counts hashed into ``dim`` buckets with
signed hashing, L2-normalized — a real (if simple) embedding with the same
batch/actor shape, useful for wiring similarity search end-to-end over the
documents table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import re2_tokens

EMBED_DIM = 64


class TextEmbedder:
    """Actor-pool stage: documents(doc_id, text) -> (doc_id, embedding).

    ``mode="real"`` marks where a sentence-transformer would load; it raises
    here (no weights in this container).  ``mode="hash"`` (default) is the
    deterministic feature-hashing encoder."""

    def __init__(self, dim: int = EMBED_DIM, mode: str = "hash"):
        self.dim = dim
        self.mode = mode
        if mode == "real":   # pragma: no cover
            raise NotImplementedError(
                "no encoder weights in this container; use mode='hash' or "
                "swap in a model-backed embedder on the cluster")
        # token -> (bucket, sign) memo, built lazily per actor
        self._memo: dict[str, tuple[int, int]] = {}

    def _token_slot(self, tok: str) -> tuple[int, int]:
        slot = self._memo.get(tok)
        if slot is None:
            import hashlib

            # first 4 md5 bytes, big-endian (was zlib.crc32): the same
            # string-md5 primitive as the dedup/sketch families, so the
            # DuckDB oracle of docs_embed_similar can recompute every
            # bucket/sign from md5(VARCHAR); memoized per actor either way
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:4], "big")
            slot = (h % self.dim, 1 if (h >> 31) & 1 == 0 else -1)
            if len(self._memo) < (1 << 20):
                self._memo[tok] = slot
        return slot

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            for tok in re2_tokens(text or ""):
                b, s = self._token_slot(tok)
                out[i, b] += s
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self.encode(batch.column("text").to_pylist())
        return pa.Table.from_arrays(
            [batch.column("doc_id"),
             pa.array(emb.tolist(), pa.list_(pa.float64()))],
            names=["doc_id", "embedding"])


def embed_documents(docs_ds, *, concurrency: int = 4, batch_size: int = 1024):
    return docs_ds.map_batches(TextEmbedder, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)
