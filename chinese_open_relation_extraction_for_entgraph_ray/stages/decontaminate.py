"""Test-set decontamination: drop/flag training documents that share word
k-shingles with an evaluation corpus (the standard pre-training hygiene step
— eval questions leaking into training data inflate benchmarks).

Scale shape: evaluation sets are TINY next to a 100-TB training corpus, so
the eval shingle-hash set is built once (bounded, loud failure if the
'small side' isn't small), shipped via ``ray.put`` and read per batch —
a broadcast membership test, no shuffle at all.  When the eval side is too
big to broadcast, the inverted-index join machinery
(``stages/dedup.similar_pairs_exact``) is the shuffle-based alternative.

Shingle identity is the same 128-bit polars hash as the exact-pairs join;
membership tests compare hashes, so the broadcast carries 16 bytes per
distinct eval shingle regardless of text length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import word_shingles

#: refuse to broadcast an "eval" side bigger than this many distinct
#: shingles (~1.6 GB of hash pairs) — at that size it is not an eval set
MAX_EVAL_SHINGLES = 100_000_000


def _shingle_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray,
                                                       np.ndarray]:
    """Per-doc distinct shingles -> (h1, h2, doc_offsets).  offsets[i] is
    the start of doc i's hashes (len = n_docs + 1)."""
    import polars as pl

    shingles: list[str] = []
    offsets = [0]
    for t in texts:
        sh = list(word_shingles(t or "", k))
        shingles.extend(sh)
        offsets.append(len(shingles))
    if shingles:
        ser = pl.Series(shingles)
        h1 = ser.hash(seed=101).to_numpy().view(np.int64)
        h2 = ser.hash(seed=202).to_numpy().view(np.int64)
    else:
        h1 = h2 = np.array([], dtype=np.int64)
    return h1, h2, np.asarray(offsets, dtype=np.int64)


def eval_shingle_set(eval_ds, *, k: int = 3, text_col: str = "text"):
    """Collect the eval corpus's distinct shingle hashes into one sorted
    array pair and ``ray.put`` it (broadcast once, read in every task)."""
    import ray

    parts1, parts2 = [], []
    total = 0
    for batch in eval_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=4096):
        h1, h2, _ = _shingle_hashes(batch.column(text_col).to_pylist(), k)
        parts1.append(h1)
        parts2.append(h2)
        total += len(h1)
        if total > MAX_EVAL_SHINGLES:
            raise ValueError(
                f"eval side exceeds {MAX_EVAL_SHINGLES} shingles — not a "
                "broadcastable eval set; use the inverted-index join path")
    if parts1:
        combo = np.unique(np.stack([np.concatenate(parts1),
                                    np.concatenate(parts2)]), axis=1)
    else:
        combo = np.zeros((2, 0), dtype=np.int64)
    # sorted lexicographically by (h1, h2) -> searchsorted membership
    order = np.lexsort((combo[1], combo[0]))
    return ray.put((combo[0][order], combo[1][order]))


def _member_counts(h1, h2, offsets, ev1, ev2) -> np.ndarray:
    """Per-doc count of shingles present in the sorted eval arrays."""
    n_docs = len(offsets) - 1
    if len(h1) == 0 or len(ev1) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    lo = np.searchsorted(ev1, h1, side="left")
    hi = np.searchsorted(ev1, h1, side="right")
    hit = np.zeros(len(h1), dtype=bool)
    # within each h1 run, check h2 (runs are ~1 long: h1 collisions between
    # DISTINCT shingles are ~2^-64-rare; a run > 1 means the same h1 with
    # different h2)
    for i in np.nonzero(hi > lo)[0]:
        hit[i] = bool(np.any(ev2[lo[i]:hi[i]] == h2[i]))
    doc_of = np.repeat(np.arange(n_docs), np.diff(offsets))
    return np.bincount(doc_of[hit], minlength=n_docs).astype(np.int64)


def contamination_counts(docs_ds, eval_ref, *, k: int = 3,
                         text_col: str = "text"):
    """docs -> (doc_id, n_overlap) for docs sharing >=1 shingle with the
    eval set (the contamination report; join against it to drop)."""
    import ray

    def flag(batch: pa.Table) -> pa.Table:
        ev1, ev2 = ray.get(eval_ref)
        h1, h2, offsets = _shingle_hashes(
            batch.column(text_col).to_pylist(), k)
        counts = _member_counts(h1, h2, offsets, ev1, ev2)
        keep = counts > 0
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks().filter(pa.array(keep)),
             pa.array(counts[keep], pa.int64())],
            names=["doc_id", "n_overlap"])

    return docs_ds.map_batches(flag, batch_format="pyarrow")


def decontaminate(docs_ds, eval_ds, *, k: int = 3, min_overlap: int = 1,
                  text_col: str = "text"):
    """Training docs with fewer than ``min_overlap`` eval-shingle overlaps
    (the decontaminated corpus).  One broadcast + one map — no shuffle."""
    import ray

    eval_ref = eval_shingle_set(eval_ds, k=k, text_col=text_col)

    def keep_clean(batch: pa.Table) -> pa.Table:
        ev1, ev2 = ray.get(eval_ref)
        h1, h2, offsets = _shingle_hashes(
            batch.column(text_col).to_pylist(), k)
        counts = _member_counts(h1, h2, offsets, ev1, ev2)
        return batch.filter(pa.array(counts < min_overlap))

    return docs_ds.map_batches(keep_clean, batch_format="pyarrow")


def _combined_shingle_hashes(texts, k: int):
    """Per-doc shingle (h1, h2) pairs folded into one int64 stream (for the
    Bloom path) + doc offsets.  The fold is an odd-multiplier mix, so pair
    identity survives into 64 bits (collisions ~2^-64)."""
    h1, h2, offsets = _shingle_hashes(texts, k)
    combined = (h1.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ) ^ h2.astype(np.uint64)
    return combined.view(np.int64), offsets


def decontaminate_bloom(docs_ds, eval_ds, *, k: int = 3,
                        min_overlap: int = 1, fp_rate: float = 1e-4,
                        text_col: str = "text"):
    """Bloom-filter decontamination — the CONSTANT-MEMORY scale path when
    the eval suite outgrows the exact broadcast set (``eval_shingle_set``
    refuses beyond MAX_EVAL_SHINGLES; the Bloom bitmap is a fixed
    ``O(n log 1/p)`` BITS regardless of shingle count, built distributedly
    and OR-merged).  False positives OVER-count overlaps at ``fp_rate``
    (a clean doc may be dropped spuriously); false negatives cannot
    happen, so nothing contaminated survives — the safe direction for
    decontamination.  Output is therefore a SUBSET of ``decontaminate``'s
    (pinned by test); with realistic rates the difference is ~fp_rate of
    borderline docs."""
    import pyarrow as pa
    import ray

    from .bloom import _positions, _test_bits, bloom_from_dataset

    def eval_hashes(batch: pa.Table) -> pa.Table:
        combined, _ = _combined_shingle_hashes(
            batch.column(text_col).to_pylist(), k)
        return pa.Table.from_arrays([pa.array(combined, pa.int64())],
                                    names=["h"])

    ev = eval_ds.map_batches(eval_hashes, batch_format="pyarrow") \
                .materialize()        # sized once, read once for the build
    n_expected = max(int(ev.count()), 1)
    ref, m, kk = bloom_from_dataset(ev, "h", n_expected=n_expected,
                                    fp_rate=fp_rate)

    def keep_clean(batch: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        combined, offsets = _combined_shingle_hashes(
            batch.column(text_col).to_pylist(), k)
        n_docs = batch.num_rows
        if len(combined) == 0:
            return batch
        hit = _test_bits(bm, _positions(combined, m, kk))
        doc_of = np.repeat(np.arange(n_docs), np.diff(offsets))
        counts = np.bincount(doc_of[hit], minlength=n_docs)
        return batch.filter(pa.array(counts < min_overlap))

    return docs_ds.map_batches(keep_clean, batch_format="pyarrow")
