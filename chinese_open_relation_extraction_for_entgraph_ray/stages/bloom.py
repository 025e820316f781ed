"""Bloom-filter broadcast membership — the constant-memory scale path for
"is this value in that big set" stages (decontamination against a huge
eval suite, URL blocklists, seen-ID filters).

The exact broadcast set (``decontaminate.eval_shingle_set``) ships 16
bytes per distinct value and refuses beyond ``MAX_EVAL_SHINGLES``; a
Bloom filter ships a FIXED ``m``-bit array for any set size, trading a
tunable false-positive rate (never false negatives — a Bloom 'absent' is
certain).  For decontamination that asymmetry is exactly right: FPs
over-remove a few clean docs, but nothing contaminated survives.

Construction is distributed and mergeable: each block builds its own
``m``-bit bitmap with one vectorized numpy pass (k bit positions per
value via double hashing), blocks emit ONE bitmap row each, a
per-partition OR pre-merges them, and the driver ORs the ~8 survivors —
O(m/8) bytes through the driver, independent of set size and block
count.  Membership tests are the same vectorized positions +
``bitwise_and`` reduction per batch against the ``ray.put``-broadcast
bitmap.

Hash scheme: two independent 64-bit mixes (splitmix64 finalizers with
different seeds) of the value; position_i = (h1 + i*h2) mod m (Kirsch &
Mitzenmacher 2006 double hashing, standard public construction).
"""

from __future__ import annotations

import math

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array."""
    z = x.astype(np.uint64) + np.uint64(seed)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_params(n_expected: int, fp_rate: float) -> tuple[int, int]:
    """(m bits, k hashes) for the target capacity/FP rate; m is rounded
    up to a multiple of 64 for the uint64 word array."""
    if n_expected <= 0:
        return 64, 1
    m = math.ceil(-n_expected * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_expected * math.log(2)))
    return m, k


def _positions(values: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(values), k) bit positions via double hashing."""
    h1 = _splitmix(values, 0x9E3779B97F4A7C15)
    h2 = _splitmix(values, 0xD1B54A32D192ED03) | np.uint64(1)  # odd
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m))


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bitmap, (flat >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (flat & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-k-bits-set membership mask for a (n, k) position matrix."""
    bits = (bitmap[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_from_dataset(ds, column: str, *, n_expected: int,
                       fp_rate: float = 1e-4):
    """Build a Bloom filter over an int64 ``column`` distributedly and
    ``ray.put`` it: per-block bitmaps (one vectorized pass each) are OR-
    merged on the driver — O(blocks) fixed-size rows cross the wire, never
    the values themselves.  Returns (object ref, m, k)."""
    import pyarrow as pa
    import ray

    m, k = bloom_params(n_expected, fp_rate)

    def block_bloom(batch: pa.Table) -> pa.Table:
        bm = np.zeros(m // 64, dtype=np.uint64)
        vals = np.asarray(batch.column(column), dtype=np.int64)
        if len(vals):
            _set_bits(bm, _positions(vals, m, k))
        return pa.Table.from_arrays(
            [pa.array([bm.tobytes()], pa.binary())], names=["bitmap"])

    def or_merge(batch: pa.Table) -> pa.Table:
        bm = np.zeros(m // 64, dtype=np.uint64)
        for buf in batch.column("bitmap").to_pylist():
            bm |= np.frombuffer(buf, dtype=np.uint64)
        return pa.Table.from_arrays(
            [pa.array([bm.tobytes()], pa.binary())], names=["bitmap"])

    # two-level merge: per-partition OR first, so only ~8 bitmap rows —
    # not one per block — reach the driver (the grouped-HLL shape)
    merged = np.zeros(m // 64, dtype=np.uint64)
    pre = ds.map_batches(block_bloom, batch_format="pyarrow",
                         batch_size=None) \
            .repartition(8) \
            .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
    for b in pre.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bitmap").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint64)
    return ray.put(merged), m, k


def bloom_semi_join(ds, column: str, bloom_ref, m: int, k: int,
                    anti: bool = False):
    """Keep rows whose ``column`` value may be (semi) / definitely is not
    (anti) in the Bloom set.  semi admits FPs at the configured rate;
    anti NEVER drops a true member's row — the certain direction."""
    import pyarrow as pa
    import ray

    def flt(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        vals = np.asarray(batch.column(column), dtype=np.int64)
        if len(vals) == 0:
            return batch
        hit = _test_bits(bm, _positions(vals, m, k))
        return batch.filter(pa.array(~hit if anti else hit, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")
