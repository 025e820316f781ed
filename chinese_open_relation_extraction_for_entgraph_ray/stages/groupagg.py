"""Fast distributed group-aggregate: sort by a numeric key hash, then
vectorized per-block pyarrow ``group_by``.

Ray Data's built-in ``groupby().aggregate()`` pays a per-group Python cost in
the reduce stage (~ms/group measured), which dominates once groups number in
the hundreds of thousands.  This operator keeps the exchange (Ray ``sort`` on
two int64 columns — far cheaper than a multi-string-key sort) but does all
aggregation through pyarrow's C++ hash aggregation (~0.1 s per million rows).

Exactness across block boundaries uses the same pattern as the MinHash pair
generator (``stages/dedup.py``): after the sort, a group is contiguous, so a
block aggregates every key except its first and last (those may straddle a
boundary); straddling keys' partial aggregates — at most 2 per block,
independent of data size — are merged in a tiny second pass.  This requires
every aggregate to be re-aggregatable (sum/min/max of partials), which also
makes the operator skew-proof: a hot key is reduced once per block, then
once over <= #blocks partials.

Keys are hashed to 128 bits (two int64 columns) so key collisions stay
negligible even at billions of distinct groups; the original key columns ride
along via ``min`` (constant within a hash group).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_KH, _KL, _KIND = "__gh_hi", "__gh_lo", "__gh_kind"

# two independent hash seeds -> two independent 64-bit hashes = a 128-bit
# combined key (collisions negligible at billions of groups).  polars'
# Series.hash is full-buffer (embedded NUL-safe, unlike pandas' strlen-based
# object hashing) and deterministic across worker processes.
_HASH_SEED_HI = 0x51A3
_HASH_SEED_LO = 0xC0DE


def _joined_key_strings(batch: pa.Table, key_cols: list[str]) -> pa.Array:
    """One string per row encoding the key tuple, INJECTIVELY: each component
    is self-delimiting — a validity marker byte ('v'/'n'), the value's char
    length in decimal, ':', then the value — so no separator byte can alias
    two distinct tuples regardless of value content (a bare '\\x00' join
    aliased ("a\\x00v","b") with ("a","v\\x00b")).  A null and an empty
    string stay distinct via the marker."""
    import pyarrow.compute as pc

    parts = []
    for c in key_cols:
        col = batch.column(c)
        s = pc.fill_null(col.cast(pa.string()), "")
        marker = pc.if_else(pc.is_valid(col),
                            pa.scalar("v"), pa.scalar("n"))
        ln = pc.utf8_length(s).cast(pa.string())
        # marker:len:value with explicit length => unambiguous parse
        parts.append(pc.binary_join_element_wise(marker, ln, s, ":"))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def _add_key_hash(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    """Append the 128-bit key hash as two int64 columns — fully vectorized
    (arrow cast/join + pandas' C siphash), no per-row Python in the hot
    aggregate path."""
    import numpy as np

    if batch.num_rows == 0:
        return batch.append_column(_KH, pa.array([], pa.int64())) \
                    .append_column(_KL, pa.array([], pa.int64()))
    if len(key_cols) == 1 and pa.types.is_integer(
            batch.column(key_cols[0]).type):
        # single integer key: hash the ints natively — no string
        # materialization (measured: the cast+join dominated the emit-side
        # cost of window-hash counting at 134M rows).  polars hashes ints
        # full-width and nulls to a distinct value, so injectivity and the
        # null/value distinction of the string encoding are preserved.
        import polars as pl

        ser = pl.from_arrow(batch.column(key_cols[0]))
        hi = ser.hash(seed=_HASH_SEED_HI).to_numpy()
        lo = ser.hash(seed=_HASH_SEED_LO).to_numpy()
        return batch.append_column(
            _KH, pa.array(hi.view(np.int64), pa.int64())) \
            .append_column(_KL, pa.array(lo.view(np.int64), pa.int64()))
    try:
        joined = _joined_key_strings(batch, key_cols)
    except pa.ArrowNotImplementedError:
        # non-string-castable key type (e.g. nested) — per-row fallback
        key_lists = [batch.column(c).to_pylist() for c in key_cols]
        his, los = [], []
        for vals in zip(*key_lists):
            d = hashlib.blake2b(
                "".join(f"v{len(str(v))}:{v}" if v is not None else "n0:"
                        for v in vals).encode(),
                digest_size=16).digest()
            his.append(int.from_bytes(d[:8], "big") - (1 << 63))
            los.append(int.from_bytes(d[8:], "big") - (1 << 63))
        return batch.append_column(_KH, pa.array(his, pa.int64())) \
                    .append_column(_KL, pa.array(los, pa.int64()))
    import polars as pl

    ser = pl.from_arrow(joined)
    hi = ser.hash(seed=_HASH_SEED_HI).to_numpy()
    lo = ser.hash(seed=_HASH_SEED_LO).to_numpy()
    return batch.append_column(_KH, pa.array(hi.view(np.int64), pa.int64())) \
                .append_column(_KL, pa.array(lo.view(np.int64), pa.int64()))


def _pa_aggregate(batch: pa.Table, key_cols: list[str],
                  agg_spec: list[tuple[str, str]]) -> pa.Table:
    """pyarrow hash aggregation by the hash key; key + agg columns keep their
    original names in the output."""
    spec = [(c, "min") for c in key_cols] + list(agg_spec)
    agg = batch.group_by([_KH, _KL]).aggregate(spec)
    renames = {f"{c}_min": c for c in key_cols}
    renames.update({f"{c}_{fn}": c for c, fn in agg_spec})
    return agg.rename_columns(
        [renames.get(name, name) for name in agg.column_names])


def _split_boundary(agg: pa.Table) -> pa.Table:
    """kind=1 for interior keys, kind=0 for the block's first/last key (sorted
    input => only those can straddle block boundaries)."""
    import pyarrow.compute as pc

    n = agg.num_rows
    if n == 0:
        return agg.append_column(_KIND, pa.array([], pa.int8()))
    hi, lo = agg.column(_KH), agg.column(_KL)
    first = (pc.equal(hi, hi[0]).combine_chunks(),
             pc.equal(lo, lo[0]).combine_chunks())
    last = (pc.equal(hi, hi[n - 1]).combine_chunks(),
            pc.equal(lo, lo[n - 1]).combine_chunks())
    import numpy as np

    is_edge = (np.asarray(first[0]) & np.asarray(first[1])) | \
              (np.asarray(last[0]) & np.asarray(last[1]))
    kind = np.where(is_edge, 0, 1).astype(np.int8)
    return agg.append_column(_KIND, pa.array(kind, pa.int8()))


def sorted_hash_aggregate(ds, key_cols: list[str],
                          agg_spec: list[tuple[str, str]]):
    """Dataset group-aggregate by ``key_cols``.

    ``agg_spec``: list of (column, fn) with fn in {"sum", "min", "max"} —
    re-aggregatable functions only (partials of partials must compose).
    Returns a Dataset with ``key_cols`` + the aggregated columns under their
    original names.
    """
    for _, fn in agg_spec:
        if fn not in ("sum", "min", "max"):
            raise ValueError(f"non-reaggregatable fn {fn!r}")
    # second-pass spec re-aggregates the already-renamed partials
    respec = [(c, fn) for c, fn in agg_spec]

    def block_agg(batch: pa.Table) -> pa.Table:
        return _split_boundary(_pa_aggregate(batch, key_cols, agg_spec))

    def merge_boundary(batch: pa.Table) -> pa.Table:
        return _pa_aggregate(batch, key_cols, respec)

    out_cols = list(key_cols) + [c for c, _ in agg_spec]

    def drop_aux(batch: pa.Table) -> pa.Table:
        return batch.select(out_cols)   # fixed order so union schemas match

    hashed = ds.map_batches(lambda b: _add_key_hash(b, key_cols),
                            batch_format="pyarrow")
    mixed = (hashed.sort([_KH, _KL])
             .map_batches(block_agg, batch_format="pyarrow", batch_size=None)
             .materialize())   # small: one row per (block, key); read twice
    interior = mixed.filter(expr=f"{_KIND} == 1") \
                    .map_batches(drop_aux, batch_format="pyarrow")
    boundary = (mixed.filter(expr=f"{_KIND} == 0")
                .repartition(1)
                .map_batches(merge_boundary, batch_format="pyarrow",
                             batch_size=None)
                .map_batches(drop_aux, batch_format="pyarrow"))
    return interior.union(boundary)


# Below this many observed partial-aggregate rows, skip the global sort and
# reduce the partials on one node — a single pyarrow hash aggregation over
# <=500k rows is milliseconds, while the Ray sort exchange costs ~1-2 s of
# fixed per-op latency regardless of size (measured; BASELINE.md r3).
AUTO_SMALL_PARTIALS = 500_000


def auto_hash_aggregate(ds, key_cols: list[str],
                        agg_spec: list[tuple[str, str]],
                        small_partials: int = AUTO_SMALL_PARTIALS):
    """Group-aggregate with OBSERVED-cardinality dispatch (VERDICT r2 #3:
    decide on an estimated group count, not a key-name allowlist).

    Always pre-combines per block first (pyarrow hash aggregation inside
    map_batches — the combiner), which bounds the exchange at one row per
    (block, distinct key) regardless of duplication.  The materialized
    partial stream's row count is an upper bound on the group count:

    - ``<= small_partials`` (low cardinality — e.g. hourly windows, whose
      key count grows with time span, not data size): ONE repartition(1) +
      final pyarrow merge.  No sort exchange at all — cheaper than both the
      builtin groupby and the sorted-block path at this size.
    - otherwise (high cardinality — keys ~ rows): the sorted-block path of
      :func:`sorted_hash_aggregate` over the partials.

    Same exactness contract as :func:`sorted_hash_aggregate` (re-aggregatable
    fns only: sum/min/max)."""
    for _, fn in agg_spec:
        if fn not in ("sum", "min", "max"):
            raise ValueError(f"non-reaggregatable fn {fn!r}")
    respec = [(c, fn) for c, fn in agg_spec]
    out_cols = list(key_cols) + [c for c, _ in agg_spec]

    def precombine(batch: pa.Table) -> pa.Table:
        return _pa_aggregate(_add_key_hash(batch, key_cols), key_cols,
                             agg_spec)

    partials = ds.map_batches(precombine,
                              batch_format="pyarrow").materialize()
    if partials.count() <= small_partials:
        merged = (partials.repartition(1)
                  .map_batches(lambda b: _pa_aggregate(b, key_cols, respec),
                               batch_format="pyarrow", batch_size=None))
        return merged.map_batches(lambda b: b.select(out_cols),
                                  batch_format="pyarrow")
    # high cardinality: partials already carry the hash columns, but
    # re-aggregating through sorted_hash_aggregate keeps one audited path
    return sorted_hash_aggregate(
        partials.map_batches(lambda b: b.select(out_cols),
                             batch_format="pyarrow"),
        key_cols, respec)
