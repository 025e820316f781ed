"""Mergeable sketches: HyperLogLog approximate distinct count, and a
mergeable histogram sketch for approximate quantiles.

The task brief lists "a novel sketch" among custom operators Ray Data lacks.
HLL is the workhorse for 100-TB distinct counts: per-batch register arrays
(4096 x uint8 at p=12, ~1.6% standard error) merge by elementwise max — an
associative, commutative reduction, so the shape is map_batches (one register
row per batch) -> two-level merge (coalesce -> merge per block -> final
merge), never a shuffle of the raw values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HLL_P = 12
HLL_M = 1 << HLL_P        # 4096 registers
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(value: str) -> int:
    """First 8 md5 bytes, big-endian (was blake2b) — same primitive as
    the dedup family's ``_stable64`` (minus its 61-bit mask), so the
    DuckDB oracles of events_*_distinct_users_approx can recompute every
    register from ``md5(VARCHAR)``."""
    return int.from_bytes(
        hashlib.md5(value.encode("utf-8")).digest()[:8], "big")


def hll_registers(values) -> np.ndarray:
    """Register array for an iterable of strings."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for v in values:
        h = _hash64("" if v is None else str(v))
        idx = h >> (64 - HLL_P)
        rest = h & ((1 << (64 - HLL_P)) - 1)
        # rank = leading zeros of the remaining 52 bits + 1
        rank = (64 - HLL_P) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_merge(reg_rows: np.ndarray) -> np.ndarray:
    """(k, M) register rows -> elementwise max."""
    return reg_rows.max(axis=0).astype(np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections."""
    regs = regs.astype(np.float64)
    est = _ALPHA * HLL_M * HLL_M / np.sum(2.0 ** -regs)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        return HLL_M * np.log(HLL_M / zeros)      # linear counting
    if est > (1 << 64) / 30.0:                     # pragma: no cover
        return -(1 << 64) * np.log(1 - est / (1 << 64))
    return est


def approx_quantiles(ds, column: str, qs: list[float],
                     bins: int = 8192) -> list[float]:
    """Approximate quantiles via a mergeable equi-width histogram sketch —
    the shuffle-free alternative to a global sort (which is what exact
    distributed quantiles cost).

    Two streaming passes: (1) exact min/max (a cheap aggregate), (2)
    per-batch ``np.histogram`` counts merged by elementwise sum — the same
    two-level register-merge shape as the HLL sketch, one ``bins``-long
    int row per batch.  Quantiles interpolate linearly inside the hit
    bucket, so absolute error <= (max-min)/bins (plus in-bucket
    interpolation error), independent of row count."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(column, alias_name="lo"),
                         Max(column, alias_name="hi"),
                         Count(alias_name="n"))
    # aggregate() on an empty Dataset returns None (not a zero-count dict)
    if not stats or not stats.get("n") or stats.get("lo") is None:
        return [float("nan")] * len(qs)
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if lo == hi:
        return [float(lo)] * len(qs)
    lo, hi = float(lo), float(hi)

    def batch_hist(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(column).to_pylist(), dtype=np.float64)
        counts, _ = np.histogram(vals, bins=bins, range=(lo, hi))
        return pa.Table.from_arrays(
            [pa.array([counts.astype(np.int64).tolist()],
                      pa.list_(pa.int64(), bins))],
            names=["counts"])

    def merge_rows(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch.column("counts").to_pylist(), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array([rows.sum(axis=0).tolist()],
                      pa.list_(pa.int64(), bins))],
            names=["counts"])

    merged = (ds.map_batches(batch_hist, batch_format="pyarrow",
                             batch_size=65536)
              .repartition(8)
              .map_batches(merge_rows, batch_format="pyarrow",
                           batch_size=None)
              .repartition(1)
              .map_batches(merge_rows, batch_format="pyarrow",
                           batch_size=None))
    rows = merged.take_all()
    counts = np.asarray(rows[0]["counts"], dtype=np.int64)
    cum = np.cumsum(counts)
    width = (hi - lo) / bins
    out = []
    for q in qs:
        target = q * (n - 1)                      # linear-interp rank
        b = int(np.searchsorted(cum, target, side="right"))
        b = min(b, bins - 1)
        prev = cum[b - 1] if b else 0
        in_bucket = counts[b]
        frac = ((target - prev) / in_bucket) if in_bucket else 0.0
        out.append(lo + (b + frac) * width)
    return out


def grouped_approx_quantiles(ds, key: str, column: str, qs: list[float],
                             bins: int = 2048):
    """Per-group approximate quantiles from mergeable histogram sketches —
    the keyed composition of :func:`approx_quantiles`: per-batch
    (key, bucket) count rows (pre-aggregated, so the exchange carries at
    most batch_groups x occupied_buckets rows), ONE sorted-block hash
    aggregate by (key, bucket), then per-key reconstruction via the
    sorted-block grouped apply.  Error per group <= (global max-min)/bins.

    Returns a Dataset with (key, q_0.5-style columns per quantile).
    Bucket ranges are GLOBAL (one min/max pass) — groups confined to a
    narrow value slice lose resolution; raise ``bins`` if group ranges
    vary wildly.  Reconstruction runs per key (the grouped-apply fn
    path): suited to the usual low-cardinality quantile keys
    (types/languages/cohorts); for 1e6+ keys move the reconstruction into
    a block_fn (grouped cumsum) like the other vectorized queries."""
    import pandas as pd

    from ray.data.aggregate import Count, Max, Min

    from .blockgroup import sorted_map_groups
    from .groupagg import sorted_hash_aggregate

    stats = ds.aggregate(Min(column, alias_name="lo"),
                         Max(column, alias_name="hi"),
                         Count(alias_name="n"))
    qcols = [f"q{q}" for q in qs]
    out_schema = pa.schema([(key, pa.string())]
                           + [(c, pa.float64()) for c in qcols])
    # aggregate() on an empty Dataset returns None (not a zero-count dict)
    if not stats or not stats.get("n") or stats.get("lo") is None:
        return ds.map_batches(
            lambda b: out_schema.empty_table(), batch_format="pyarrow")
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / bins if hi > lo else 1.0

    def batch_hist(batch: pa.Table) -> pa.Table:
        # key column travels as string (the output schema's key type —
        # non-string keys are stringified, like a GROUP BY over a cast)
        keys = np.asarray(
            batch.column(key).cast(pa.string()).to_pylist(), dtype=object)
        vals = np.asarray(batch.column(column).to_pylist(), dtype=np.float64)
        b = np.clip(((vals - lo) / width).astype(np.int64), 0, bins - 1)
        df = pd.DataFrame({key: keys, "bucket": b})
        agg = df.groupby([key, "bucket"], sort=False).size().reset_index(
            name="n")
        return pa.Table.from_arrays(
            [pa.array(agg[key].tolist(), pa.string()),
             pa.array(agg["bucket"].to_numpy(), pa.int64()),
             pa.array(agg["n"].to_numpy(), pa.int64())],
            names=[key, "bucket", "n"])

    merged = sorted_hash_aggregate(
        ds.map_batches(batch_hist, batch_format="pyarrow"),
        [key, "bucket"], [("n", "sum")])

    def reconstruct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        counts = g["n"].to_numpy(dtype=np.int64)
        buckets = g["bucket"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        row = {key: [g[key].iloc[0]]}
        for q, c in zip(qs, qcols):
            target = q * (total - 1)
            j = int(np.searchsorted(cum, target, side="right"))
            j = min(j, len(counts) - 1)
            prev = cum[j - 1] if j else 0
            frac = ((target - prev) / counts[j]) if counts[j] else 0.0
            row[c] = [lo + (buckets[j] + frac) * width]
        return pd.DataFrame(row)

    return sorted_map_groups(merged, [key], reconstruct, schema=out_schema)


def approx_distinct(ds, column: str):
    """Dataset -> approximate distinct count of ``column`` (float).

    Shuffle-free: per-batch registers -> per-block merge -> final merge of
    one 4 KB row per block."""

    def batch_regs(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch.column(column).to_pylist())
        return pa.Table.from_arrays(
            [pa.array([regs.tolist()], pa.list_(pa.uint8(), HLL_M))],
            names=["regs"])

    def merge_block(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch.column("regs").to_pylist(), dtype=np.uint8)
        return pa.Table.from_arrays(
            [pa.array([hll_merge(rows).tolist()],
                      pa.list_(pa.uint8(), HLL_M))],
            names=["regs"])

    merged = (ds.map_batches(batch_regs, batch_format="pyarrow",
                             batch_size=65536)
              .repartition(8)
              .map_batches(merge_block, batch_format="pyarrow",
                           batch_size=None)
              .repartition(1)
              .map_batches(merge_block, batch_format="pyarrow",
                           batch_size=None))
    rows = merged.take_all()
    if not rows:           # empty input -> no register rows -> 0 distinct
        return 0.0
    final = np.asarray(rows[0]["regs"], dtype=np.uint8)
    return hll_estimate(final)


def grouped_approx_distinct(ds, key: str, column: str):
    """Per-group approximate distinct count — the keyed composition of
    :func:`approx_distinct`, completing the sketch family symmetrically
    with :func:`grouped_approx_quantiles`.

    Shape: per batch, ONE register row per key present (pre-merged — the
    exchange carries at most batch_groups rows of 4 KB, never raw values),
    then one sorted-block grouped apply merges each key's rows by
    elementwise max and estimates.  Skew-proof: a hot key reduces once per
    batch, then once over <= #batches register rows.

    Returns a Dataset of (key, approx_distinct) with key stringified (like
    a GROUP BY over a cast); estimate error ~1.6% at p=12."""
    import pandas as pd

    from .blockgroup import sorted_map_groups

    def batch_regs(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).cast(pa.string()).to_pylist()
        vals = batch.column(column).to_pylist()
        per: dict[str, list] = {}
        for k, v in zip(keys, vals):
            per.setdefault(k, []).append(v)
        out_k = list(per)
        out_r = [hll_registers(per[k]).tolist() for k in out_k]
        return pa.Table.from_arrays(
            [pa.array(out_k, pa.string()),
             pa.array(out_r, pa.list_(pa.uint8(), HLL_M))],
            names=[key, "regs"])

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)["regs"]
        keys_out, est_out = [], []
        for k, rows in g:
            regs = hll_merge(np.asarray([np.asarray(r, dtype=np.uint8)
                                         for r in rows]))
            keys_out.append(k)
            est_out.append(round(float(hll_estimate(regs)), 1))
        return pd.DataFrame({key: keys_out, "approx_distinct": est_out})

    schema = pa.schema([(key, pa.string()),
                        ("approx_distinct", pa.float64())])
    return sorted_map_groups(
        ds.map_batches(batch_regs, batch_format="pyarrow",
                       batch_size=65536),
        [key], block_fn=merge_block, schema=schema)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable approximate top-k)
# ---------------------------------------------------------------------------

MG_CAPACITY = 4096


def mg_compress(keys: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact (key, count) pairs to <= ``capacity`` counters the
    Misra-Gries way: subtract the (capacity+1)-th largest count from all and
    keep the positive survivors.  Each surviving estimate drops by at most
    the subtracted amount; summed over all compressions the total deficit
    is <= N / (capacity + 1) (the classic MG bound, preserved under merge
    by Agarwal et al. 2012's merge rule, which this IS: sum then
    compress)."""
    if len(keys) <= capacity:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    sub = counts[order[capacity]]
    kept = order[:capacity]
    new_counts = counts[kept] - sub
    pos = new_counts > 0
    return keys[kept][pos], new_counts[pos]


def approx_top_k(ds, column: str, k: int = 20,
                 capacity: int = MG_CAPACITY, weight_col: str | None = None):
    """Dataset -> approximate top-``k`` (value, count) of ``column`` —
    heavy hitters via mergeable Misra-Gries summaries, entirely
    shuffle-free: per-batch exact counts compressed to ``capacity``
    counters -> per-block merge -> one final merge of <= capacity rows per
    block.  Estimates UNDERCOUNT by at most N/(capacity+1) (N = total
    weight), so any value with true share > 1/(capacity+1) survives; with
    ``capacity >> k`` the top-k set matches the exact top-k whenever the
    k-th and (k+1)-th true counts differ by more than the bound.  The
    exact-but-shuffling companion is the docs_top_tokens aggregate;
    ``weight_col`` accepts pre-aggregated (value, weight) streams."""
    import pandas as pd

    def batch_sketch(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_pandas()
        if weight_col is not None:
            w = batch.column(weight_col).to_pandas()
            counts = w.groupby(vals, sort=False, dropna=True).sum()
        else:
            counts = vals.value_counts(sort=False, dropna=True)
        keys, cnts = mg_compress(counts.index.to_numpy(dtype=object),
                                 counts.to_numpy(dtype=np.int64), capacity)
        return pa.Table.from_arrays(
            [pa.array(keys.astype(str)), pa.array(cnts, pa.int64())],
            names=["value", "approx_count"])

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("value", sort=False)["approx_count"].sum()
        keys, cnts = mg_compress(counts.index.to_numpy(dtype=object),
                                 counts.to_numpy(dtype=np.int64), capacity)
        return pd.DataFrame({"value": keys.astype(str),
                             "approx_count": cnts})

    merged = (ds.map_batches(batch_sketch, batch_format="pyarrow",
                             batch_size=65536)
              .repartition(8)
              .map_batches(merge_block, batch_format="pandas",
                           batch_size=None)
              .repartition(1)
              .map_batches(merge_block, batch_format="pandas",
                           batch_size=None))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["approx_count", "value"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    return merged.map_batches(topk, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable point-frequency estimates)
# ---------------------------------------------------------------------------

CM_WIDTH = 4096
CM_DEPTH = 4
_CM_SEEDS = (0x2545F4914F6CDD1D, 0x9E3779B97F4A7C15,
             0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5)


def _cm_cols(values, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indices for string values — the md5-based
    ``_stable64`` token hash (shared with the minhash/LSH family; stable
    across library versions, and recomputable by the DuckDB oracle of
    ``docs_cm_estimates``, unlike the polars buffer hash this replaced),
    then one splitmix64-style remix per sketch row (independent seeds),
    mod width.  Shared by build and estimate so both sides index the
    same cells."""
    from .dedup import _token_hashes

    base = _token_hashes(
        ["" if v is None else str(v) for v in values]).astype(np.uint64)
    cols = np.empty((depth, len(base)), dtype=np.int64)
    for d in range(depth):
        z = base + np.uint64(_CM_SEEDS[d % len(_CM_SEEDS)] + d)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        cols[d] = (z % np.uint64(width)).astype(np.int64)
    return cols


def count_min_sketch(ds, column: str, *, width: int = CM_WIDTH,
                     depth: int = CM_DEPTH,
                     weight_col: str | None = None) -> np.ndarray:
    """Dataset -> (depth, width) Count-Min matrix over ``column``
    (optionally ``weight_col``-weighted).  Mergeable by ADDITION, so the
    distributed shape is the sketch-family standard: ONE matrix row per
    block (vectorized np.add.at per batch), per-partition pre-sums, then
    a driver sum of the ~8 survivors — O(depth x width x 8) bytes through
    the driver regardless of block count, never the values.
    Guarantees (Cormode & Muthukrishnan 2005): estimates NEVER undercount;
    overcount <= e/width * N with probability 1 - e^-depth per query."""

    def block_cm(batch: pa.Table) -> pa.Table:
        cm = np.zeros((depth, width), dtype=np.int64)
        vals = batch.column(column).to_pylist()
        if vals:
            w = (np.asarray(batch.column(weight_col), dtype=np.int64)
                 if weight_col is not None
                 else np.ones(len(vals), dtype=np.int64))
            cols = _cm_cols(vals, width, depth)
            for d in range(depth):
                np.add.at(cm[d], cols[d], w)
        return pa.Table.from_arrays(
            [pa.array([cm.tobytes()], pa.binary())], names=["cm"])

    def sum_merge(batch: pa.Table) -> pa.Table:
        cm = np.zeros((depth, width), dtype=np.int64)
        for buf in batch.column("cm").to_pylist():
            cm += np.frombuffer(buf, dtype=np.int64).reshape(depth, width)
        return pa.Table.from_arrays(
            [pa.array([cm.tobytes()], pa.binary())], names=["cm"])

    # two-level merge (per-partition sums first) so the driver reads ~8
    # matrix rows, not one per block
    merged = np.zeros((depth, width), dtype=np.int64)
    pre = ds.map_batches(block_cm, batch_format="pyarrow",
                         batch_size=65536) \
            .repartition(8) \
            .map_batches(sum_merge, batch_format="pyarrow", batch_size=None)
    for b in pre.iter_batches(batch_format="pyarrow"):
        for buf in b.column("cm").to_pylist():
            merged += np.frombuffer(buf, dtype=np.int64) \
                        .reshape(depth, width)
    return merged


def cm_estimate(cm: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates (min over rows) for ``values``."""
    depth, width = cm.shape
    cols = _cm_cols(list(values), width, depth)
    return np.min(cm[np.arange(depth)[:, None], cols], axis=0)
