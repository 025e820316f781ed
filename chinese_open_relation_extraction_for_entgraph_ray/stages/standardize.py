"""Grouped standardization (z-score) — normalize a numeric column by its
group's mean / population standard deviation.

The feature-scaling primitive behind per-domain quality-score calibration
("is this doc unusually long FOR ITS SOURCE?") and outlier gating.  Shape:
ONE pre-combined (sum, sum-of-squares, count) aggregate gives the tiny
per-group moments, which attach back to the stream via a keyed lookup
join (never a driver-side dict); the z column is then a vectorized Arrow
expression per batch.  Two passes over the input, one exchange of
group-cardinality rows.

Moment convention: population stddev (ddof=0, SQL ``stddev_pop``),
computed as sqrt(max(E[x^2] - E[x]^2, 0)) — the max() guards the tiny
negative values FP cancellation can produce on constant groups.  A group
with zero variance (or a single row) yields z = 0.0 for all its rows
(the bounded convention — null would poison downstream filters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .groupagg import auto_hash_aggregate
from .joins import lookup_join


def grouped_moments(ds, key: str, value: str):
    """(key, value) -> one row per key: (key, mean, stddev_pop, n).
    Null values are excluded (SQL aggregate semantics)."""

    def partials(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value), pa.float64())
        ok = pc.is_valid(v)
        v = pc.if_else(ok, v, pa.scalar(0.0))
        return pa.Table.from_arrays(
            [t.column(key), v, pc.multiply(v, v),
             pc.cast(ok, pa.int64())],
            names=[key, "__s1", "__s2", "n"])

    agg = auto_hash_aggregate(
        ds.select_columns([key, value]).map_batches(
            partials, batch_format="pyarrow"),
        [key], [("__s1", "sum"), ("__s2", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("__s1").to_numpy(zero_copy_only=False)
        s2 = t.column("__s2").to_numpy(zero_copy_only=False)
        safe_n = np.maximum(n, 1.0)
        mean = s1 / safe_n
        var = np.maximum(s2 / safe_n - mean * mean, 0.0)
        mean = np.where(n > 0, mean, np.nan)
        sd = np.where(n > 0, np.sqrt(var), np.nan)
        return pa.Table.from_arrays(
            [t.column(key), pa.array(mean), pa.array(sd), t.column("n")],
            names=[key, "mean", "stddev_pop", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_corr(ds, key: str, x: str, y: str, *, decimals: int = 4):
    """Per-group Pearson correlation of two numeric columns — ONE
    pre-combined (sum x, sum y, sum x², sum y², sum xy, n) exchange, then
    r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) on the
    tiny group table.  Output: (key, corr, n), corr rounded away-from-zero
    to ``decimals``; null when a side is constant (SQL ``corr`` parity).
    Rows where either side is null are excluded (SQL pairwise semantics)."""

    def partials(t: pa.Table) -> pa.Table:
        xv = pc.cast(t.column(x), pa.float64())
        yv = pc.cast(t.column(y), pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        xv = pc.if_else(ok, xv, pa.scalar(0.0))
        yv = pc.if_else(ok, yv, pa.scalar(0.0))
        return pa.Table.from_arrays(
            [t.column(key), xv, yv, pc.multiply(xv, xv),
             pc.multiply(yv, yv), pc.multiply(xv, yv),
             pc.cast(ok, pa.int64())],
            names=[key, "__sx", "__sy", "__sxx", "__syy", "__sxy", "n"])

    agg = auto_hash_aggregate(
        ds.select_columns([key, x, y]).map_batches(
            partials, batch_format="pyarrow"),
        [key], [("__sx", "sum"), ("__sy", "sum"), ("__sxx", "sum"),
                ("__syy", "sum"), ("__sxy", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        from ..functions.fputil import np_round_away

        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("__sx").to_numpy(zero_copy_only=False)
        sy = t.column("__sy").to_numpy(zero_copy_only=False)
        sxx = t.column("__sxx").to_numpy(zero_copy_only=False)
        syy = t.column("__syy").to_numpy(zero_copy_only=False)
        sxy = t.column("__sxy").to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        denom = np.sqrt(np.maximum(vx, 0.0) * np.maximum(vy, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (n * sxy - sx * sy) / denom
        r = np.where(denom > 0, r, np.nan)
        return pa.Table.from_arrays(
            [t.column(key), pa.array(np_round_away(r, decimals)),
             t.column("n").cast(pa.int64())],
            names=[key, "corr", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_zscore(ds, key: str, value: str, *, out: str = "z"):
    """All input rows + a float64 ``out`` column: (value - group mean) /
    group stddev_pop; 0.0 where the group's stddev is 0 (constant or
    1-row groups); null where ``value`` is null."""
    moments = grouped_moments(ds, key, value)
    joined = lookup_join(ds, moments, left_key=key, right_key=key,
                         payload=["mean", "stddev_pop"], suffix="__m",
                         how="inner")

    def z(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value), pa.float64())
        sd = t.column("stddev_pop__m")
        num = pc.subtract(v, t.column("mean__m"))
        zs = pc.if_else(pc.greater(sd, pa.scalar(0.0)),
                        pc.divide(num, sd),
                        pc.multiply(v, pa.scalar(0.0)))  # keeps v's nulls
        keep = [c for c in t.column_names
                if c not in ("mean__m", "stddev_pop__m")]
        out_t = t.select(keep)
        return out_t.append_column(out, zs)

    return joined.map_batches(z, batch_format="pyarrow")
