"""Exact per-group quantiles (distributed grouped selection).

The sketch module (``stages/sketch.py``) gives APPROXIMATE grouped
quantiles with a mergeable-histogram exchange — the right default at
100 TB.  This operator is its EXACT companion for the cases that need
bit-true answers (SLA thresholds, oracle checks, small-to-medium group
sizes): one sort exchange by the group key, then a fully vectorized
per-block selection over whole groups via ``sorted_map_groups``.

Quantile definition: the lower inverse-CDF element at index
``ceil(q * n) - 1`` of the group's sorted values — an ACTUAL element of
the group (no interpolation), bit-equal to SQL ``quantile_disc``.

Partitioning assumption (same as any grouped apply): one key group's
rows fit in a worker's heap.  For groups beyond that, use the mergeable
approximate sketch, or pre-bucket values and recurse (distributed
selection) — at that size an exact single-element answer is rarely the
requirement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .blockgroup import arrow_type_of, sorted_map_groups


def grouped_quantiles(ds, key: str, value: str, qs: list[float],
                      *, out_names: list[str] | None = None):
    """(key, value) Dataset -> one row per key with exact quantile_disc
    values of ``value`` at each q in ``qs``.

    Output columns: ``key`` + ``out_names`` (default ``p<100q>`` e.g.
    p25/p50/p75), value dtype float64.  Null values in ``value`` are
    excluded (SQL aggregate semantics); a group with only nulls yields
    null quantiles.
    """
    if out_names is None:
        out_names = [f"p{round(q * 100):02d}" for q in qs]
    if len(out_names) != len(qs):
        raise ValueError("out_names/qs length mismatch")
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")

    schema = pa.schema([(key, arrow_type_of(ds, key))]
                       + [(n, pa.float64()) for n in out_names])

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over ALL whole groups in the block: one lexsort,
        boundary scan, then one fancy-gather per quantile."""
        vals = df[value].to_numpy(dtype=np.float64, copy=False)
        keys_arr = df[key].to_numpy()
        ok = ~np.isnan(vals)
        vals, keys_arr = vals[ok], keys_arr[ok]
        # all-null groups: emit null quantiles for keys with no valid rows
        all_keys = pd.unique(df[key].to_numpy())
        if len(vals) == 0:
            out = {key: all_keys}
            for n in out_names:
                out[n] = np.full(len(all_keys), np.nan)
            return pd.DataFrame(out)
        order = np.lexsort((vals, keys_arr))
        vals, keys_arr = vals[order], keys_arr[order]
        # group boundaries over the sorted key vector
        new_grp = np.empty(len(keys_arr), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = keys_arr[1:] != keys_arr[:-1]
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, len(keys_arr)))
        out = {key: keys_arr[starts]}
        for q, n in zip(qs, out_names):
            idx = starts + np.ceil(q * sizes).astype(np.int64) - 1
            out[n] = vals[idx]
        res = pd.DataFrame(out)
        missing = np.setdiff1d(all_keys, keys_arr[starts])
        if len(missing):
            pad = {key: missing}
            for n in out_names:
                pad[n] = np.full(len(missing), np.nan)
            res = pd.concat([res, pd.DataFrame(pad)], ignore_index=True)
        return res

    return sorted_map_groups(ds.select_columns([key, value]), [key],
                             block_fn=block_fn, schema=schema)


def winsorized_mean(ds, key: str, value: str, *, lo_q: float = 0.05,
                    hi_q: float = 0.95, decimals: int = 4):
    """Per-group mean of ``value`` winsorized (clamped) to the group's
    exact [lo_q, hi_q] quantiles — the robust-mean building block for
    outlier-tolerant quality metrics.

    Shape: one :func:`grouped_quantiles` pass (sort exchange) gives the
    tiny per-group clamp bounds, which attach back to the stream via a
    keyed lookup join (never a driver-side dict); the clamped sum/count
    then flow through ONE pre-combined aggregate.  Output:
    (key, avg_winsorized, n) with the mean rounded away-from-zero to
    ``decimals`` (the engine's SQL round convention).

    Null convention: ``n`` counts ALL rows (SQL count(*)) and the mean
    divides by it — on inputs with null ``value`` rows this differs from
    SQL ``avg`` (which divides by the non-null count); filter nulls
    upstream if that distinction matters."""
    import pyarrow.compute as pc

    from ..functions.fputil import pc_round_away
    from .groupagg import auto_hash_aggregate
    from .joins import lookup_join

    bounds = grouped_quantiles(ds, key, value, [lo_q, hi_q],
                               out_names=["__lo", "__hi"])
    joined = lookup_join(ds.select_columns([key, value]), bounds,
                         left_key=key, right_key=key,
                         payload=["__lo", "__hi"], suffix="",
                         how="inner")

    def clamp(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value), pa.float64())
        clamped = pc.min_element_wise(
            pc.max_element_wise(v, t.column("__lo")), t.column("__hi"))
        ones = pa.array(np.ones(len(t), dtype=np.int64))
        return pa.Table.from_arrays(
            [t.column(key), clamped, ones],
            names=[key, "__sum", "n"])

    agg = auto_hash_aggregate(
        joined.map_batches(clamp, batch_format="pyarrow"),
        [key], [("__sum", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        mean = pc.divide(t.column("__sum"),
                         pc.cast(t.column("n"), pa.float64()))
        return pa.Table.from_arrays(
            [t.column(key), pc_round_away(mean, decimals), t.column("n")],
            names=[key, "avg_winsorized", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")
