"""Grouped ranking window functions: rank / percent_rank / ntile.

SQL's ``rank() / percent_rank() / ntile(T) OVER (PARTITION BY key
ORDER BY value, tiebreak)`` — the bucketing primitives behind
difficulty-percentile labels, per-domain decile splits, and
quota-balanced train shards in a curation pipeline.

Shape: ONE sort exchange by the partition key, then a per-block pass
vectorized ACROSS whole groups (``sorted_map_groups`` block_fn: one
lexsort + boundary scan + arithmetic on the rank vector — O(rows log
rows) per block, no per-group Python).  The ordering must be made
unique by a ``tiebreak`` column (e.g. a row id): with a total order,
rank == row_number and percent_rank is deterministic, so the output is
bit-comparable to SQL.

Null ``value`` rows sort LAST (numpy NaN ordering == DuckDB's default
ASC NULLS LAST), ordered among themselves by ``tiebreak``.

Partitioning assumption (same as any grouped apply): one partition
key's rows fit in a worker's heap.  For a single giant partition,
pre-bucket by value range and offset ranks by bucket-count partial
sums (distributed rank) — not needed at this engine's group sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .blockgroup import arrow_type_of, sorted_map_groups


def _sql_ntile(ranks0: np.ndarray, sizes: np.ndarray,
               n_tiles: int) -> np.ndarray:
    """SQL ntile: the first ``n %% T`` tiles get ``ceil(n/T)`` rows, the
    rest ``floor(n/T)``.  ``ranks0`` = 0-based rank within the group,
    ``sizes`` = that group's row count (aligned per row)."""
    base = sizes // n_tiles            # floor rows per small tile
    n_big = sizes % n_tiles            # how many tiles get base+1
    cut = n_big * (base + 1)           # rows covered by the big tiles
    in_big = ranks0 < cut
    # base == 0 only when n < T; then every row is in a big tile
    safe_base = np.maximum(base, 1)
    tile = np.where(in_big,
                    ranks0 // np.maximum(base + 1, 1),
                    n_big + (ranks0 - cut) // safe_base)
    return (tile + 1).astype(np.int64)


def grouped_rank_ntile(ds, key: str, value: str, tiebreak: str,
                       *, n_tiles: int = 10):
    """(key, value, tiebreak) rows -> same rows + ``rank`` (1-based,
    unique within the group), ``pct_rank`` ((rank-1)/(n-1), 0.0 for a
    1-row group) and ``tile`` (1..n_tiles, SQL ntile fill rule), ordered
    within each ``key`` group by (value ASC NULLS LAST, tiebreak ASC)."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    schema = pa.schema([
        (key, arrow_type_of(ds, key)),
        (value, pa.float64()),
        (tiebreak, arrow_type_of(ds, tiebreak)),
        ("rank", pa.int64()),
        ("pct_rank", pa.float64()),
        ("tile", pa.int64()),
    ])

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        keys_arr = df[key].to_numpy()
        vals = df[value].to_numpy(dtype=np.float64)
        ties = df[tiebreak].to_numpy()
        # stable total order: key, then value (NaN last), then tiebreak
        order = np.lexsort((ties, vals, keys_arr))
        keys_arr, vals, ties = keys_arr[order], vals[order], ties[order]
        new_grp = np.empty(len(keys_arr), dtype=bool)
        new_grp[0:1] = True
        new_grp[1:] = keys_arr[1:] != keys_arr[:-1]
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, len(keys_arr)))
        sizes_row = np.repeat(sizes, sizes)
        ranks0 = np.arange(len(keys_arr)) - np.repeat(starts, sizes)
        pct = np.where(sizes_row > 1,
                       ranks0 / np.maximum(sizes_row - 1, 1), 0.0)
        return pd.DataFrame({
            key: keys_arr, value: vals, tiebreak: ties,
            "rank": ranks0 + 1, "pct_rank": pct,
            "tile": _sql_ntile(ranks0, sizes_row, n_tiles),
        })

    return sorted_map_groups(ds.select_columns([key, value, tiebreak]),
                             [key], block_fn=block_fn, schema=schema)
