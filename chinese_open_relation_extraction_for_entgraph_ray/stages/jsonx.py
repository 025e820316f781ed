"""Vectorized JSON field extraction from string columns.

Event/log tables routinely carry a semi-structured ``props`` JSON string
column; pulling typed fields out of it is the first step of any analysis
over them.  There is no pyarrow.compute JSON kernel, so the hot path runs
polars' vectorized ``str.json_path_match`` over the Arrow buffer (shared
zero-copy via ``pl.from_arrow``) — no Python per row, no json.loads.

Extraction semantics match SQL ``json_extract(col, path)``: a missing
field, null input, or malformed JSON yields null; numeric casts follow
Arrow cast rules (strings of digits -> int64/float64, anything else
raises — surface bad data loudly rather than coercing to null).
"""

from __future__ import annotations

import pyarrow as pa


def json_field(batch: pa.Table, col: str, path: str, *, out: str,
               dtype: pa.DataType = None) -> pa.Table:
    """Append ``out`` = the ``path`` (e.g. ``$.k``) field of the JSON in
    ``col`` to the batch, cast to ``dtype`` (default: leave as string)."""
    import polars as pl

    vals = pl.from_arrow(batch.column(col)).str.json_path_match(path)
    arr = vals.to_arrow()
    if dtype is not None:
        arr = arr.cast(dtype)
    return batch.append_column(out, arr)


def extract_json_fields(ds, col: str, fields: list[tuple[str, str, pa.DataType]]):
    """Dataset version: ``fields`` = [(path, out_name, dtype), ...] —
    one vectorized map_batches, all fields extracted in a single pass."""

    def fn(batch: pa.Table) -> pa.Table:
        for path, out, dtype in fields:
            batch = json_field(batch, col, path, out=out, dtype=dtype)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
