"""Pivot / conditional aggregate: long -> wide counts in ONE exchange.

``SELECT key, count(*) FILTER (WHERE col = v) AS n_v, ... GROUP BY key``
— the classic reshape that a naive plan runs as one aggregate per pivot
value (N scans or an N-way replicated exchange).  Here each batch emits
one int64 indicator column per pivot value (vectorized ``pc.equal`` +
cast — no Python over rows), and a single pre-combined hash aggregate
sums them all: one data scan, one exchange, regardless of how many
pivot values there are.

Pivot values must be an explicit list (like SQL PIVOT ... IN (...)):
a data-driven column set would make the output schema depend on a full
scan.  Use a small distinct-values query first if the set is unknown.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .groupagg import auto_hash_aggregate


def pivot_counts(ds, key: str, col: str, values: list[str],
                 *, prefix: str = "n_", total_as: str | None = "n_total"):
    """ds -> one row per ``key`` with ``<prefix><value>`` count columns
    (one per entry of ``values``) and an optional ``total_as`` row count.
    Rows whose ``col`` is outside ``values`` count only toward the total
    (SQL FILTER semantics)."""
    if not values:
        raise ValueError("need at least one pivot value")
    out_cols = [f"{prefix}{v}" for v in values]
    if total_as is not None:
        out_cols.append(total_as)

    def indicators(t: pa.Table) -> pa.Table:
        c = t.column(col)
        arrs = [t.column(key)]
        for v in values:
            arrs.append(pc.cast(
                pc.fill_null(pc.equal(c, pa.scalar(v)), False),
                pa.int64()))
        if total_as is not None:
            import numpy as np

            arrs.append(pa.array(np.ones(len(t), dtype=np.int64)))
        return pa.Table.from_arrays(arrs, names=[key] + out_cols)

    return auto_hash_aggregate(
        ds.select_columns([key, col]).map_batches(
            indicators, batch_format="pyarrow"),
        [key], [(c, "sum") for c in out_cols])
