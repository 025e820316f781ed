"""Distributed as-of join (an operator Ray Data lacks; task-brief custom op).

``asof_join(left, right, by, ts, right_payload)`` attaches, to every left
row, the payload of the right row with the greatest timestamp <= the left
row's timestamp within the same ``by`` key (classic event-attribution /
point-in-time-correctness join).

Implementation: both sides are tagged and unioned into one schema, then ONE
sort by the key routes each key group through a merge-scan (pandas
``merge_asof``) — executed block-wise via the sorted-block grouped apply
(``stages/blockgroup.py``), so there is no per-key Python dispatch at 10^8+
keys.  Partitioning assumption: one ``by`` group fits in a worker
(salt/split by time range if a single key is bigger than a worker's heap)."""

from __future__ import annotations

import pyarrow as pa


def asof_join(left_ds, right_ds, *, by: str, ts: str,
              right_payload: list[str], suffix: str = "_right"):
    """Returns left rows + ``<payload><suffix>`` columns (null when no right
    row at-or-before the left timestamp exists for that key)."""
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    left_type = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    right_type = dict(zip(right_schema.names, right_schema.types))
    payload_out = [f"{c}{suffix}" for c in right_payload]

    def tag_left(batch: pa.Table) -> pa.Table:
        out = batch.append_column("__side", pa.array([1] * batch.num_rows,
                                                     pa.int8()))
        for c, oc in zip(right_payload, payload_out):
            out = out.append_column(oc, pa.nulls(batch.num_rows,
                                                 right_type[c]))
        return out

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {by: batch.column(by), ts: batch.column(ts)}
        n = batch.num_rows
        for c in left_cols:
            if c not in (by, ts):
                cols[c] = pa.nulls(n, left_type[c])
        cols["__side"] = pa.array([0] * n, pa.int8())
        for c, oc in zip(right_payload, payload_out):
            cols[oc] = batch.column(c)
        order = left_cols + ["__side"] + payload_out
        return pa.Table.from_arrays([cols[c] for c in order], names=order)

    def merge_scan(group):
        import pandas as pd

        lf = group[group["__side"] == 1][left_cols].sort_values(ts,
                                                                kind="mergesort")
        rt = group[group["__side"] == 0][[ts] + payload_out].sort_values(
            ts, kind="mergesort")
        if len(rt) == 0:
            out = lf.copy()
            for c in payload_out:
                out[c] = None
            return out
        return pd.merge_asof(lf, rt, on=ts, direction="backward",
                             allow_exact_matches=True)

    from .blockgroup import sorted_map_groups

    tagged_left = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tagged_right = right_ds.map_batches(tag_right, batch_format="pyarrow")
    unioned = tagged_left.union(tagged_right)
    out_schema = pa.schema(
        [(c, left_type[c]) for c in left_cols]
        + [(oc, right_type[c]) for c, oc in zip(right_payload, payload_out)])
    return sorted_map_groups(unioned, [by], merge_scan, schema=out_schema)
