"""Sorted-block grouped apply: the scale-path replacement for
``ds.groupby(keys).map_groups(fn)``.

Ray's ``map_groups`` pays a per-group dispatch cost (~60 µs/group measured in
this sandbox), which at 10^8-10^9 groups (per-user sessions, per-conversation
assembly, per-customer top-k at transcript scale) is hours of pure dispatch.
This operator keeps the same exchange (ONE sort by the group keys) but runs
the per-group function inline over whole sorted blocks; only each block's
first and last key group — the ones that may straddle a block boundary, at
most 2 per block regardless of data size — are routed through a tiny keyed
second pass that sees each straddling group whole.

Same boundary-exact pattern as the MinHash pair generator
(``stages/dedup.py``), the sorted hash aggregate (``stages/groupagg.py``) and
the scale-path coref (``stages/coref.py``); factored here so every
grouped-apply query shares one audited implementation.

Partitioning assumption (same as any keyed map_groups): one key group fits in
a worker's heap.  Salt or pre-split a key that is bigger than that.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    if df is None or len(df) == 0:
        return schema.empty_table()
    return pa.Table.from_pandas(df[schema.names], schema=schema,
                                preserve_index=False)


def sorted_map_groups(ds, keys: list[str], fn, *, schema: pa.Schema):
    """Apply ``fn`` (pandas DataFrame of one key group -> pandas DataFrame)
    per distinct ``keys`` tuple; returns a Dataset with ``schema``.

    Equivalent to ``ds.groupby(keys).map_groups(fn, batch_format="pandas")``
    with the output cast to ``schema`` — but block-wise: per-group Python
    dispatch happens only for the <= 2 boundary-straddling groups per block.
    ``fn`` must not depend on intra-group row order (sort inside ``fn`` if
    order matters — the sort here orders by ``keys`` only)."""

    def inner_scan(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        kv = [df[k].to_numpy() for k in keys]
        is_first = kv[0] == kv[0][0]
        is_last = kv[0] == kv[0][-1]
        for col in kv[1:]:
            is_first &= col == col[0]
            is_last &= col == col[-1]
        inner = df[~(is_first | is_last)]
        if len(inner) == 0:
            return schema.empty_table()
        parts = [fn(g) for _, g in inner.groupby(keys, sort=False)]
        parts = [p for p in parts if p is not None and len(p)]
        if not parts:
            return schema.empty_table()
        return _to_arrow(pd.concat(parts, ignore_index=True), schema)

    def edge_filter(batch: pa.Table) -> pa.Table:
        """Arrow-native: keep only each block's first/last key-group rows."""
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            return batch
        is_first = is_last = None
        for k in keys:
            col = batch.column(k)
            f = pc.equal(col, col[0])
            l = pc.equal(col, col[n - 1])
            is_first = f if is_first is None else pc.and_(is_first, f)
            is_last = l if is_last is None else pc.and_(is_last, l)
        return batch.filter(pc.or_(is_first, is_last))

    def edge_apply(df: pd.DataFrame) -> pa.Table:
        return _to_arrow(fn(df), schema)

    sorted_ds = ds.sort(keys).materialize()
    inner_ds = sorted_ds.map_batches(inner_scan, batch_format="pandas",
                                     batch_size=None)
    edge_ds = (sorted_ds
               .map_batches(edge_filter, batch_format="pyarrow",
                            batch_size=None)
               .groupby(keys)
               .map_groups(edge_apply, batch_format="pandas"))
    return inner_ds.union(edge_ds)
