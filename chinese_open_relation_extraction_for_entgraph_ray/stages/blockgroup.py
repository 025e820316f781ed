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


def arrow_type_of(ds, col: str) -> pa.DataType:
    """Arrow type of ``col`` in a Dataset — robust to pandas-backed
    datasets (from_pandas test inputs), whose schema reports numpy dtypes
    or Python classes instead of ``pa.DataType``.  Python ``object``/
    ``str`` columns map to ``pa.string()`` (the only object payload this
    engine stores)."""
    import numpy as np

    sch = ds.schema()
    t = sch.types[sch.names.index(col)]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def _to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    if df is None or len(df) == 0:
        return schema.empty_table()
    return pa.Table.from_pandas(df[schema.names], schema=schema,
                                preserve_index=False)


def sorted_map_groups(ds, keys: list[str], fn=None, *, schema: pa.Schema,
                      block_fn=None, null_keys: str = "error",
                      arrow_blocks: bool = False):
    """Apply a per-group computation per distinct ``keys`` tuple; returns a
    Dataset with ``schema``.

    Exactly one of:
    - ``fn``: pandas DataFrame of ONE key group -> pandas DataFrame.
      Easiest to write; pays a Python call per group (but only inline per
      block — never a Ray dispatch per group).
    - ``block_fn``: pandas DataFrame holding MANY WHOLE key groups ->
      pandas DataFrame.  The fully-vectorized path: implement the per-group
      logic with pandas/numpy grouped kernels over the whole block (O(rows),
      not O(groups) Python calls) — the shape that holds at 10^9 groups.

    Equivalent to ``ds.groupby(keys).map_groups(...)`` with the output cast
    to ``schema`` — but block-wise after ONE sort by ``keys``; only each
    block's first/last (possibly boundary-straddling) key groups take a
    second pass.  Neither callable may depend on intra-group row order
    (sort inside — the sort here orders by ``keys`` only).

    ``null_keys`` — what to do with rows whose key tuple contains a null
    (they cannot go through the sort: Ray's string-sort partitioner raises
    on nulls, and NaN != NaN would silently split or drop the group in the
    block scans):
    - "error" (default): raise ValueError on the first null-key row seen —
      no silent behavior on data the operator can't group correctly.
    - "drop": filter them out (pandas-groupby semantics).
    - "separate": process all null-key rows as one extra pass on a single
      block (SQL GROUP BY semantics for the ``fn`` path — distinct
      null-bearing tuples are separate groups via ``dropna=False``; a
      ``block_fn`` receives them as one ordinary block and must handle
      null keys itself).  Costs a second scan of ``ds``.

    ``arrow_blocks`` (block_fn only): pass ``block_fn`` zero-copy
    ``pyarrow.Table`` blocks instead of pandas DataFrames (it may return
    either).  REQUIRED when the block holds int64 columns with nulls whose
    values can exceed 2^53 — the pandas conversion coerces such columns to
    float64 and silently rounds them (the tagged-union shape of
    ``asof_join``, whose per-side null columns poison the other side's
    ints).
    """
    if (fn is None) == (block_fn is None):
        raise ValueError("pass exactly one of fn / block_fn")
    if arrow_blocks and block_fn is None:
        raise ValueError("arrow_blocks=True requires block_fn (the fn "
                         "path is pandas-per-group by definition)")
    if null_keys not in ("error", "drop", "separate"):
        raise ValueError(f"null_keys must be error/drop/separate, "
                         f"got {null_keys!r}")

    def apply_groups(df: pd.DataFrame) -> pd.DataFrame | None:
        """Per-group logic over a frame of whole groups, via whichever
        callable was supplied."""
        if block_fn is not None:
            return block_fn(df)
        # dropna=False: with null_keys="separate", null-bearing key tuples
        # are real groups; on the sorted (all-valid) path it is a no-op
        parts = [fn(g) for _, g in df.groupby(keys, sort=False,
                                              dropna=False)]
        parts = [p for p in parts if p is not None and len(p)]
        return pd.concat(parts, ignore_index=True) if parts else None

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
        out = apply_groups(inner)
        if out is None or len(out) == 0:
            return schema.empty_table()
        return _to_arrow(out, schema)

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
        """All boundary-straddling groups, gathered into ONE block (bounded:
        <= 2 groups per upstream block) — every group here is whole, so the
        same apply path runs unchanged."""
        if len(df) == 0:
            return schema.empty_table()
        out = apply_groups(df)
        if out is None or len(out) == 0:
            return schema.empty_table()
        return _to_arrow(out, schema)

    import pyarrow.compute as pc

    def _result_to_arrow(out) -> pa.Table:
        """block_fn result (pa.Table or pandas DataFrame or None) ->
        schema-cast Arrow table."""
        if out is None or len(out) == 0:
            return schema.empty_table()
        if isinstance(out, pa.Table):
            return out.select(schema.names).cast(schema)
        return _to_arrow(out, schema)

    def inner_scan_arrow(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        is_first = is_last = None
        for k in keys:
            col = batch.column(k)
            f = pc.equal(col, col[0])
            l = pc.equal(col, col[n - 1])
            is_first = f if is_first is None else pc.and_(is_first, f)
            is_last = l if is_last is None else pc.and_(is_last, l)
        inner = batch.filter(pc.invert(pc.or_(is_first, is_last)))
        if inner.num_rows == 0:
            return schema.empty_table()
        return _result_to_arrow(block_fn(inner))

    def edge_apply_arrow(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        return _result_to_arrow(block_fn(batch))

    def _valid_mask(batch: pa.Table):
        m = None
        for k in keys:
            iv = pc.is_valid(batch.column(k))
            m = iv if m is None else pc.and_(m, iv)
        return m

    def guard(batch: pa.Table) -> pa.Table:
        m = _valid_mask(batch)
        if null_keys == "error":
            bad = batch.num_rows - (pc.sum(m).as_py() or 0)
            if bad:
                raise ValueError(
                    f"sorted_map_groups: {bad} row(s) with null group "
                    f"key(s) {keys} — pre-filter them, or pass "
                    f"null_keys='drop'/'separate'")
            return batch
        return batch.filter(m)

    def keep_nulls(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(_valid_mask(batch)))

    scan, edge, fmt = ((inner_scan_arrow, edge_apply_arrow, "pyarrow")
                       if arrow_blocks else
                       (inner_scan, edge_apply, "pandas"))
    sorted_ds = ds.map_batches(guard, batch_format="pyarrow") \
                  .sort(keys).materialize()
    inner_ds = sorted_ds.map_batches(scan, batch_format=fmt,
                                     batch_size=None)
    edge_ds = (sorted_ds
               .map_batches(edge_filter, batch_format="pyarrow",
                            batch_size=None)
               .repartition(1)
               .map_batches(edge, batch_format=fmt, batch_size=None))
    out = inner_ds.union(edge_ds)
    if null_keys == "separate":
        null_ds = (ds.map_batches(keep_nulls, batch_format="pyarrow")
                   .repartition(1)
                   .map_batches(edge, batch_format=fmt, batch_size=None))
        out = out.union(null_ds)
    return out
