"""Greedy sequence packing — the standard LLM-pretraining data op that
concatenates documents into fixed token-budget training sequences ("bins")
with minimal padding.

Semantics (deterministic, so it is exactly SQL-mirrorable): within each
``group_key`` partition, documents are taken in ``order_key`` order and
packed first-fit-in-order — a document opens a new bin iff the current bin
is non-empty and would overflow ``capacity``; a document longer than
``capacity`` therefore gets a bin of its own (callers truncate/split
upstream if that is not wanted).  This per-group scoping is deliberate and
is how packing runs at 100 TB: bins never need GLOBAL sequential numbering,
only per-shard numbering (bin identity = group + local index), so each
group packs independently and in parallel — the classic per-shard packing
of large training-data pipelines.  The sequential scan a greedy packer
fundamentally requires is confined to one group on one worker.

Ray shape: token counts are vectorized (pyarrow RE2 count over ``\\S+``,
the corpus tokenizer used across this repo), then ONE sort by group routes
whole groups through :func:`stages.blockgroup.sorted_map_groups`'s
``block_fn`` path; inside a group the packer is O(#bins) numpy
``searchsorted`` steps over the group's cumulative token counts — each
step closes one maximal bin — not O(#docs) Python iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import TOKEN_RE


def _pack_group(n_tokens: np.ndarray, capacity: int):
    """Greedy first-fit-in-order over one group's in-order token counts.
    Returns (bin_id, bin_offset) arrays.  Each loop iteration closes one
    bin via binary search on the cumulative sum (maximal prefix that
    fits), so the Python loop count is the number of bins, not rows."""
    m = len(n_tokens)
    cs = np.cumsum(n_tokens, dtype=np.int64)
    bin_id = np.empty(m, dtype=np.int64)
    offset = np.empty(m, dtype=np.int64)
    start, b = 0, 0
    while start < m:
        base = cs[start - 1] if start else 0
        j = int(np.searchsorted(cs, base + capacity, side="right")) - 1
        if j < start:           # single doc longer than capacity
            j = start
        bin_id[start:j + 1] = b
        offset[start:j + 1] = cs[start:j + 1] - n_tokens[start:j + 1] - base
        b += 1
        start = j + 1
    return bin_id, offset


def pack_sequences(docs_ds, *, capacity: int, group_key: str = "lang",
                   order_key: str = "doc_id", text_col: str = "text"):
    """documents -> one row per doc: (order_key, group_key, n_tokens,
    pack_bin, bin_offset), where ``pack_bin`` is the per-group bin index
    and ``bin_offset`` the token offset of the doc inside its bin."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    from .blockgroup import sorted_map_groups

    def count_tokens(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(
            batch.column(text_col), TOKEN_RE).cast(pa.int64())
        return pa.Table.from_arrays(
            [batch.column(order_key), batch.column(group_key), n_tok],
            names=[order_key, group_key, "n_tokens"])

    schema = pa.schema([
        (order_key, docs_ds.schema().types[
            docs_ds.schema().names.index(order_key)]),
        (group_key, docs_ds.schema().types[
            docs_ds.schema().names.index(group_key)]),
        ("n_tokens", pa.int64()),
        ("pack_bin", pa.int64()),
        ("bin_offset", pa.int64()),
    ])

    def pack_block(df: pd.DataFrame) -> pd.DataFrame:
        # whole groups per block; order within a group is NOT guaranteed
        # by the grouping sort — impose it here
        df = df.sort_values([group_key, order_key], kind="mergesort",
                            ignore_index=True)
        n = df["n_tokens"].to_numpy()
        # group segment boundaries over the sorted frame
        keys = df[group_key].to_numpy()
        seg_starts = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]]))
        bins = np.empty(len(df), dtype=np.int64)
        offs = np.empty(len(df), dtype=np.int64)
        for s, e in zip(seg_starts,
                        np.append(seg_starts[1:], len(df))):
            bins[s:e], offs[s:e] = _pack_group(n[s:e], capacity)
        df["pack_bin"] = bins
        df["bin_offset"] = offs
        return df

    counted = docs_ds.map_batches(count_tokens, batch_format="pyarrow")
    return sorted_map_groups(counted, [group_key], block_fn=pack_block,
                             schema=schema)
