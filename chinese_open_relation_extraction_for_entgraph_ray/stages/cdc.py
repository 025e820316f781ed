"""Change-data-capture compaction and slowly-changing-dimension history.

A 100-TB ingest feed is rarely append-only: upstream systems emit streams of
keyed mutations (upserts + tombstones) that must be compacted to
latest-state before any downstream analytics, and audited as versioned
history (SCD type 2) when the pipeline needs to answer "what was the value
as of t".  Both operators here are grouped-per-key computations expressed on
the shared ``sorted_map_groups`` exchange (stages/blockgroup.py):

- ``latest_state``: pre-combine inside ``map_batches`` (keep at most one row
  per key per block) BEFORE the keyed exchange, so the sort moves at most
  one row per key per input block rather than the full mutation log — the
  same partial-aggregate trick as the exact-dedup combiner
  (stages/dedup.py).  Tombstones (``op_col == delete_value``) are kept
  through the combine (a delete can be the latest op) and dropped only at
  the end.
- ``scd2_history``: one sort per key, vectorized ``shift(-1)`` per key group
  for the ``valid_to`` chain — O(rows), no per-group Python.

Partitioning assumption (inherited from sorted_map_groups): one key's
mutation history fits in a worker heap AFTER per-block pre-combine — i.e.
at most #blocks rows per key, independent of how hot the key is in the raw
log.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .blockgroup import sorted_map_groups


def latest_state(ds, *, key: str, order: list[str], op_col: str,
                 delete_value: str, payload: list[str]):
    """Compact a keyed mutation log to current state: per ``key``, keep the
    row with the greatest ``order`` tuple; drop the key entirely when that
    latest row is a tombstone (``op_col == delete_value``).

    Returns a Dataset with columns ``[key] + order + [op_col] + payload``
    (one row per surviving key).
    """
    cols = [key] + order + [op_col] + payload

    def last_per_key(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key] + order, kind="mergesort")
        return g.groupby(key, sort=False).tail(1)

    schema_src = ds.schema()
    types = dict(zip(schema_src.names, schema_src.types))
    out_schema = pa.schema([(c, types[c]) for c in cols])

    def precombine(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        return pa.Table.from_pandas(last_per_key(df)[cols],
                                    schema=out_schema, preserve_index=False)

    combined = ds.map_batches(precombine, batch_format="pyarrow")

    def finish_block(df: pd.DataFrame) -> pd.DataFrame:
        latest = last_per_key(df)
        return latest[latest[op_col] != delete_value][cols]

    return sorted_map_groups(combined, [key], block_fn=finish_block,
                             schema=out_schema)


def scd2_history(ds, *, key: str, ts: str, tiebreak: list[str],
                 payload: list[str]):
    """Slowly-changing-dimension type-2 history: each mutation becomes a
    version row valid from its own timestamp until the key's next mutation
    (``valid_to`` null on the key's current version, ``is_current`` true).

    Returns ``[key] + tiebreak + payload + [valid_from, valid_to,
    is_current]``; ``valid_from``/``valid_to`` keep ``ts``'s Arrow type.
    """
    schema_src = ds.schema()
    types = dict(zip(schema_src.names, schema_src.types))
    out_cols = [key] + tiebreak + payload
    out_schema = pa.schema(
        [(c, types[c]) for c in out_cols]
        + [("valid_from", types[ts]), ("valid_to", types[ts]),
           ("is_current", pa.bool_())])

    def version_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key, ts] + tiebreak,
                           kind="mergesort").reset_index(drop=True)
        nxt = g.groupby(key, sort=False)[ts].shift(-1)
        out = g[out_cols].copy()
        out["valid_from"] = g[ts]
        out["valid_to"] = nxt
        out["is_current"] = nxt.isna()
        return out

    return sorted_map_groups(ds, [key], block_fn=version_block,
                             schema=out_schema)
