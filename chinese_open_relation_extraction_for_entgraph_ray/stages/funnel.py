"""Ordered multi-stage funnel over an event stream.

Classic product-analytics operator: given an ordered stage list (e.g.
view -> click -> purchase), compute for every user the deepest stage
reached IN ORDER — stage i+1 counts only if it happens at-or-after the
user's first qualifying stage-i event (``ts`` comparison, >=).  The
per-stage user counts then follow from one tiny aggregate.

Shape at scale: ONE sort exchange by user (via ``sorted_map_groups``),
then a per-block pass that is vectorized ACROSS users — per stage, a
boolean filter + grouped min over the whole block (O(stages x rows), no
per-user Python loop).  No driver-side state; the funnel-depth table
streams out one row per user.

The reference has no analog (transcript-side it never windows events);
this is part of the events-family coverage alongside sessionization
(``events_sessions``) and as-of attribution
(``events_purchase_attribution``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .blockgroup import arrow_type_of, sorted_map_groups


def funnel_depths(events_ds, *, user_col: str, ts_col: str, type_col: str,
                  stages: list[str]):
    """events -> (user_col, depth) Dataset; depth in [0, len(stages)] is
    the number of consecutive stages completed in order (first event of
    stage k must have ts >= the user's chosen ts of stage k-1, where the
    chosen ts is the MINIMUM qualifying one — the greedy earliest-chain
    rule, which maximizes depth for >= ordering)."""
    if not stages:
        raise ValueError("need at least one stage")

    schema = pa.schema([(user_col, arrow_type_of(events_ds, user_col)),
                        ("depth", pa.int32())])

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.unique(df[user_col])
        depth = pd.Series(np.zeros(len(users), dtype=np.int32),
                          index=users)
        # cur[u] = ts threshold for the next stage (first-qualifying of
        # the previous stage); starts unconstrained at stage 0
        cur = None
        for i, s in enumerate(stages):
            rows = df[df[type_col] == s]
            if cur is not None:
                thr = rows[user_col].map(cur)
                rows = rows[thr.notna() & (rows[ts_col] >= thr)]
            if len(rows) == 0:
                break
            nxt = rows.groupby(user_col, sort=False)[ts_col].min()
            depth.loc[nxt.index] = i + 1
            cur = nxt
        return pd.DataFrame({user_col: depth.index.to_numpy(),
                             "depth": depth.to_numpy()})

    return sorted_map_groups(
        events_ds.select_columns([user_col, ts_col, type_col]),
        [user_col], block_fn=block_fn, schema=schema)


def funnel_stage_counts(events_ds, *, user_col: str, ts_col: str,
                        type_col: str, stages: list[str]):
    """(stage, stage_idx, n_users) — n_users = users whose ordered funnel
    depth reaches that stage.  The depth table (one row per user) flows
    through a pre-combined count-per-depth exchange (<= len(stages)+1
    groups), and the cumulative step runs over that constant-size
    table."""
    from .groupagg import auto_hash_aggregate

    depths = funnel_depths(events_ds, user_col=user_col, ts_col=ts_col,
                           type_col=type_col, stages=stages)

    def ones(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("depth").cast(pa.int32()),
             pa.array(np.ones(len(t), dtype=np.int64))],
            names=["depth", "n"])

    hist = auto_hash_aggregate(
        depths.map_batches(ones, batch_format="pyarrow"),
        ["depth"], [("n", "sum")]).to_pandas()   # <= len(stages)+1 rows

    counts = np.zeros(len(stages), dtype=np.int64)
    for _, row in hist.iterrows():
        d = int(row["depth"])
        counts[:d] += int(row["n"])   # reaching depth d reaches 1..d
    return pa.table({
        "stage": pa.array(stages, pa.string()),
        "stage_idx": pa.array(np.arange(1, len(stages) + 1,
                                        dtype=np.int64)),
        "n_users": pa.array(counts),
    })
