"""CDC compaction, SCD2 history and the keyed interval join.

Hand-worked fixtures; hash parity against DuckDB runs in the full gate
(events_latest_state / events_scd2_history / events_purchase_followup).
"""

import pandas as pd
import pyarrow as pa


def _mutations():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "t": pa.array([10, 30, 20, 5, 6, 1], pa.int64()),
        "seq": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "op": pa.array(["up", "up", "up", "up", "del", "del"], pa.string()),
        "v": pa.array([1.0, 3.0, 2.0, 9.0, 0.0, 0.0], pa.float64()),
    }))


def test_latest_state_keeps_max_order_and_drops_tombstones(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.cdc import (
        latest_state,
    )

    out = latest_state(_mutations(), key="k", order=["t", "seq"],
                       op_col="op", delete_value="del",
                       payload=["v"]).to_pandas()
    # k=1: latest by t is (t=30, v=3.0) upsert -> kept
    # k=2: latest (t=6) is a delete -> key dropped even though an earlier
    #       upsert exists; k=3: only op is a delete -> dropped
    assert len(out) == 1
    row = out.iloc[0]
    assert (int(row["k"]), int(row["t"]), float(row["v"])) == (1, 30, 3.0)


def test_latest_state_order_tiebreak(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.cdc import (
        latest_state,
    )

    ds = rd.from_arrow(pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "t": pa.array([10, 10], pa.int64()),
        "seq": pa.array([2, 1], pa.int64()),
        "op": pa.array(["up", "del"], pa.string()),
        "v": pa.array([5.0, 0.0], pa.float64()),
    }))
    out = latest_state(ds, key="k", order=["t", "seq"], op_col="op",
                       delete_value="del", payload=["v"]).to_pandas()
    # equal t: seq breaks the tie, and seq=2 is the upsert -> survives
    assert len(out) == 1 and int(out.iloc[0]["seq"]) == 2


def test_scd2_history_chain(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.cdc import (
        scd2_history,
    )

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "t": pa.array([10, 30, 20, 7], pa.int64()),
        "seq": pa.array([0, 1, 2, 3], pa.int64()),
        "v": pa.array([1.0, 3.0, 2.0, 9.0], pa.float64()),
    }))
    out = scd2_history(ds, key="k", ts="t", tiebreak=["seq"],
                       payload=["v"]).to_pandas()
    out = out.sort_values(["k", "valid_from"]).reset_index(drop=True)
    assert len(out) == 4
    # k=1 versions chain 10 -> 20 -> 30; the last is current (null valid_to)
    k1 = out[out["k"] == 1]
    assert list(k1["valid_from"]) == [10, 20, 30]
    assert list(k1["valid_to"])[:2] == [20, 30]
    assert pd.isna(list(k1["valid_to"])[2])
    assert list(k1["is_current"]) == [False, False, True]
    k2 = out[out["k"] == 2].iloc[0]
    assert pd.isna(k2["valid_to"]) and bool(k2["is_current"])


def test_interval_join_overlapping_windows(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.joins import (
        interval_join,
    )

    left = rd.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "p": pa.array([5, 15, 25, 5], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "c"], pa.string()),
        "s": pa.array([0, 10, 0], pa.int64()),
        "e": pa.array([20, 30, 99], pa.int64()),
        "w": pa.array([100, 200, 999], pa.int64()),
    }))
    out = interval_join(left, right, by="k", point="p", start="s", end="e",
                        right_payload=["w"]).to_pandas()
    pairs = sorted((int(r["lid"]), int(r["w_right"]))
                   for _, r in out.iterrows())
    # p=5 only in [0,20); p=15 in BOTH overlapping windows; p=25 only in
    # [10,30); key b has no windows; end is exclusive throughout
    assert pairs == [(1, 100), (2, 100), (2, 200), (3, 200)]
