"""Unit tests for the round-4 additions: ROLLUP aggregate, exact grouped
quantiles, ordered funnel, SemDeDup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


# --- rollup ------------------------------------------------------------------

def _rollup_expected(df, keys, val):
    """pandas reference: every key prefix + grand total, nulls for
    dropped keys."""
    frames = []
    for n in range(len(keys), 0, -1):
        g = df.groupby(keys[:n], as_index=False).agg(
            total=(val, "sum"), n=(val, "size"))
        for k in keys[n:]:
            g[k] = None
        frames.append(g[keys + ["total", "n"]])
    gt = pd.DataFrame([{**{k: None for k in keys},
                        "total": df[val].sum(), "n": len(df)}])
    return pd.concat(frames + [gt], ignore_index=True)


def test_rollup_matches_pandas(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.rollup import (
        rollup_aggregate,
    )

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 200),
        "b": rng.choice(["p", "q"], 200),
        "v": rng.randint(0, 100, 200).astype("int64"),
    })
    got = rollup_aggregate(_ds(df), ["a", "b"], [("v", "sum")],
                           count_as="n").to_pandas()
    exp = _rollup_expected(df, ["a", "b"], "v").rename(
        columns={"total": "v"})
    key = ["a", "b"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    exp = exp.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(got) == len(exp) == 3 * 2 + 3 + 1
    for c in ["a", "b"]:
        assert [x if pd.notna(x) else None for x in got[c]] \
            == [x if pd.notna(x) else None for x in exp[c]]
    assert got["v"].astype("int64").tolist() == exp["v"].tolist()
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()


def test_rollup_min_max_and_validation(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.rollup import (
        rollup_aggregate,
    )

    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [3.0, 1.0, 9.0]})
    got = rollup_aggregate(_ds(df), ["k"], [("v", "min")]).to_pandas()
    by_key = {(None if pd.isna(r["k"]) else r["k"]): r["v"]
              for _, r in got.iterrows()}
    assert by_key == {"a": 1.0, "b": 9.0, None: 1.0}
    with pytest.raises(ValueError):
        rollup_aggregate(_ds(df), [], [("v", "sum")])
    with pytest.raises(ValueError):
        rollup_aggregate(_ds(df), ["k"], [("v", "mean")])


# --- exact grouped quantiles --------------------------------------------------

def test_grouped_quantiles_matches_quantile_disc(ray_session):
    import duckdb

    from chinese_open_relation_extraction_for_entgraph_ray.stages.quantile_exact import (
        grouped_quantiles,
    )

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 500),
        "v": rng.standard_normal(500) * 100,
    })
    # group with a single row + nulls mixed in
    df.loc[df.index[:5], "v"] = np.nan
    df = pd.concat([df, pd.DataFrame({"k": ["solo"], "v": [42.0]})],
                   ignore_index=True)
    got = grouped_quantiles(_ds(df), "k", "v", [0.25, 0.5, 0.75, 1.0],
                            out_names=["p25", "p50", "p75", "p100"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        SELECT k, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.5) p50,
               quantile_disc(v, 0.75) p75, quantile_disc(v, 1.0) p100
        FROM df GROUP BY k ORDER BY k""").df()
    assert got["k"].tolist() == exp["k"].tolist()
    for c in ["p25", "p50", "p75", "p100"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())


def test_grouped_quantiles_all_null_group(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.quantile_exact import (
        grouped_quantiles,
    )

    df = pd.DataFrame({"k": ["a", "a", "nullgrp"],
                       "v": [1.0, 2.0, np.nan]})
    got = grouped_quantiles(_ds(df), "k", "v", [0.5]).to_pandas() \
        .set_index("k")["p50"]
    assert got["a"] == 1.0            # ceil(0.5*2)-1 = index 0
    assert np.isnan(got["nullgrp"])


# --- funnel -------------------------------------------------------------------

def _brute_depth(events, stages):
    """Single-user reference: greedy earliest-chain depth."""
    thr = None
    depth = 0
    for s in stages:
        cand = [ts for typ, ts in events
                if typ == s and (thr is None or ts >= thr)]
        if not cand:
            break
        thr = min(cand)
        depth += 1
    return depth


def test_funnel_depths_match_bruteforce(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.funnel import (
        funnel_depths,
    )

    rng = np.random.RandomState(3)
    stages = ["view", "click", "purchase"]
    rows = []
    for u in range(40):
        for _ in range(rng.randint(1, 12)):
            rows.append({
                "user_id": u,
                "ts": pd.Timestamp("2026-01-01")
                + pd.Timedelta(seconds=int(rng.randint(0, 10000))),
                "event_type": rng.choice(
                    ["view", "click", "purchase", "error"]),
            })
    df = pd.DataFrame(rows)
    got = funnel_depths(_ds(df), user_col="user_id", ts_col="ts",
                        type_col="event_type", stages=stages) \
        .to_pandas().set_index("user_id")["depth"]
    for u, grp in df.groupby("user_id"):
        ev = list(zip(grp["event_type"], grp["ts"]))
        assert got[u] == _brute_depth(ev, stages), f"user {u}"


def test_funnel_stage_counts_cumulative(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.funnel import (
        funnel_stage_counts,
    )

    t0 = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 4],
        "ts": [t0, t0 + pd.Timedelta("1s"), t0 + pd.Timedelta("2s"),
               t0, t0 + pd.Timedelta("1s"),
               t0 + pd.Timedelta("5s"),
               t0],
        "event_type": ["view", "click", "purchase",
                       "view", "click",
                       "view",
                       "purchase"],   # user 4: purchase without view
    })
    got = funnel_stage_counts(
        _ds(df), user_col="user_id", ts_col="ts", type_col="event_type",
        stages=["view", "click", "purchase"]).to_pandas()
    assert got["stage"].tolist() == ["view", "click", "purchase"]
    assert got["n_users"].tolist() == [3, 2, 1]


def test_funnel_order_matters(ray_session):
    """A purchase BEFORE the click must not count as stage 3."""
    from chinese_open_relation_extraction_for_entgraph_ray.stages.funnel import (
        funnel_depths,
    )

    t0 = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [t0 + pd.Timedelta("2s"), t0 + pd.Timedelta("3s"), t0],
        "event_type": ["view", "click", "purchase"],
    })
    got = funnel_depths(_ds(df), user_col="user_id", ts_col="ts",
                        type_col="event_type",
                        stages=["view", "click", "purchase"]).to_pandas()
    assert got["depth"].tolist() == [2]


# --- semdedup ------------------------------------------------------------------

def test_semdedup_planted_duplicates(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.semdedup import (
        semdedup,
    )

    rng = np.random.RandomState(5)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    # plant: vecs 100/101 duplicate vec 0; vec 102 duplicates vec 3
    vecs = list(base)
    ids = list(range(60))
    for dup_id, src in [(100, 0), (101, 0), (102, 3)]:
        vecs.append(base[src])
        ids.append(dup_id)
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    out = semdedup(ds, threshold=0.999, n_clusters=4).to_pandas() \
        .set_index("vec_id")
    assert len(out) == 63
    # identical vectors share a cluster; min id survives, clones drop
    assert not out.loc[100, "keep"] and not out.loc[101, "keep"]
    assert not out.loc[102, "keep"]
    assert out.loc[0, "keep"] and out.loc[3, "keep"]
    # everyone else survives at this near-1 threshold
    assert out["keep"].sum() == 60


def test_semdedup_no_dups_short_circuit(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.semdedup import (
        semdedup,
    )

    rng = np.random.RandomState(9)
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array(
            [list(map(float, rng.standard_normal(8))) for _ in range(50)],
            pa.list_(pa.float32())),
    }))
    out = semdedup(ds, threshold=0.9999, n_clusters=4).to_pandas()
    assert len(out) == 50 and out["keep"].all()


# --- pivot --------------------------------------------------------------------

def test_pivot_counts_matches_pandas(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.pivot import (
        pivot_counts,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "k": rng.randint(0, 20, 300),
        "c": rng.choice(["x", "y", "z", "other"], 300),
    })
    got = pivot_counts(_ds(df), "k", "c", ["x", "y", "z"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.assign(**{f"n_{v}": (df["c"] == v).astype("int64")
                       for v in ["x", "y", "z"]}, n_total=1) \
        .groupby("k", as_index=False)[["n_x", "n_y", "n_z", "n_total"]] \
        .sum().sort_values("k").reset_index(drop=True)
    for c in ["n_x", "n_y", "n_z", "n_total"]:
        assert got[c].astype("int64").tolist() == exp[c].tolist(), c
    # 'other' rows count only toward the total
    assert (got["n_total"] >= got[["n_x", "n_y", "n_z"]].sum(axis=1)).all()
    with pytest.raises(ValueError):
        pivot_counts(_ds(df), "k", "c", [])


def test_pivot_counts_null_col_rows(ray_session):
    from chinese_open_relation_extraction_for_entgraph_ray.stages.pivot import (
        pivot_counts,
    )

    df = pd.DataFrame({"k": [1, 1, 2], "c": ["x", None, "x"]})
    got = pivot_counts(_ds(df), "k", "c", ["x"]).to_pandas() \
        .set_index("k")
    assert got.loc[1, "n_x"] == 1 and got.loc[1, "n_total"] == 2
    assert got.loc[2, "n_x"] == 1 and got.loc[2, "n_total"] == 1


# --- winsorized mean ------------------------------------------------------------

def test_winsorized_mean_matches_duckdb(ray_session):
    import duckdb

    from chinese_open_relation_extraction_for_entgraph_ray.stages.quantile_exact import (
        winsorized_mean,
    )

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 400),
        "v": np.concatenate([rng.standard_normal(398) * 10,
                             [1e6, -1e6]]),   # outliers the clamp removes
    })
    import ray.data as rd

    # arrow-backed input: the join path requires Arrow types in the schema
    got = winsorized_mean(rd.from_arrow(pa.Table.from_pandas(df)),
                          "k", "v", lo_q=0.05, hi_q=0.95) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        WITH q AS (SELECT k, quantile_disc(v, 0.05) lo,
                          quantile_disc(v, 0.95) hi FROM df GROUP BY k)
        SELECT d.k, round(avg(least(greatest(d.v, q.lo), q.hi)), 4)
                   AS avg_winsorized,
               count(*) AS n
        FROM df d JOIN q USING (k) GROUP BY d.k ORDER BY d.k""").df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got["avg_winsorized"], exp["avg_winsorized"],
                               atol=1e-9)
    # the outliers must not dominate: winsorized mean is near 0, raw isn't
    assert got["avg_winsorized"].abs().max() < 20
