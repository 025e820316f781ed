"""Distributional predicate similarity (stages/entgraph.py) — the
Entailment-Graph local score the reference's triple corpus feeds
(reference README.md:3-9): brute-force parity, hub-feature capping,
and the min_shared prune."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from chinese_open_relation_extraction_for_entgraph_ray.stages.entgraph import (
    entailment_scores,
    predicate_similarity,
)


def _brute(df: pd.DataFrame, min_shared: int = 1,
           drop_features: set | None = None) -> pd.DataFrame:
    feat = (df.groupby(["pred", "subj", "obj"]).size()
            .rename("cnt").reset_index())
    # norms always use the FULL vector (the engine's one-sided cap
    # convention); drop_features only removes pair-emission features
    vec = {p: {(r.subj, r.obj): r.cnt for r in g.itertuples()}
           for p, g in feat.groupby("pred")}
    rows = []
    for a, b in itertools.combinations(sorted(vec), 2):
        shared = set(vec[a]) & set(vec[b]) - (drop_features or set())
        if len(shared) < max(min_shared, 1):
            continue
        dot = int(sum(vec[a][f] * vec[b][f] for f in shared))
        na = np.sqrt(float(sum(c * c for c in vec[a].values())))
        nb = np.sqrt(float(sum(c * c for c in vec[b].values())))
        c = dot / (na * nb)
        rows.append((a, b, len(shared), dot,
                     float(np.sign(c) * np.floor(abs(c) * 1e4 + 0.5) / 1e4)))
    return (pd.DataFrame(rows, columns=["pred_a", "pred_b", "n_shared",
                                        "dot", "cosine"])
            .sort_values(["pred_a", "pred_b"]).reset_index(drop=True))


def _random_triples(n=600, n_preds=7, n_ents=9, seed=11) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(n):
        p = f"p{rng.randint(n_preds)}"
        a, b = sorted(rng.choice(n_ents, 2, replace=False))
        rows.append((p, f"e{a}", f"e{b}"))
    return pd.DataFrame(rows, columns=["pred", "subj", "obj"])


def _run(df, **kw) -> pd.DataFrame:
    out = predicate_similarity(rd.from_pandas(df), **kw).to_pandas()
    if out.empty:   # Ray's to_pandas drops columns on an empty Dataset
        out = pd.DataFrame(columns=["pred_a", "pred_b", "n_shared",
                                    "dot", "cosine"])
    return (out.sort_values(["pred_a", "pred_b"])
            .reset_index(drop=True)[["pred_a", "pred_b", "n_shared",
                                     "dot", "cosine"]])


def test_matches_brute_force(ray_session):
    df = _random_triples()
    got = _run(df)
    exp = _brute(df)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_min_shared_prunes(ray_session):
    df = _random_triples(seed=13)
    got = _run(df, min_shared=3)
    exp = _brute(df, min_shared=3)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert (got["n_shared"] >= 3).all()


def test_max_feature_df_drops_hub_pairs(ray_session):
    """Two predicates sharing ONLY a hub argument pair disappear under the
    cap; everything else matches brute force with that feature removed."""
    df = _random_triples(n=200, n_preds=4, seed=17)
    # qA and qB share only the hub pair, seen with every predicate
    hub = [(p, "hubS", "hubT") for p in
           ["qA", "qB", "p0", "p1", "p2", "p3"]]
    df = pd.concat([df, pd.DataFrame(hub, columns=df.columns)],
                   ignore_index=True)
    uncapped = _run(df)
    assert {("qA", "qB")} <= set(zip(uncapped["pred_a"],
                                     uncapped["pred_b"]))
    capped = _run(df, max_feature_df=5)   # hub df = 6 > 5
    assert ("qA", "qB") not in set(zip(capped["pred_a"],
                                       capped["pred_b"]))
    exp = _brute(df, drop_features={("hubS", "hubT")})
    pd.testing.assert_frame_equal(
        capped, exp.astype(capped.dtypes.to_dict()))


def test_empty_and_degenerate(ray_session):
    # no predicate pair shares a feature -> empty output
    df = pd.DataFrame({"pred": ["a", "b"], "subj": ["x", "y"],
                       "obj": ["u", "v"]})
    assert _run(df).empty
    # a single predicate -> no pairs
    df1 = pd.DataFrame({"pred": ["a"] * 3, "subj": list("xyz"),
                        "obj": list("uvw")})
    assert _run(df1).empty


def _round4(x: float) -> float:
    return float(np.sign(x) * np.floor(abs(x) * 1e4 + 0.5) / 1e4)


def _brute_entailment(df: pd.DataFrame, min_shared: int = 1) -> pd.DataFrame:
    feat = (df.groupby(["pred", "subj", "obj"]).size()
            .rename("cnt").reset_index())
    vec = {p: {(r.subj, r.obj): r.cnt for r in g.itertuples()}
           for p, g in feat.groupby("pred")}
    tot = {p: sum(v.values()) for p, v in vec.items()}
    rows = []
    for a, b in itertools.combinations(sorted(vec), 2):
        shared = set(vec[a]) & set(vec[b])
        if len(shared) < max(min_shared, 1):
            continue
        sa = sum(vec[a][f] for f in shared)
        sb = sum(vec[b][f] for f in shared)
        w_ab, w_ba = sa / tot[a], sb / tot[b]
        lin = (sa + sb) / (tot[a] + tot[b])
        rows.append((a, b, len(shared), _round4(w_ab), _round4(w_ba),
                     _round4(lin), _round4(np.sqrt(lin * w_ab)),
                     _round4(np.sqrt(lin * w_ba))))
    return (pd.DataFrame(rows, columns=["pred_a", "pred_b", "n_shared",
                                        "weeds_ab", "weeds_ba", "lin",
                                        "binc_ab", "binc_ba"])
            .sort_values(["pred_a", "pred_b"]).reset_index(drop=True))


def test_entailment_matches_brute_force(ray_session):
    df = _random_triples(seed=23)
    got = (entailment_scores(rd.from_pandas(df)).to_pandas()
           .sort_values(["pred_a", "pred_b"]).reset_index(drop=True)
           [["pred_a", "pred_b", "n_shared", "weeds_ab", "weeds_ba",
             "lin", "binc_ab", "binc_ba"]])
    exp = _brute_entailment(df)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_entailment_directionality(ray_session):
    """A predicate whose ENTIRE vector is shared scores WeedsPrec = 1 in
    its direction (the textbook inclusion case: 'p entails q' when p's
    contexts are a subset of q's), while the broader predicate scores
    below 1 in the reverse direction."""
    narrow = pd.DataFrame({"pred": ["nar"] * 2, "subj": ["s1", "s2"],
                           "obj": ["o1", "o2"]})
    broad = pd.DataFrame({"pred": ["brd"] * 4,
                          "subj": ["s1", "s2", "s3", "s4"],
                          "obj": ["o1", "o2", "o3", "o4"]})
    out = entailment_scores(
        rd.from_pandas(pd.concat([narrow, broad], ignore_index=True))
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["pred_a"], row["pred_b"]) == ("brd", "nar")
    assert row["weeds_ba"] == 1.0          # nar -> brd : full inclusion
    assert row["weeds_ab"] == 0.5          # brd -> nar : half the mass
    assert row["lin"] == pytest.approx(4 / 6, abs=1e-4)
    assert row["binc_ba"] > row["binc_ab"]


def test_entailment_empty(ray_session):
    df = pd.DataFrame({"pred": ["a", "b"], "subj": ["x", "y"],
                       "obj": ["u", "v"]})
    assert entailment_scores(rd.from_pandas(df)).count() == 0


def test_duplicate_triples_raise_counts(ray_session):
    """Duplicate triple occurrences are weights: doubling every (qX, f)
    row doubles the dot but leaves the cosine invariant."""
    base = pd.DataFrame(
        {"pred": ["qX", "qY"] * 3,
         "subj": ["s1", "s1", "s2", "s2", "s3", "s3"],
         "obj": ["o1", "o1", "o2", "o2", "o3", "o3"]})
    once = _run(base)
    twice = _run(pd.concat([base, base], ignore_index=True))
    assert once.loc[0, "dot"] * 4 == twice.loc[0, "dot"]
    assert once.loc[0, "cosine"] == pytest.approx(
        twice.loc[0, "cosine"], abs=1e-4)
