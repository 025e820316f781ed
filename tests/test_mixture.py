"""Domain-mixture resampling (stages/mixture.py): quota arithmetic and the
distributed selection vs a single-process reference."""

import numpy as np

from chinese_open_relation_extraction_for_entgraph_ray.stages.mixture import (
    mixture_quotas,
)


def test_mixture_quotas_arithmetic():
    counts = {"en": 218, "zh": 75, "de": 70, "fr": 64, "es": 73}
    target = {"en": 0.4, "zh": 0.2, "de": 0.2, "fr": 0.1, "es": 0.1}
    q = mixture_quotas(counts, target)
    # N = floor(min(545, 375, 350, 640, 730)) = 350
    assert q == {"en": 140, "zh": 70, "de": 70, "fr": 35, "es": 35}
    # no group exceeds its count; proportions match the target at N
    assert all(q[g] <= counts[g] for g in q)


def test_mixture_quotas_missing_group_zeroes_everything():
    q = mixture_quotas({"en": 100}, {"en": 0.5, "xx": 0.5})
    assert q == {"en": 0, "xx": 0}          # xx count 0 -> N = 0


def test_mixture_quotas_zero_weight_dropped():
    q = mixture_quotas({"en": 100, "zh": 50}, {"en": 1.0, "zh": 0.0})
    assert q == {"en": 100}
    assert mixture_quotas({"en": 9}, {}) == {}


def test_resample_to_mixture_selection(ray_session):
    """Per-group output is exactly the quota-many smallest (rank, id) rows,
    groups outside the target dropped, null group keys dropped."""
    import pyarrow as pa
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.mixture import (
        resample_to_mixture,
    )

    rng = np.random.RandomState(3)
    rows = []
    for g, n in (("a", 40), ("b", 25), ("c", 10)):   # c not in target
        for i in range(n):
            rows.append({"grp": g, "id": len(rows),
                         "rank": f"{rng.randint(0, 10**9):012d}"})
    rows.append({"grp": None, "id": 999, "rank": "0" * 12})
    target = {"a": 0.6, "b": 0.4}
    # N = floor(min(40/.6, 25/.4)) = floor(min(66.66, 62.5)) = 62
    # quotas: a = floor(62*.6) = 37, b = floor(62*.4) = 24
    ds = rd.from_items(rows).repartition(5)
    out = resample_to_mixture(
        ds, group_col="grp", target=target, rank_col="rank", id_col="id",
        schema=pa.schema([("grp", pa.string()), ("id", pa.int64())])) \
        .to_pandas()
    got = {g: sorted(sub["id"]) for g, sub in out.groupby("grp")}
    exp = {}
    for g, q in (("a", 37), ("b", 24)):
        members = sorted((r["rank"], r["id"]) for r in rows
                         if r["grp"] == g)
        exp[g] = sorted(i for _, i in members[:q])
    assert got == exp
    assert "c" not in got and len(out) == 61
