"""Unit tests for stages/entity_resolution.py — blocking + byte-Levenshtein
verification + min-string CC canonicalization.  The SQL parity of the full
query lives in the driver gate (transcripts_entity_resolution); these pin
the stage semantics on hand-checkable fixtures."""

import logging

import pytest
import ray.data as rd

from chinese_open_relation_extraction_for_entgraph_ray.stages.entity_resolution import (
    resolve_entities,
)


def _resolve(strings, **kw):
    ds = rd.from_items([{"entity": s} for s in strings])
    df = resolve_entities(ds, **kw).to_pandas()
    return {r.entity: (r.canonical, r.cluster_size)
            for r in df.itertuples(index=False)}


def test_planted_variants_resolve_to_min_string(ray_session):
    # prefix variant co-blocks via the suffix key, suffix variant via the
    # prefix key; 北京 is the UTF-8-minimum member of its cluster
    got = _resolve(["北京", "北京·", "老北京", "上海"])
    assert got["北京"] == ("北京", 3)
    assert got["北京·"] == ("北京", 3)
    assert got["老北京"] == ("北京", 3)
    assert got["上海"] == ("上海", 1)


def test_singletons_and_above_threshold_pairs(ray_session):
    # share the first-char block but differ by far more than max_edit
    got = _resolve(["ABCDEFGH", "AXYZQRSTW"])
    assert got["ABCDEFGH"] == ("ABCDEFGH", 1)
    assert got["AXYZQRSTW"] == ("AXYZQRSTW", 1)


def test_one_cjk_substitution_pairs_at_byte_threshold(ray_session):
    # one CJK substitution = 3 UTF-8 bytes — exactly at max_edit=3;
    # co-blocked through the shared last character
    got = _resolve(["北京", "南京"])
    assert got["北京"] == ("北京", 2)
    assert got["南京"] == ("北京", 2)


def test_block_cap_logs_and_stays_deterministic(caplog):
    # the cap fires inside Ray workers in the distributed path, so the
    # no-silent-caps assertion runs the per-block function driver-side
    # (the test_bucket_cap_logged pattern)
    import pandas as pd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.entity_resolution import (
        verify_block_pairs,
    )

    df = pd.DataFrame({"bkey": ["pZ"] * 4, "s": ["Zd", "Zb", "Za", "Zc"]})
    with caplog.at_level(
            logging.WARNING,
            logger="chinese_open_relation_extraction_for_entgraph_ray"
                   ".stages.entity_resolution"):
        out = verify_block_pairs(df, max_edit=3, max_block=2)
    assert "max_block=2" in caplog.text
    # deterministic lexicographic head {Za, Zb} regardless of input order
    assert sorted(map(tuple, out.itertuples(index=False))) == [("Za", "Zb")]


def test_empty_and_no_pair_inputs(ray_session):
    got = _resolve(["x"])
    assert got == {"x": ("x", 1)}
