"""Unigram LM quality scoring (stages/lm.py) vs a single-process
reference, including the cross-corpus OOV path and the vocab cap."""

import math

import numpy as np
import pytest


def _ref_scores(train_texts, score_rows, oov_alpha=0.5):
    from collections import Counter

    cnt = Counter(t for txt in train_texts for t in txt.split())
    n = sum(cnt.values())
    out = {}
    for did, txt in score_rows:
        toks = txt.split()
        if not toks:
            out[did] = (0, None)
            continue
        lps = [math.log2((cnt[t] if t in cnt else oov_alpha) / n)
               for t in toks]
        out[did] = (len(toks), round(sum(lps) / len(lps), 4))
    return out


def test_lm_self_scoring_matches_reference(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.lm import (
        score_docs,
        unigram_lm,
    )

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(50)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.randint(5, 30))))
            for i in range(80)] + [(900, "")]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in rows]) \
           .repartition(5)
    got = score_docs(ds, unigram_lm(ds)).to_pandas().set_index("doc_id")
    exp = _ref_scores([t for _, t in rows], rows)
    for did, (n_tok, lp) in exp.items():
        row = got.loc[did]
        assert row["n_tokens"] == n_tok
        if lp is None:
            assert row.isna()["lm_logp"]
        else:
            assert row["lm_logp"] == pytest.approx(lp, abs=1e-4)


def test_lm_cross_corpus_oov(ray_session):
    """Scoring corpus B with corpus A's LM: unseen tokens take the
    oov_alpha/N floor."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.lm import (
        score_docs,
        unigram_lm,
    )

    train = ["a a a b", "b c"]
    lm = unigram_lm(rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(train)]))
    score_rows = [(0, "a b zz")]
    got = score_docs(
        rd.from_items([{"doc_id": d, "text": t} for d, t in score_rows]),
        lm).to_pandas()
    exp = _ref_scores(train, score_rows)
    assert got.loc[0, "lm_logp"] == pytest.approx(exp[0][1], abs=1e-4)


def test_lm_vocab_cap(ray_session, monkeypatch):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages import lm

    monkeypatch.setattr(lm, "MAX_VOCAB", 3)
    ds = rd.from_items([{"doc_id": 0, "text": "a b c d e f g"}])
    with pytest.raises(ValueError, match="MAX_VOCAB"):
        lm.unigram_lm(ds)
