"""M18: mention detection over coref-substituted sentences — the
reuse-vs-rerun branch (reference main_ner.py:484-559, reuse test :530-534)."""

import pandas as pd
import pyarrow as pa

PARSES = [
    {"conv_id": "c1", "turn_idx": 0, "sent_idx": 0,
     "text": "张伟访问数据。",
     "words": ["张伟", "访问", "数据", "。"], "heads": [2, 0, 2, 2],
     "deprels": ["SBV", "HED", "VOB", "MT"]},
    {"conv_id": "c1", "turn_idx": 1, "sent_idx": 0,
     "text": "他发布论文。",
     "words": ["他", "发布", "论文", "。"], "heads": [2, 0, 2, 2],
     "deprels": ["SBV", "HED", "VOB", "MT"]},
    # second conversation: pronoun with NO antecedent -> no substitution
    {"conv_id": "c2", "turn_idx": 0, "sent_idx": 0,
     "text": "它运行成功。",
     "words": ["它", "运行", "成功", "。"], "heads": [2, 0, 2, 2],
     "deprels": ["SBV", "HED", "CMP", "MT"]},
]


def _sentences():
    return [{"conv_id": p["conv_id"], "turn_idx": p["turn_idx"],
             "sent_idx": p["sent_idx"], "text": p["text"]} for p in PARSES]


def test_conversation_substitutions_changed_only():
    from chinese_open_relation_extraction_for_entgraph_ray.stages.coref import (
        conversation_substitutions,
    )

    out = conversation_substitutions(pd.DataFrame(PARSES[:2]))
    assert len(out) == 1                      # only the pronoun turn changed
    assert out["text"].iloc[0] == "张伟发布论文。"
    assert out["antecedent"].iloc[0] == "张伟"
    # no antecedent yet -> nothing emitted
    out2 = conversation_substitutions(pd.DataFrame([PARSES[2]]))
    assert len(out2) == 0


def test_mentions_with_coref_reuse_vs_rerun(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.mentions import (
        detect_mentions,
        mentions_with_coref,
    )

    sentences = rd.from_items(_sentences()).map_batches(
        lambda b: b.set_column(b.schema.get_field_index("turn_idx"),
                               "turn_idx",
                               b.column("turn_idx").cast(pa.int32()))
        .set_column(b.schema.get_field_index("sent_idx"), "sent_idx",
                    b.column("sent_idx").cast(pa.int32())),
        batch_format="pyarrow")
    parses = rd.from_items(PARSES)
    got = mentions_with_coref(sentences, parses, concurrency=2).take_all()

    by_key = {}
    for r in got:
        by_key.setdefault((r["conv_id"], r["turn_idx"], r["sent_idx"]),
                          []).append(r)

    # the changed sentence re-ran over substituted text: the coref-recovered
    # entity 张伟 appears with source='coref' at the substituted span
    changed = by_key[("c1", 1, 0)]
    assert all(r["source"] == "coref" for r in changed)
    assert any(r["surface"] == "张伟" and r["entity_id"] == "张伟"
               for r in changed)

    # the unchanged sentence's mentions are the REUSED original-text ones —
    # identical rows to a plain detect_mentions run, tagged source='orig'
    orig = detect_mentions(sentences, concurrency=1).take_all()
    orig_unchanged = sorted(
        tuple(r[c] for c in ("surface", "label", "span_start", "span_end"))
        for r in orig if (r["conv_id"], r["turn_idx"]) == ("c1", 0))
    reused = sorted(
        tuple(r[c] for c in ("surface", "label", "span_start", "span_end"))
        for r in by_key.get(("c1", 0, 0), []))
    assert reused == orig_unchanged
    assert all(r["source"] == "orig" for r in by_key.get(("c1", 0, 0), []))

    # no sentence appears in both branches
    for rows in by_key.values():
        assert len({r["source"] for r in rows}) == 1


def test_coref_delta_scale_path_matches_map_groups(ray_session):
    """sorted-block coref == plain map_groups coref on a multi-conversation
    corpus with block boundaries."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.coref import (
        coref_delta_triples,
    )

    parses = []
    for c in range(12):
        for p in PARSES[:2]:
            q = dict(p)
            q["conv_id"] = f"conv{c:02d}"
            parses.append(q)
    ds = rd.from_items(parses).repartition(5)
    key = lambda r: (r["conv_id"], r["turn_idx"], r["sent_idx"],  # noqa: E731
                     r["rel_kind"], r["subj"], r["pred"], r["obj"])
    a = sorted(map(key, coref_delta_triples(ds, scale=True).take_all()))
    b = sorted(map(key, coref_delta_triples(ds, scale=False).take_all()))
    assert a == b and len(a) > 0


def test_coref_chain_buckets_recount(ray_session):
    """Distributed chain-bucket histogram == pandas recount, 0 bucket
    included (reference coref_chain_bucket semantics)."""
    import pandas as pd
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.coref import (
        conversation_substitutions,
        coref_chain_buckets,
    )

    parses = []
    for c in range(9):
        reps = (c % 3) + 1          # convs with 1, 2 or 3 pronoun turns
        for r in range(reps):
            p0 = dict(PARSES[0]); p0["conv_id"] = f"cv{c}"; p0["turn_idx"] = 2 * r
            p1 = dict(PARSES[1]); p1["conv_id"] = f"cv{c}"; p1["turn_idx"] = 2 * r + 1
            parses.extend([p0, p1])
    # one conversation with no substitutions at all (0 bucket)
    p = dict(PARSES[2]); p["conv_id"] = "cv_none"
    parses.append(p)

    got = coref_chain_buckets(rd.from_items(parses).repartition(4))

    df = pd.DataFrame(parses)
    counts = {}
    for conv, grp in df.groupby("conv_id"):
        counts[conv] = len(conversation_substitutions(grp))
    want = pd.Series(list(counts.values())).value_counts().to_dict()
    want.setdefault(0, 0)
    got_map = dict(zip(got["n_chains"], got["n_conversations"]))
    assert got_map == {int(k): int(v) for k, v in want.items()}
    assert list(got["n_chains"]) == sorted(got["n_chains"])


def test_mention_label_histogram_counts(ray_session):
    """mention_label_histogram (reference ner_token_bucket analog) sums to
    the mention count and groups by label — kept pinned here since its
    driver query was consolidated into transcripts_mention_labels (r3)."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.mentions import (
        detect_mentions,
        mention_label_histogram,
    )

    sents = rd.from_items([
        {"conv_id": "c0", "turn_idx": 0, "sent_idx": 0,
         "text": "张伟访问北京大学"},
        {"conv_id": "c0", "turn_idx": 1, "sent_idx": 0,
         "text": "李娜加入百度"},
    ])
    mentions = detect_mentions(sents, concurrency=1).materialize()
    hist = mention_label_histogram(mentions).take_all()
    assert sum(r["n_mentions"] for r in hist) == mentions.count() > 0
    assert all(r["n_mentions"] > 0 for r in hist)
