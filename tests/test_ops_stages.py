"""Unit tests for the training-data operator stages (dedup, similarity,
textstats, multimodal) — batch-level, no Ray needed."""

import numpy as np
import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages import (
    dedup,
    multimodal,
    similarity,
    textstats,
)


def docs_batch():
    return pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4], pa.int64()),
         pa.array(["the quick brown fox jumps over the lazy dog",
                   "the quick brown fox jumps over the lazy cat",
                   "completely different text with zero overlap here",
                   "the quick brown fox jumps over the lazy dog"], pa.string())],
        names=["doc_id", "text"])


def test_token_stats_counts():
    out = textstats.token_stats(docs_batch())
    assert out.column("n_tokens").to_pylist() == [9, 9, 7, 9]
    assert out.column("n_digit").to_pylist() == [0, 0, 0, 0]


def test_quality_scores_ratio_bounds():
    out = textstats.quality_scores(docs_batch())
    for v in out.column("stop_ratio").to_pylist():
        assert 0.0 <= v <= 1.0


def test_repetition_stats_worked_example():
    """Hand-derived Gopher repetition ratios: 'a b a b a' has bigrams
    (ab, ba, ab, ba) -> max count 2, all 4 positions duplicated;
    an all-distinct doc scores 0 duplication; <2-token docs score 0.0."""
    batch = pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4, 5], pa.int64()),
         pa.array(["a b a b a",
                   "all words here are distinct tokens",
                   "one",
                   "",
                   None], pa.string())],
        names=["doc_id", "text"])
    out = textstats.repetition_stats(batch)
    assert out.column("n_tokens").to_pylist() == [5, 6, 1, 0, 0]
    # doc 1: max bigram count 2 -> 2*2/5 = 0.8; dup positions 4/4 = 1.0
    assert out.column("top_bigram_frac").to_pylist() == \
        [0.8, pytest.approx(2 / 6), 0.0, 0.0, 0.0]
    assert out.column("dup_bigram_frac").to_pylist() == \
        [1.0, 0.0, 0.0, 0.0, 0.0]


def test_bottomk_sample_deterministic_and_bounded(ray_session):
    """bottomk_sample must return exactly min(k, n) rows ranked by
    (md5, doc_id), dedupe nothing (duplicate texts tie-break by doc_id),
    and be block-structure invariant."""
    import hashlib

    import ray.data

    texts = [f"doc number {i}" for i in range(10)] + ["doc number 3"]
    ids = list(range(10)) + [99]
    tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"])
    want = sorted((hashlib.md5(t.encode()).hexdigest(), i)
                  for i, t in zip(ids, texts))[:4]
    for parts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = dedup.bottomk_sample(ds, k=4)
        got = list(zip(out.column("md5").to_pylist(),
                       out.column("doc_id").to_pylist()))
        assert got == want
        assert out.column("sample_rank").to_pylist() == [1, 2, 3, 4]
    big = dedup.bottomk_sample(ray.data.from_arrow(tbl), k=100)
    assert big.num_rows == 11     # k > corpus: everything, still ranked


def test_ngram_novelty_worked_example(ray_session):
    """Hand-derived novelty: 'a b c d' and 'a b c x' share shingle
    'a b c' (df=2), each keeps one df=1 shingle -> 0.5; a <3-token doc
    has ONE joined shingle (word_shingles convention) unique to it ->
    1.0; an empty doc scores 0.0 with zero shingles."""
    import ray.data

    tbl = pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4], pa.int64()),
         pa.array(["a b c d", "a b c x", "zz", ""], pa.string())],
        names=["doc_id", "text"])
    for parts in (1, 3):
        out = dedup.ngram_novelty(
            ray.data.from_arrow(tbl).repartition(parts), k=3).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["n_shingles"].tolist() == [2, 2, 1, 0]
        assert out["n_novel"].tolist() == [1, 1, 1, 0]
        assert out["novelty_frac"].tolist() == [0.5, 0.5, 1.0, 0.0]


def test_detect_lang_zh_and_en():
    batch = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array(["张三访问北京大学", "the cat is on the mat"], pa.string())],
        names=["doc_id", "text"])
    out = textstats.detect_lang(batch)
    assert out.column("detected_lang").to_pylist() == ["zh", "en"]


def test_fingerprints_stable_and_discriminative():
    out1 = textstats.fingerprints(docs_batch())
    out2 = textstats.fingerprints(docs_batch())
    assert out1.equals(out2)
    md5s = out1.column("md5").to_pylist()
    assert md5s[0] == md5s[3] and md5s[0] != md5s[2]


def test_minhash_similar_docs_share_bands():
    t = docs_batch()
    bands = dedup.add_minhash_bands(t)
    by_doc = {}
    for band, h, doc in zip(bands.column("band").to_pylist(),
                            bands.column("band_hash").to_pylist(),
                            bands.column("doc_id").to_pylist()):
        by_doc.setdefault(doc, set()).add((band, h))
    # identical docs collide on every band; near-identical on >=1;
    # unrelated docs on none
    assert by_doc[1] == by_doc[4]
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])


def test_jaccard_values():
    assert dedup.jaccard("a b c d", "a b c d") == 1.0
    assert dedup.jaccard("a b c d", "x y z w") == 0.0


def test_simhash_hamming_tracks_similarity():
    a = dedup.simhash64("the quick brown fox jumps over the lazy dog")
    b = dedup.simhash64("the quick brown fox jumps over the lazy cat")
    c = dedup.simhash64("completely different text with zero overlap here")
    assert dedup.hamming64(a, b) < dedup.hamming64(a, c)


def test_cosine_topk_scorer():
    batch = pa.Table.from_arrays(
        [pa.array([0, 1, 2], pa.int64()),
         pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                  pa.list_(pa.float32())),
         pa.array([0, 0, 0], pa.int32())],
        names=["vec_id", "embedding", "label"])
    out = similarity.CosineTopK(np.array([1.0, 0.0]))(batch)
    sims = dict(zip(out.column("vec_id").to_pylist(),
                    out.column("cosine_sim").to_pylist()))
    assert sims[0] == 1.0 and sims[1] == 0.0 and 0.7 < sims[2] < 0.71


def test_multimodal_fake_decode_deterministic():
    payloads = multimodal.synthesize_payloads(docs_batch())
    fx = multimodal.ImageFeatureExtractor(mode="fake")
    out1, out2 = fx(payloads), fx(payloads)
    assert out1.equals(out2)
    assert len(out1.column("feature")[0].as_py()) == multimodal.FEATURE_DIM


def test_multimodal_real_decode_raises():
    import pytest

    payloads = multimodal.synthesize_payloads(docs_batch())
    fx = multimodal.ImageFeatureExtractor(mode="real")
    with pytest.raises(NotImplementedError):
        fx(payloads)


def test_resize_and_frame_plan():
    payloads = multimodal.synthesize_payloads(docs_batch())
    resized = multimodal.resize_metadata(payloads)
    assert max(resized.column("out_w").to_pylist()) <= 32
    plan = multimodal.frame_sample_plan(payloads)
    assert plan.num_rows >= payloads.num_rows   # >= one frame per doc


def test_coref_conversation_delta():
    import pandas as pd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.coref import (
        coref_conversation,
    )

    group = pd.DataFrame([
        {"conv_id": "c1", "turn_idx": 0, "sent_idx": 0,
         "text": "张伟访问数据。",
         "words": ["张伟", "访问", "数据", "。"], "heads": [2, 0, 2, 2],
         "deprels": ["SBV", "HED", "VOB", "MT"]},
        {"conv_id": "c1", "turn_idx": 1, "sent_idx": 0,
         "text": "他发布论文。",
         "words": ["他", "发布", "论文", "。"], "heads": [2, 0, 2, 2],
         "deprels": ["SBV", "HED", "VOB", "MT"]},
    ])
    out = coref_conversation(group)
    # the pronoun-subject triple was stop-word-filtered originally; after
    # substitution (他 -> 张伟) it appears as a delta
    keys = set(zip(out["subj"], out["pred"], out["obj"]))
    assert ("张伟", "发布", "论文") in keys
    assert (out["antecedent"] == "张伟").all()


def test_bpeish_token_count():
    batch = pa.Table.from_arrays(
        [pa.array([1], pa.int64()),
         pa.array(["hello world 42 你好!!"], pa.string())],
        names=["doc_id", "text"])
    out = textstats.token_stats(batch)
    # hello, world, 4, 2, 你好!! -> [A-Za-z]+ x2, [0-9] x2, non-alnum run x1
    assert out.column("n_bpeish_tokens").to_pylist() == [5]


def test_mention_detector_spans_and_links():
    from chinese_open_relation_extraction_for_entgraph_ray.stages.mentions import (
        MentionDetector,
    )

    batch = pa.Table.from_arrays(
        [pa.array(["c1"], pa.string()), pa.array([0], pa.int32()),
         pa.array([0], pa.int32()),
         pa.array(["张三在北大访问清华大学"], pa.string())],
        names=["conv_id", "turn_idx", "sent_idx", "text"])
    out = MentionDetector()(batch)
    rows = {r["surface"]: r for r in out.to_pylist()}
    assert rows["张三"]["label"] == "PERSON"
    assert rows["张三"]["link_score"] == 1.0
    # alias resolves to canonical with lower score
    assert rows["北大"]["entity_id"] == "北京大学"
    assert rows["北大"]["link_score"] == 0.9
    # longest-first: 清华大学 matched whole, not the 清华 alias
    assert "清华大学" in rows and "清华" not in rows
    text = "张三在北大访问清华大学"
    for r in rows.values():
        assert text[r["span_start"]:r["span_end"]] == r["surface"]


def test_multiband_lsh_recall_on_near_dups():
    rng = np.random.RandomState(7)
    base = rng.standard_normal(16)
    near = base + 0.05 * rng.standard_normal(16)      # cosine ~0.999
    far = rng.standard_normal(16)
    batch = pa.Table.from_arrays(
        [pa.array([10, 11, 12], pa.int64()),
         pa.array([base.tolist(), near.tolist(), far.tolist()],
                  pa.list_(pa.float64()))],
        names=["vec_id", "embedding"])
    bands = similarity.add_lsh_bands(batch)
    assert bands.num_rows == 3 * similarity.N_TABLES
    by_bucket = {}
    for r in bands.to_pylist():
        by_bucket.setdefault((r["table"], r["bucket"]), []).append(r["vec_id"])
    shared = any(10 in v and 11 in v for v in by_bucket.values())
    assert shared, "near-identical vectors must share >=1 band bucket"


def test_ivf_centroids_deterministic_and_normalized():
    rng = np.random.RandomState(3)
    sample = rng.standard_normal((256, 8))
    c1 = similarity.train_centroids(sample, nlist=8)
    c2 = similarity.train_centroids(sample, nlist=8)
    assert np.allclose(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_audio_fake_decode_and_features():
    batch = multimodal.synthesize_audio_payloads(docs_batch())
    feats = multimodal.AudioFeatureExtractor(mode="fake")(batch)
    assert feats.num_rows == 4
    for r in feats.to_pylist():
        assert r["n_frames"] >= 1
        assert 0.0 <= r["rms_energy"] <= 1.0
        assert r["duration_sec"] > 0
    # deterministic
    feats2 = multimodal.AudioFeatureExtractor(mode="fake")(
        multimodal.synthesize_audio_payloads(docs_batch()))
    assert feats.equals(feats2)


def test_audio_real_decode_raises():
    import pytest

    batch = multimodal.synthesize_audio_payloads(docs_batch())
    with pytest.raises(NotImplementedError):
        multimodal.AudioFeatureExtractor(mode="real")(batch)


def test_asof_join_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.joins import (
        asof_join,
    )

    left = rd.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "t": pa.array([10, 20, 5, 10], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "c"], pa.string()),
        "t": pa.array([10, 15, 1], pa.int64()),
        "val": pa.array([100, 150, 999], pa.int64()),
    }))
    out = asof_join(left, right, by="k", ts="t",
                    right_payload=["val"]).to_pandas()
    got = {int(r["lid"]): (None if pd.isna(r["val_right"])
                           else int(r["val_right"]))
           for _, r in out.iterrows()}
    # lid=1 t=10: exact match allowed -> 100; lid=2 t=20 -> latest (t=15) 150
    # lid=3 t=5: no right row at/before -> None; lid=4 key b: no right -> None
    assert got == {1: 100, 2: 150, 3: None, 4: None}
    assert len(out) == 4


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    sf = "/root/testdata/sf0.01"
    tbl = pq.read_table(sf + "/embeddings.parquet")
    q = tbl.column("embedding").to_pylist()[0]
    ds = rd.read_parquet(sf + "/embeddings.parquet")
    exact = [r["vec_id"] for r in
             similarity.brute_force_top_k(ds, q, k=10).take_all()]
    # uniform-random embeddings are the worst case for IVF (no cluster
    # structure, near-ties scatter across cells): nprobe=24/64 measures
    # recall 9/10 here; real clustered embeddings get there at nprobe=8
    approx = [r["vec_id"] for r in
              similarity.ivf_top_k(ds, q, k=10, nprobe=24).take_all()]
    overlap = len(set(exact) & set(approx))
    assert exact[0] in approx
    assert overlap >= 8, (exact, approx)


def test_text_embedder_deterministic_and_normalized():
    from chinese_open_relation_extraction_for_entgraph_ray.stages.embed import (
        TextEmbedder,
    )

    enc = TextEmbedder()
    e1 = enc.encode(["the quick brown fox", "completely different words"])
    e2 = TextEmbedder().encode(["the quick brown fox",
                                "completely different words"])
    assert np.allclose(e1, e2)
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0)
    # identical texts -> identical vectors; different texts -> lower cosine
    same = enc.encode(["the quick brown fox"] * 2)
    assert np.allclose(same[0], same[1])
    assert float(e1[0] @ e1[1]) < 0.99


def test_text_embedder_real_mode_raises():
    import pytest

    from chinese_open_relation_extraction_for_entgraph_ray.stages.embed import (
        TextEmbedder,
    )

    with pytest.raises(NotImplementedError):
        TextEmbedder(mode="real")


def test_hll_estimate_accuracy():
    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    vals = [f"item-{i}" for i in range(50_000)]
    est = hll_estimate(hll_registers(vals))
    assert abs(est - 50_000) / 50_000 < 0.05
    # merge of two halves == registers of the union (mergeability)
    import numpy as np

    a = hll_registers(vals[:30_000])
    b = hll_registers(vals[20_000:])     # overlapping halves
    merged = hll_merge(np.stack([a, b]))
    assert np.array_equal(merged, hll_registers(vals))
    # small range: linear counting stays near-exact
    small = hll_estimate(hll_registers([f"x{i}" for i in range(100)]))
    assert abs(small - 100) < 5


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        approx_distinct,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    # 150 distinct users; small-range linear counting should be near-exact
    assert abs(est - 150) < 8, est


def test_approx_quantiles_error_bound(ray_session):
    """Histogram-sketch quantiles within the (max-min)/bins bound of exact
    linear-interpolation quantiles, incl. skewed data; degenerate cases."""
    import numpy as np
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        approx_quantiles,
    )

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.exponential(50.0, 20_000),
                           rng.normal(500.0, 10.0, 5_000)])
    ds = rd.from_arrow(__import__("pyarrow").table({"value": vals})) \
        .repartition(8)
    qs = [0.1, 0.5, 0.95, 0.99]
    got = approx_quantiles(ds, "value", qs, bins=4096)
    want = np.quantile(vals, qs, method="linear")
    tol = (vals.max() - vals.min()) / 4096 * 2
    for g, w in zip(got, want):
        assert abs(g - w) <= tol, (g, w, tol)

    # degenerate: constant column and empty dataset
    const = rd.from_items([{"value": 3.5}] * 100)
    assert approx_quantiles(const, "value", [0.5]) == [3.5]
    empty = rd.from_arrow(__import__("pyarrow").table(
        {"value": __import__("pyarrow").array([], "float64")}))
    assert np.isnan(approx_quantiles(empty, "value", [0.5])[0])


def test_grouped_approx_quantiles_error_bound(ray_session):
    """Per-group histogram-sketch quantiles within the global-range/bins
    bound of exact per-group quantiles."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        grouped_approx_quantiles,
    )

    rng = np.random.RandomState(11)
    keys = np.repeat(["a", "b", "c"], [20_000, 8_000, 500])
    vals = np.concatenate([rng.exponential(40.0, 20_000),
                           rng.normal(300.0, 25.0, 8_000),
                           rng.uniform(0.0, 900.0, 500)])
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(7)
    got = {r["k"]: (r["q0.5"], r["q0.95"])
           for r in grouped_approx_quantiles(ds, "k", "v",
                                             [0.5, 0.95],
                                             bins=4096).take_all()}
    # sparse groups (one sample per several buckets) interpolate with up
    # to a few bucket-widths of slack vs exact sample interpolation
    tol = (vals.max() - vals.min()) / 4096 * 4
    for k in ("a", "b", "c"):
        m = keys == k
        want = np.quantile(vals[m], [0.5, 0.95], method="linear")
        assert abs(got[k][0] - want[0]) <= tol, (k, got[k][0], want[0])
        assert abs(got[k][1] - want[1]) <= tol, (k, got[k][1], want[1])


def test_grouped_approx_distinct_error_bound(ray_session):
    """Keyed HLL: per-group estimates within 5% of exact distinct counts
    across groups of very different cardinalities (incl. a group where
    values repeat heavily)."""
    import numpy as np
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        grouped_approx_distinct,
    )

    rng = np.random.RandomState(7)
    rows = []
    exact = {"small": 17, "mid": 800, "big": 6000}
    for grp, n_distinct in exact.items():
        for _ in range(n_distinct * 3):        # repeats: 3x each on average
            rows.append({"g": grp, "v": int(rng.randint(n_distinct))})
    ds = rd.from_items(rows).repartition(6)
    got = {r["g"]: r["approx_distinct"]
           for r in grouped_approx_distinct(ds, "g", "v").take_all()}
    for grp, n_distinct in exact.items():
        # draws with replacement: the truth is the number of UNIQUE values
        truth = len({r["v"] for r in rows if r["g"] == grp})
        assert abs(got[grp] - truth) / truth < 0.05, (grp, got[grp], truth)


def test_redact_pii_sequential_semantics():
    """Counts are taken on the progressively-scrubbed text (email first),
    and the scrub replaces whole spans."""
    batch = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["write a.b+c@ex.co or see https://x.io/a?b=1",
                 "call +1 (415) 555-0199 now",
                 "plain text, nothing to scrub"]})
    out = textstats.redact_pii(batch)
    assert out.column("n_emails").to_pylist() == [1, 0, 0]
    assert out.column("n_urls").to_pylist() == [1, 0, 0]
    assert out.column("n_phones").to_pylist() == [0, 1, 0]
    import hashlib

    want = hashlib.md5(
        "write [REDACTED] or see [REDACTED]".encode()).hexdigest()
    assert out.column("redacted_md5").to_pylist()[0] == want
    # untouched text hashes to itself
    want3 = hashlib.md5("plain text, nothing to scrub".encode()).hexdigest()
    assert out.column("redacted_md5").to_pylist()[2] == want3


def test_decontaminate_removes_planted_overlap(ray_session):
    """Docs sharing >= min_overlap 3-shingles with the eval set are
    dropped; clean docs survive; the report counts distinct overlaps."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.decontaminate import (
        contamination_counts,
        decontaminate,
        eval_shingle_set,
    )

    eval_docs = rd.from_items([
        {"doc_id": 900, "text": "the secret benchmark question about owls"}])
    train = rd.from_items([
        {"doc_id": 1, "text": "totally unrelated training document here"},
        {"doc_id": 2, "text": "it mentions the secret benchmark question "
                              "about owls verbatim"},
        {"doc_id": 3, "text": "short"},
    ]).repartition(2)
    ref = eval_shingle_set(eval_docs)
    clean = decontaminate(train, eval_docs).take_all()
    assert sorted(r["doc_id"] for r in clean) == [1, 3]
    report = {r["doc_id"]: r["n_overlap"]
              for r in contamination_counts(train, ref).take_all()}
    # "the secret benchmark question about owls" = 7 tokens -> 5 shingles,
    # 4 of which appear verbatim inside doc 2's longer sentence... compute:
    assert list(report) == [2] and report[2] >= 4


def test_eval_shingle_set_bounds(ray_session, monkeypatch):
    import ray.data as rd

    import chinese_open_relation_extraction_for_entgraph_ray.stages.decontaminate as dec

    monkeypatch.setattr(dec, "MAX_EVAL_SHINGLES", 2)
    big = rd.from_items([{"doc_id": 1, "text": "a b c d e f g h i j"}])
    with pytest.raises(ValueError, match="not a broadcastable eval set"):
        dec.eval_shingle_set(big)


def test_quality_scores_repetition_signal():
    """dup_token_ratio separates boilerplate (repeated vocab) from varied
    text; distinct counts are exact."""
    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["spam spam spam spam spam", "five distinct words here ok",
                 "", "   "]})
    out = textstats.quality_scores(batch)
    assert out.column("n_distinct_tokens").to_pylist() == [1, 5, 0, 0]
    ratios = out.column("dup_token_ratio").to_pylist()
    assert ratios[0] == 0.8 and ratios[1] == 0.0
    # r4 (ADVICE r3 #5): empty/whitespace-only docs are NOT "maximally
    # repetitive" — the ratio is defined as 0.0 at n_tokens == 0
    assert ratios[2] == 0.0 and ratios[3] == 0.0


def test_lsh_params_bits_scale_with_corpus():
    """r4 (VERDICT r3 #2): the embedding-LSH table width must grow with
    corpus size so expected bucket membership stays ~TARGET_BUCKET_ROWS
    instead of O(n); tables compensate for the per-table recall loss."""
    b_small, t_small = similarity.lsh_params(1_000)
    b_big, t_big = similarity.lsh_params(100_000_000)
    assert b_small == similarity.BITS_PER_TABLE          # floor holds
    assert b_big > b_small
    assert b_big <= similarity.MAX_BITS
    assert t_small >= similarity.N_TABLES
    assert t_big <= similarity.MAX_TABLES
    # expected bucket membership at the chosen width stays bounded
    assert 100_000_000 / (1 << b_big) <= 4 * similarity.TARGET_BUCKET_ROWS


def test_emb_block_pairs_over_cap_bucket_logged(monkeypatch, caplog):
    """r4 (VERDICT r3 #2): a bucket beyond MAX_EMB_BUCKET is truncated to
    its first (sorted-vec_id) members, the truncation is LOGGED, and the
    emitted pair count is the capped quadratic, not the full one."""
    import logging

    monkeypatch.setattr(similarity, "MAX_EMB_BUCKET", 5)
    rng = np.random.RandomState(11)
    v = rng.standard_normal(8)
    n = 9
    batch = pa.Table.from_arrays(
        [pa.array([0] * n, pa.int32()), pa.array([0] * n, pa.int32()),
         pa.array(list(range(n)), pa.int64()),
         pa.array([v.tolist()] * n, pa.list_(pa.float64()))],
        names=["table", "bucket", "vec_id", "embedding"])
    with caplog.at_level(logging.WARNING,
                         logger=similarity.logger.name):
        out = similarity._emb_block_pairs(batch, threshold=0.8,
                                          skip_edges=False)
    pairs = out.filter(pa.compute.equal(out.column("kind"), 1))
    assert pairs.num_rows == 5 * 4 // 2         # C(cap, 2), not C(9, 2)
    kept = set(pairs.column("a").to_pylist()) | \
        set(pairs.column("b").to_pylist())
    assert kept == {0, 1, 2, 3, 4}              # first cap members by id
    assert any("MAX_EMB_BUCKET" in r.message for r in caplog.records)


def test_mg_compress_bound_and_survivors():
    """r4: MG compression keeps <= capacity counters, undercounts by at
    most the subtracted pivot, and never overcounts."""
    from chinese_open_relation_extraction_for_entgraph_ray.stages import sketch

    keys = np.array([f"k{i}" for i in range(10)], dtype=object)
    counts = np.array([100, 90, 80, 70, 60, 50, 40, 30, 20, 10],
                      dtype=np.int64)
    k2, c2 = sketch.mg_compress(keys, counts, capacity=4)
    assert list(k2) == ["k0", "k1", "k2", "k3"]
    assert list(c2) == [40, 30, 20, 10]          # each minus pivot 60
    k3, c3 = sketch.mg_compress(keys, counts, capacity=10)
    assert list(k3) == list(keys)                # under capacity: exact


def test_approx_top_k_heavy_hitters_guarantee(ray_session):
    """r4: any value with true count > N/(capacity+1) must survive, with
    estimate within N/(capacity+1) of truth and never above it — checked
    against exact counts on a skewed stream across several partitions."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        approx_top_k,
    )

    rng = np.random.RandomState(17)
    heavy = [f"hot{i}" for i in range(5)]
    stream = []
    for i, h in enumerate(heavy):
        stream += [h] * (400 - 40 * i)
    stream += [f"tail{i}" for i in rng.randint(0, 2000, size=1200)]
    rng.shuffle(stream)
    n = len(stream)
    cap = 64
    exact = {}
    for v in stream:
        exact[v] = exact.get(v, 0) + 1
    ds = rd.from_items([{"tok": v} for v in stream]).repartition(7)
    got = approx_top_k(ds, "tok", k=10, capacity=cap).to_pandas()
    bound = n / (cap + 1)
    est = dict(zip(got["value"], got["approx_count"]))
    for h in heavy:
        assert exact[h] > bound          # test construction sanity
        assert h in est, f"heavy hitter {h} missing"
        assert est[h] <= exact[h]
        assert exact[h] - est[h] <= bound


def test_count_min_bounds_and_merge(ray_session):
    """r4: CM estimates never undercount, overcount within the e/width * N
    bound (generous margin), and the distributed block-merged matrix
    equals a single-pass build."""
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        cm_estimate,
        count_min_sketch,
    )

    rng = np.random.RandomState(29)
    stream = [f"hot{i}" for i in range(3) for _ in range(500)]
    stream += [f"t{i}" for i in rng.randint(0, 5000, size=4000)]
    rng.shuffle(stream)
    exact = {}
    for v in stream:
        exact[v] = exact.get(v, 0) + 1
    n = len(stream)
    ds = rd.from_items([{"tok": v} for v in stream]).repartition(6)
    cm = count_min_sketch(ds, "tok", width=1024, depth=4)
    assert cm.shape == (4, 1024) and cm[0].sum() == n   # each row sees all
    probes = list(exact)
    est = cm_estimate(cm, probes)
    true = np.array([exact[p] for p in probes])
    assert (est >= true).all()                          # one-sided error
    assert (est - true <= np.e / 1024 * n * 4).all()    # bound w/ margin
    cm1 = count_min_sketch(ds.repartition(1), "tok", width=1024, depth=4)
    assert (cm == cm1).all()                            # merge == one pass


def test_count_min_weighted(ray_session):
    import ray.data as rd

    from chinese_open_relation_extraction_for_entgraph_ray.stages.sketch import (
        cm_estimate,
        count_min_sketch,
    )

    rows = [{"tok": "a", "w": 10}, {"tok": "b", "w": 3},
            {"tok": "a", "w": 5}, {"tok": "c", "w": 1}]
    ds = rd.from_items(rows).repartition(2)
    cm = count_min_sketch(ds, "tok", width=512, depth=4, weight_col="w")
    est = cm_estimate(cm, ["a", "b", "c"])
    assert (est >= np.array([15, 3, 1])).all()
    assert est.sum() <= 19 * 3 + 19                     # tiny stream: exact-ish


def test_cosine_pairs_exact_vs_numpy_and_lsh_soundness(ray_session):
    """cosine_pairs_exact must equal the brute-force numpy pair set, and the
    LSH path (embedding_near_dups) must be SOUND against it: every LSH pair
    appears in the exact set with the same (6 dp) cosine, and LSH recall on
    the clearly-near pairs (cos >= 0.95) is high."""
    import ray.data

    rng = np.random.RandomState(42)
    n, dim, planted = 80, 16, 10
    base = rng.standard_normal((n, dim))
    dup = base[:planted] + 0.05 * rng.standard_normal((planted, dim))
    ids = np.concatenate([np.arange(n), 1000 + np.arange(planted)])
    mat = np.vstack([base, dup])
    tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()),
         pa.array([r.tolist() for r in mat], pa.list_(pa.float64()))],
        names=["vec_id", "embedding"])
    ds = ray.data.from_arrow(tbl).repartition(4)

    exact = similarity.cosine_pairs_exact(ds, threshold=0.8).to_pandas()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = norm @ norm.T
    ref = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cos[i, j] >= 0.8:
                ref[(ids[i], ids[j])] = cos[i, j]
    got = dict(zip(zip(exact.id_a, exact.id_b), exact.cos))
    assert set(got) == set(ref) and len(got) >= planted
    for k, v in got.items():
        assert abs(v - ref[k]) < 1e-6

    lsh = similarity.embedding_near_dups(
        ds, threshold=0.8, n_vectors=len(ids)).to_pandas()
    lsh_pairs = dict(zip(zip(lsh.a, lsh.b), lsh.cosine_sim))
    assert set(lsh_pairs) <= set(got), "LSH emitted a pair the exact op lacks"
    for k, v in lsh_pairs.items():    # LSH rounds to 4 dp, exact to 6 dp
        assert abs(v - got[k]) < 1e-4
    sure = {k for k, v in got.items() if v >= 0.95}
    found = sure & set(lsh_pairs)
    assert len(found) >= 0.9 * len(sure), (len(found), len(sure))


def test_cosine_pairs_exact_vector_cap(ray_session, monkeypatch):
    import ray.data

    monkeypatch.setattr(similarity, "MAX_EXACT_VECTORS", 3)
    tbl = pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4], pa.int64()),
         pa.array([[1.0, 0.0]] * 4, pa.list_(pa.float64()))],
        names=["vec_id", "embedding"])
    with pytest.raises(ValueError, match="all-pairs"):
        similarity.cosine_pairs_exact(ray.data.from_arrow(tbl))


def test_knn_graph_brute_force_parity_and_clamp(ray_session):
    """knn_graph must equal the numpy brute-force top-k (rounded-sim
    ranking, dst-asc tie-break), exclude self-pairs, clamp k to n-1, and be
    invariant to block structure."""
    import ray.data

    rng = np.random.RandomState(7)
    n, dim, k = 40, 8, 5
    mat = rng.standard_normal((n, dim))
    ids = np.arange(n) * 3 + 1    # non-contiguous ids
    tbl = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()),
         pa.array([r.tolist() for r in mat], pa.list_(pa.float64()))],
        names=["vec_id", "embedding"])
    ds = ray.data.from_arrow(tbl)

    got = (similarity.knn_graph(ds.repartition(4), k=k).to_pandas()
           .sort_values(["src", "rank"]).reset_index(drop=True))
    got1 = (similarity.knn_graph(ds.repartition(1), k=k).to_pandas()
            .sort_values(["src", "rank"]).reset_index(drop=True))
    assert got.equals(got1), "knn_graph depends on block structure"
    assert len(got) == n * k and (got.src != got.dst).all()

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 4)
    for src_i in range(n):
        order = sorted(((-cos[src_i, j], ids[j]) for j in range(n)
                        if j != src_i))
        want = [(idj, -negc) for negc, idj in order[:k]]
        sub = got[got.src == ids[src_i]]
        assert list(zip(sub.dst, sub.cosine_sim)) == want, ids[src_i]

    # k larger than n-1 clamps (every neighbor, still no self)
    tiny = ray.data.from_arrow(tbl.slice(0, 3))
    g = similarity.knn_graph(tiny, k=10).to_pandas()
    assert len(g) == 3 * 2 and g.groupby("src")["rank"].max().eq(2).all()


def test_logreg_partition_parity_learning_and_noise_weight(ray_session):
    """train_logreg must be BIT-identical across block structures (exact
    int64 gradient sums), actually learn a separable target, and push a
    pure-noise feature's weight toward zero relative to the signal."""
    import numpy as np
    import pandas as pd
    import ray.data

    from chinese_open_relation_extraction_for_entgraph_ray.stages.logreg import (
        score_logreg,
        train_logreg,
    )

    rng = np.random.RandomState(3)
    n = 400
    x1 = rng.uniform(0, 1, n)                   # signal
    x2 = rng.uniform(0, 1, n)                   # noise
    y = (x1 > 0.5).astype(np.float64)
    df = pd.DataFrame({"doc_id": np.arange(n), "x1": x1, "x2": x2,
                       "y": y})

    ws = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts).materialize()
        ws.append(train_logreg(ds, feature_cols=["x1", "x2"],
                               label_col="y", rounds=12, lr=8.0))
    assert (ws[0] == ws[1]).all(), "gradient sums not partition-exact"

    w = ws[0]
    assert abs(w[1]) > 4 * abs(w[2]), (w, "noise weight not suppressed")
    scored = score_logreg(
        ray.data.from_pandas(df), w, feature_cols=["x1", "x2"],
        id_col="doc_id").to_pandas().set_index("doc_id")
    acc = (scored.pred.to_numpy() == (y == 1)).mean()
    assert acc > 0.8, acc

    # empty input -> zero weights, no crash
    empty = ray.data.from_pandas(df.iloc[:0]).materialize()
    w0 = train_logreg(empty, feature_cols=["x1", "x2"], label_col="y")
    assert (w0 == 0).all()


def test_roc_auc_hand_checked_ties_and_block_invariance(ray_session):
    """roc_auc must reproduce the hand-computed tied-rank Mann-Whitney
    value, be invariant to block structure, score a perfect ranker 1.0 /
    an inverted one 0.0, and return NULL auc when a class is absent."""
    import numpy as np
    import pandas as pd
    import ray.data

    from chinese_open_relation_extraction_for_entgraph_ray.stages.logreg import (
        roc_auc,
    )

    # scores: pos {0.9, 0.5, 0.5}, neg {0.5, 0.3}.
    # pairs = 6; pos beats neg: (0.9>0.5), (0.9>0.3), (0.5>0.3)x2 = 4;
    # ties at half: (0.5,0.5)x2 -> 1.0.  AUC = 5/6 = 0.833333.
    df = pd.DataFrame({"score": [0.9, 0.5, 0.5, 0.5, 0.3],
                       "y": [1.0, 1.0, 1.0, 0.0, 0.0]})
    for parts in (1, 3):
        out = roc_auc(ray.data.from_pandas(df).repartition(parts),
                      score_col="score", label_col="y").to_pandas()
        assert out.shape == (1, 3)
        assert out.n_pos[0] == 3 and out.n_neg[0] == 2
        assert out.auc[0] == 0.833333, out.auc[0]

    # perfect / inverted rankers
    df2 = pd.DataFrame({"score": [0.1, 0.2, 0.8, 0.9],
                        "y": [0.0, 0.0, 1.0, 1.0]})
    assert roc_auc(ray.data.from_pandas(df2), score_col="score",
                   label_col="y").to_pandas().auc[0] == 1.0
    df2["y"] = 1.0 - df2["y"]
    assert roc_auc(ray.data.from_pandas(df2), score_col="score",
                   label_col="y").to_pandas().auc[0] == 0.0

    # single-class input -> NULL auc, counts still reported
    df3 = pd.DataFrame({"score": [0.4, 0.6], "y": [1.0, 1.0]})
    out3 = roc_auc(ray.data.from_pandas(df3), score_col="score",
                   label_col="y").to_pandas()
    assert np.isnan(out3.auc[0]) and out3.n_neg[0] == 0


def test_winnowing_matches_bruteforce_definition():
    """winnow_fingerprints' vectorized rightmost-argmin selection must
    match a direct per-window loop over the winnowing definition —
    including on periodic strings, whose repeated grams force hash ties."""
    import numpy as np

    from chinese_open_relation_extraction_for_entgraph_ray.stages.textstats import (
        _MSH_MOD,
        _WINNOW_WEIGHTS,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    def brute(t):
        n_grams = max(len(t) - WINNOW_K + 1, 0)
        if n_grams < WINNOW_W:
            return n_grams, 0, 0, None, None
        h = [sum(ord(t[p + j]) * w
                 for j, w in enumerate(_WINNOW_WEIGHTS)) % _MSH_MOD
             for p in range(n_grams)]
        sel = set()
        for s in range(n_grams - WINNOW_W + 1):
            win = h[s:s + WINNOW_W]
            m = min(win)
            sel.add(s + max(i for i, v in enumerate(win) if v == m))
        fp = [h[p] for p in sel]
        return n_grams, len(fp), sum(fp), min(fp), max(fp)

    rng = np.random.RandomState(7)
    texts = ["abababababababab",            # periodic: every gram tied
             "aaaaaaaaaaaa",                # fully degenerate ties
             "The quick brown fox jumps over the lazy dog",
             "", "abc", "abcdefg",          # below/at the length edges
             "".join(chr(rng.randint(97, 123)) for _ in range(200)),
             "你好世界" * 6]                # non-ASCII codepoints
    out = winnow_fingerprints(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        ng, nf, fs, mn, mx = brute(t)
        row = out.loc[i]
        assert row.n_grams == ng and row.n_fingerprints == nf, (i, t)
        assert row.fp_sum == fs, (i, t)
        assert (mn is None and np.isnan(row.fp_min)) or row.fp_min == mn
        assert (mx is None and np.isnan(row.fp_max)) or row.fp_max == mx

    # the winnowing guarantee: docs sharing a substring of length
    # >= k+w-1 share at least one fingerprint (check via set equality on
    # a planted long overlap -> overlapping selected hashes exist)
    base = "zqxwvutsrqponmlkjihgfedcba0123456789"
    a, b = "PREFIX" + base, base + "SUFFIX"
    fa, fb = (winnow_fingerprints(
        pa.table({"doc_id": [0], "text": [t]})).to_pandas()
        for t in (a, b))
    # fp_min of the shared region must appear in both docs' hash sets —
    # weaker than full set intersection but derivable from the summary:
    # both docs' fp_min comes from the shared (minimal) gram here
    assert fa.fp_min[0] == fb.fp_min[0]


def test_md5_plane_mode_deterministic_and_distinct():
    """plane_mode='md5' (the embedding_near_dups_explicit oracle seam):
    pure function of (dim, tables, bits) — same across calls/processes —
    in [-1, 1), and distinct from the seeded planes."""
    from chinese_open_relation_extraction_for_entgraph_ray.stages.similarity import (
        _TABLE_PLANES,
        _table_planes,
    )

    p1 = _table_planes(16, 4, 4, "md5")
    _TABLE_PLANES.pop((16, 4, 4, "md5"))          # force rebuild
    p2 = _table_planes(16, 4, 4, "md5")
    assert (p1 == p2).all()
    assert p1.shape == (4, 4, 16)
    assert (p1 >= -1).all() and (p1 < 1).all()
    seeded = _table_planes(16, 4, 4, "seeded")
    assert not np.array_equal(p1, seeded)
    # spot-pin one coordinate against the documented key recipe
    import hashlib
    h = int.from_bytes(hashlib.md5(b"lsh:0:0:0").digest()[:8], "big")
    assert p1[0, 0, 0] == (h / (1 << 64)) * 2.0 - 1.0
