"""BPE vocabulary learning (stages/bpe.py): merge order vs the classic
hand-computable example, determinism across partitionings, and the
encode/count broadcast path."""

import pyarrow as pa

from chinese_open_relation_extraction_for_entgraph_ray.stages.bpe import (
    EOW,
    bpe_token_counts,
    bpe_train,
    encode_word,
    learn_bpe,
)


def test_learn_bpe_classic_example():
    # Sennrich's worked example family: {low:5, lower:2, newest:6, widest:3}
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(freqs, 4)
    # 'es' appears 6+3=9 times -> first merge; then 'es'+'t' (9), then
    # 'est</w>' (9), then 'l'+'o' (7)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", EOW, 9)
    assert merges[3] == ("l", "o", 7)


def test_tie_break_is_lexicographic():
    merges = learn_bpe({"ab": 3, "cd": 3}, 1)
    # (a,b) and (c,d) both have freq 3 (plus the EOW pairs) — the
    # lexicographically smallest maximal pair wins
    assert merges[0][0:2] == ("a", "b")


def test_stops_when_no_pair_repeats():
    merges = learn_bpe({"ab": 1, "cd": 1}, 10)
    assert merges == []          # every pair has frequency 1


def test_train_partition_invariant(ray_session):
    import ray.data as rd

    docs = ["low low lower newest", "newest newest widest low",
            "widest newest newest low low", ""]
    mk = lambda parts: rd.from_arrow(pa.Table.from_arrays(  # noqa: E731
        [pa.array(list(range(len(docs))), pa.int64()),
         pa.array(docs, pa.string())],
        names=["doc_id", "text"])).repartition(parts)
    m1 = bpe_train(mk(1), n_merges=6).to_pandas()
    m4 = bpe_train(mk(4), n_merges=6).to_pandas()
    assert m1.equals(m4)
    assert list(m1.columns) == ["rank", "left", "right", "pair_freq"]
    assert (m1["rank"] == range(len(m1))).all()


def test_encode_and_count(ray_session):
    import ray
    import ray.data as rd

    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", EOW): 2}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("xy", {}) == ["x", "y", EOW]

    docs = rd.from_arrow(pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array(["newest newest", "xy"], pa.string())],
        names=["doc_id", "text"]))
    out = bpe_token_counts(docs, ray.put(ranks)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "n_words"] == 2 and out.loc[1, "n_bpe_tokens"] == 8
    assert out.loc[2, "n_words"] == 1 and out.loc[2, "n_bpe_tokens"] == 3
