"""Sentence splitting / normalization semantics (preprocess_corpus.py parity)."""

from chinese_open_relation_extraction_for_entgraph_ray.functions import textnorm as tn


def test_basic_split_on_delimiters():
    out = tn.split_text("张三急匆匆地赶往机场。李四光为科学做出了贡献！咽炎成为发热的原因？")
    assert out == ["张三急匆匆地赶往机场。", "李四光为科学做出了贡献！", "咽炎成为发热的原因？"]


def test_delimiter_reattached_left():
    out = tn.split_text("中国科学院发布重要研究成果。清华大学宣布新的合作计划。")
    assert all(s.endswith("。") for s in out)


def test_short_fragment_filtered():
    # <= 4 Chinese chars -> dropped (FILTER_LEN, preprocess_corpus.py:17,133)
    assert tn.split_text("好的。") == []
    assert tn.split_text("收到！") == []


def test_ascii_and_digit_only_dropped():
    assert tn.split_text("ok, running the query now...") == []
    assert tn.split_text("123456 789012") == []


def test_normalizer_strips_noise():
    assert tn.normalize_line("张#三走到:: 图书馆。") == "张三走到图书馆。"
    assert tn.normalize_line("ABC def") == "abcdef"
    # emoji / out-of-vocab chars dropped (the [UNK] analog)
    assert tn.normalize_line("张三👍李四测试") == "张三李四测试"


def test_long_sentence_rechunked():
    clause = "张伟访问北京大学"
    body = "，".join([clause] * 75) + "。"
    out = tn.split_text(body)
    assert len(out) >= 2
    for s in out:
        assert tn.count_chinese(s) <= tn.MAX_CHINESE_CHARS
        assert tn.count_chinese(s) > tn.MIN_CHINESE_CHARS
    # nothing lost except the comma breakpoints
    assert sum(tn.count_chinese(s) for s in out) == tn.count_chinese(body)


def test_newline_split_no_reattach():
    out = tn.split_text("张三急匆匆地赶往机场。\nok filler line\n李四光为科学做出了贡献。")
    assert out == ["张三急匆匆地赶往机场。", "李四光为科学做出了贡献。"]


def test_split_idempotent_on_clean_sentence():
    s = "张三急匆匆地赶往机场。"
    assert tn.split_text(s) == [s]
    assert tn.split_text(s)[0] == tn.normalize_line(s)
