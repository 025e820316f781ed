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


class TestBertVocabDivergence:
    """M4/ST1 fidelity documentation: normalize_line is a tokenizer-free
    ANALOG of the reference's bert-base-chinese [UNK]-removal
    (preprocess_corpus.py:26-63), not a replica.  These fixtures pin where
    the two AGREE and document the known divergence classes on rare
    characters, so the delta is explicit rather than silent."""

    def test_agreement_common_text(self):
        from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import (
            normalize_line,
        )

        # common CJK + ASCII + punctuation: both keep everything (modulo
        # the shared lowercasing the BERT tokenizer also applies)
        for s, want in [
            ("张伟访问数据。", "张伟访问数据。"),
            ("模型F1达到92%！", "模型f1达到92%！"),
            ("他说：“好的”", "他说：“好的”"),
        ]:
            assert normalize_line(s) == want

    def test_agreement_unk_like_symbols_dropped(self):
        from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import (
            normalize_line,
        )

        # emoji / dingbats / box-drawing are [UNK] for bert-base-chinese
        # and are dropped by the keep-set as well
        assert normalize_line("部署完成🚀！") == "部署完成！"
        assert normalize_line("│表格│边框│") == "表格边框"
        assert normalize_line("测试❤结束") == "测试结束"

    def test_divergence_rare_cjk_kept_here_unk_in_bert(self):
        from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import (
            normalize_line,
        )

        # DOCUMENTED DIVERGENCE class 1: rare CJK ideographs inside the
        # URO (e.g. 鼗 U+9F17, 龥 U+9FA5) are [UNK] for bert-base-chinese
        # (vocab ~21k chars) but inside our keep-range [一-鿿], so the
        # reference would DROP them and we KEEP them.
        assert normalize_line("鼗鼓齐鸣") == "鼗鼓齐鸣"      # ref: "鼓齐鸣"
        assert normalize_line("龥求帮助") == "龥求帮助"      # ref: "求帮助"

    def test_divergence_cjk_ext_b_dropped_here_too(self):
        from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import (
            normalize_line,
        )

        # CJK extension B+ (outside the BMP URO range) falls outside the
        # keep-range too — both sides drop it (agreement on the far tail)
        assert normalize_line("𠀀测试") == "测试"

    def test_divergence_full_vs_halfwidth_digits(self):
        from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import (
            normalize_line,
        )

        # DOCUMENTED DIVERGENCE class 2: fullwidth alphanumerics (ＡＢ１２)
        # — bert-base-chinese maps them to themselves (kept), our keep-set
        # drops them.  Rare in news corpora; the KG cascade is unaffected
        # because the gazetteer/lexicon carries no fullwidth surfaces.
        assert normalize_line("编号１２３") == "编号"
