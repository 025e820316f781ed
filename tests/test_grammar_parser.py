"""Template parser round-trip: generated sentences parse back to gold parses."""

from chinese_open_relation_extraction_for_entgraph_ray.functions.grammar import (
    TEMPLATE_BY_ID,
    TEMPLATES,
    parse_sentence,
)
from chinese_open_relation_extraction_for_entgraph_ray.functions.textnorm import split_text
from chinese_open_relation_extraction_for_entgraph_ray.sources.synthetic import iter_turns


def test_every_generated_template_sentence_round_trips():
    checked = 0
    for spec in iter_turns(seed=11, num_convs=120):
        if spec.kind != "sentences":
            continue
        for sent in spec.sentences:
            ddp = parse_sentence(sent.text)
            gold = TEMPLATE_BY_ID[sent.tid]
            assert ddp["word"] == sent.words, sent.text
            assert ddp["head"] == list(gold.heads), sent.text
            assert ddp["deprel"] == list(gold.deprels), sent.text
            checked += 1
    assert checked > 200


def test_reconstruction_invariant():
    # ''.join(words) == text for every parse (dudepparse.py:1901-1906)
    for spec in iter_turns(seed=13, num_convs=80):
        for sent in split_text(spec.raw_text):
            ddp = parse_sentence(sent)
            assert "".join(ddp["word"]) == sent


def test_noise_turns_fall_back_to_single_token():
    ddp = parse_sentence("这是一段不匹配任何模板的中文句子啊。")
    assert ddp["deprel"] == ["HED"] and ddp["head"] == [0]


def test_templates_unambiguous_over_generated_corpus():
    """A sentence produced by template T must match T (not another template)."""
    from chinese_open_relation_extraction_for_entgraph_ray.functions.grammar import (
        compiled_templates,
    )

    pats = compiled_templates()
    for spec in iter_turns(seed=17, num_convs=100):
        if spec.kind != "sentences":
            continue
        for sent in spec.sentences:
            first = next(t.tid for t, p in pats if p.match(sent.text))
            assert first == sent.tid, sent.text


def test_template_slot_classes_exist():
    from chinese_open_relation_extraction_for_entgraph_ray.functions.grammar import SLOT_CLASSES

    for t in TEMPLATES:
        for kind, val in t.parts:
            if kind == "slot":
                assert val in SLOT_CLASSES and SLOT_CLASSES[val], (t.tid, val)
