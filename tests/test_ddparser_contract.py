"""DDParserActor batch contract, exercised with a fake ``ddparser`` module
injected into sys.modules (the real model is unavailable in this sandbox —
reference dudepparse.py:1851).  Pins the swap-point: batch of text rows in,
{word, head, deprel} list columns out, reconstruction assert on mismatch
(dudepparse.py:1901-1906)."""

import sys
import types

import pyarrow as pa
import pytest


def _fake_ddparser(parse_impl):
    mod = types.ModuleType("ddparser")

    class DDParser:
        def __init__(self, encoding_model="transformer"):
            self.encoding_model = encoding_model

        def parse(self, texts):
            return [parse_impl(t) for t in texts]

    mod.DDParser = DDParser
    return mod


def _batch(texts):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "sent_idx": pa.array(list(range(n)), pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


def test_ddparser_actor_batch_contract(monkeypatch):
    # fake model: split every char into its own word, heads chain to the
    # first token (reconstruction-exact)
    def parse_impl(text):
        words = list(text)
        return {"word": words,
                "head": [0] + [1] * (len(words) - 1),
                "deprel": ["HED"] + ["VOB"] * (len(words) - 1)}

    monkeypatch.setitem(sys.modules, "ddparser", _fake_ddparser(parse_impl))
    from chinese_open_relation_extraction_for_entgraph_ray.stages.parse import (
        PARSES_SCHEMA,
        DDParserActor,
    )

    actor = DDParserActor()
    out = actor(_batch(["张伟访问数据", "它运行"]))
    assert out.schema.equals(PARSES_SCHEMA)
    assert out.num_rows == 2
    assert out.column("words").to_pylist()[0] == list("张伟访问数据")
    assert out.column("heads").to_pylist()[1] == [0, 1, 1]
    assert out.column("deprels").to_pylist()[0][0] == "HED"
    # pass-through of the row identity columns
    assert out.column("conv_id").to_pylist() == ["c0", "c1"]


def test_ddparser_actor_reconstruction_assert(monkeypatch):
    # a model that DROPS a character must trip the reconstruction invariant
    def parse_impl(text):
        words = list(text)[:-1]
        return {"word": words, "head": [0] * len(words),
                "deprel": ["HED"] * len(words)}

    monkeypatch.setitem(sys.modules, "ddparser", _fake_ddparser(parse_impl))
    from chinese_open_relation_extraction_for_entgraph_ray.stages.parse import (
        DDParserActor,
    )

    actor = DDParserActor()
    with pytest.raises(AssertionError, match="reconstruction mismatch"):
        actor(_batch(["张伟访问数据"]))


def test_ddparser_actor_raises_without_module():
    sys.modules.pop("ddparser", None)
    from chinese_open_relation_extraction_for_entgraph_ray.stages.parse import (
        DDParserActor,
    )

    with pytest.raises(NotImplementedError, match="DDParser"):
        DDParserActor()
