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


def test_build_kg_drives_ddparser_actor_with_gpu_resource(tmp_path):
    """End-to-end ST3 seam (VERDICT r2 missing #4): the injected fake
    ``ddparser`` module drives the real actor pool through
    ``build_kg(parser_cls=DDParserActor, parse_num_gpus=...)`` on a Ray
    instance advertising a (fake) GPU — and produces byte-identical triples
    to the default template parser.  Runs in a subprocess because the GPU
    resource must exist at ray.init time and the session fixture has none;
    the fake module reaches the WORKER processes via PYTHONPATH (a
    sys.modules patch would only cover the driver)."""
    import os
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fake_dir = tmp_path / "fakes"
    fake_dir.mkdir()
    (fake_dir / "ddparser.py").write_text(textwrap.dedent("""
        from chinese_open_relation_extraction_for_entgraph_ray.stages.parse import (
            TemplateParserActor,
        )


        class DDParser:
            def __init__(self, encoding_model="transformer"):
                assert encoding_model == "transformer"
                self._t = TemplateParserActor()

            def parse(self, texts):
                return [{"word": list(w), "head": list(h),
                         "deprel": list(d)}
                        for w, h, d in (self._t._parse(t) for t in texts)]
    """))
    script = textwrap.dedent(f"""
        import ray

        ray.init(address="local", num_cpus=4, num_gpus=1,
                 include_dashboard=False, logging_level="ERROR")
        assert ray.cluster_resources().get("GPU") == 1
        from chinese_open_relation_extraction_for_entgraph_ray.pipelines.kg import (
            build_kg,
        )
        from chinese_open_relation_extraction_for_entgraph_ray.sources.synthetic import (
            transcripts_dir_for_sf,
        )
        from chinese_open_relation_extraction_for_entgraph_ray.stages.parse import (
            DDParserActor,
        )

        tdir = transcripts_dir_for_sf("/root/testdata/sf0.001")

        def rows(out):
            got = out["triples"].take_all()
            return sorted(tuple((k, str(v)) for k, v in sorted(r.items()))
                          for r in got)

        base = rows(build_kg(tdir, {str(tmp_path / "kg_base")!r},
                             resume=False, checkpoints="minimal",
                             dedup_sort=False))
        gpu = rows(build_kg(tdir, {str(tmp_path / "kg_gpu")!r},
                            resume=False, checkpoints="minimal",
                            dedup_sort=False, parser_cls=DDParserActor,
                            parse_num_gpus=0.5, parse_concurrency=2))
        assert len(base) > 0 and base == gpu, (len(base), len(gpu))
        print("IDENTICAL", len(base))
        ray.shutdown()
    """)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{fake_dir}:{repo}"
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=420,
                         cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "IDENTICAL" in res.stdout
