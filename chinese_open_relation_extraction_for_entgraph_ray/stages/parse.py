"""Sentence rows -> dependency parses (the stateful parser stage).

This is the reference's DDParser stage (`/root/reference/dudepparse.py:1851,
1891-1906`) as a Ray Data actor-pool ``map_batches`` stage: the parser state
(compiled template automata here; warm model weights in a production parser)
is built ONCE per actor in ``__init__`` and reused per batch.  A real
DDParser/LTP model drops in by swapping :class:`TemplateParserActor` for a
model-backed actor with the same ``{word, head, deprel}`` output contract —
exactly the reference's ``--ready_ddp`` decoupling of parsing from extraction.

The stage asserts the reference's reconstruction invariant per row:
``''.join(words) == text`` (dudepparse.py:1901-1906).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.grammar import compiled_templates

PARSES_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("text", pa.string()),
    ("words", pa.list_(pa.string())),
    ("heads", pa.list_(pa.int32())),
    ("deprels", pa.list_(pa.string())),
])


class DDParserActor:
    """Production parser actor: wraps Baidu DDParser with the same batch
    contract as :class:`TemplateParserActor` (the reference's parser,
    /root/reference/dudepparse.py:1851 ``DDParser(encoding_model=
    'transformer')``).  Not importable in this container (no model weights /
    paddle); the class documents the swap-in point — pass it as
    ``build_kg(..., parser_cls=DDParserActor)`` on a cluster with the model
    available, sizing ``parse_num_gpus`` fractionally per actor."""

    def __init__(self):
        try:
            from ddparser import DDParser   # not installed here
        except ImportError as e:            # pragma: no cover
            raise NotImplementedError(
                "DDParser is not available in this environment; use "
                "TemplateParserActor, or install ddparser on the cluster"
            ) from e
        self._ddp = DDParser(encoding_model="transformer")   # pragma: no cover

    def __call__(self, batch: pa.Table) -> pa.Table:         # pragma: no cover
        texts = batch.column("text").to_pylist()
        parses = self._ddp.parse(texts)
        words_col = [p["word"] for p in parses]
        heads_col = [p["head"] for p in parses]
        deprels_col = [p["deprel"] for p in parses]
        for text, words in zip(texts, words_col):
            if "".join(words) != text:   # dudepparse.py:1901-1906
                raise AssertionError(f"parse reconstruction mismatch: {text!r}")
        return pa.Table.from_arrays(
            [batch.column("conv_id"), batch.column("turn_idx"),
             batch.column("sent_idx"), batch.column("text"),
             pa.array(words_col, pa.list_(pa.string())),
             pa.array(heads_col, pa.list_(pa.int32())),
             pa.array(deprels_col, pa.list_(pa.string()))],
            schema=PARSES_SCHEMA)


class TemplateParserActor:
    """Deterministic rule/lexicon parser held warm per actor.

    ``concurrency=N`` sizes the pool; with a GPU model this is where
    ``num_gpus`` would be set (SURVEY.md §2.4 ST3).
    """

    MEMO_MAX = 0 if __import__('os').environ.get('GRAFT_NO_MEMO') else 200_000

    def __init__(self):
        self._templates = compiled_templates()   # compile once per actor
        # text -> parse memo (transcripts repeat sentences heavily; the
        # parser is deterministic, so each distinct text is parsed once
        # per actor); bounded for flat heap at scale
        self._memo: dict[str, tuple] = {}

    def _parse(self, text: str) -> tuple[list[str], list[int], list[str]]:
        hit = self._memo.get(text)
        if hit is not None:
            return hit
        res = self._parse_uncached(text)
        if len(self._memo) < self.MEMO_MAX:
            self._memo[text] = res
        return res

    def _parse_uncached(self, text: str) -> tuple[list[str], list[int], list[str]]:
        for t, pat in self._templates:
            m = pat.match(text)
            if m is None:
                continue
            words = [m.group(f"g{i}") if kind == "slot" else val
                     for i, (kind, val) in enumerate(t.parts)]
            return words, list(t.heads), list(t.deprels)
        return [text], [0], ["HED"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        words_col: list[list[str]] = []
        heads_col: list[list[int]] = []
        deprels_col: list[list[str]] = []
        for text in texts:
            words, heads, deprels = self._parse(text)
            if "".join(words) != text:   # dudepparse.py:1901-1906
                raise AssertionError(f"parse reconstruction mismatch: {text!r}")
            words_col.append(words)
            heads_col.append(heads)
            deprels_col.append(deprels)
        return pa.Table.from_arrays(
            [batch.column("conv_id"), batch.column("turn_idx"),
             batch.column("sent_idx"), batch.column("text"),
             pa.array(words_col, pa.list_(pa.string())),
             pa.array(heads_col, pa.list_(pa.int32())),
             pa.array(deprels_col, pa.list_(pa.string()))],
            schema=PARSES_SCHEMA)
