"""Deterministic synthetic multi-turn transcript corpus.

Generates the Parquet ``transcripts`` table dictated by BASELINE.json's
input hint — ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` — from the template grammar in
``functions/grammar.py``.  Generation is a pure function of
``(seed, conv_index, turn_index)``: the oracle in tests regenerates the same
turn specs to compute expected triples without running the pipeline.

The corpus deliberately exercises every preprocessing edge path from the
reference (`/root/reference/preprocess_corpus.py`): >430-char sentences
(re-chunk :66-100), <5-Chinese-char fragments (length filter :130-145),
``#``/``::``/space noise (normalizer :26-63), pure-ASCII/digit turns
(no-Chinese drop, dudepparse.py:252-278), plus Zipf-ish conversation lengths
for skew.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.grammar import SLOT_CLASSES, TEMPLATES, Template

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "calculator", "db_query", "browser")
BASE_TS_US = 1_700_000_000_000_000   # fixed epoch base (microseconds)

# turn kinds and their sampling weights
_KINDS = ("sentences", "ascii", "digits", "short", "long", "tool_json")
_KIND_WEIGHTS = (0.72, 0.08, 0.04, 0.06, 0.04, 0.06)


@dataclass
class SentenceSpec:
    tid: str
    words: list[str]

    @property
    def text(self) -> str:
        return "".join(self.words)


@dataclass
class TurnSpec:
    conv_id: str
    turn_idx: int
    role: str
    tool: str
    ts_us: int
    kind: str
    sentences: list[SentenceSpec] = field(default_factory=list)
    raw_text: str = ""


def _rng(seed: int, *key) -> random.Random:
    return random.Random(":".join(str(k) for k in (seed,) + key))


def _fill_template(t: Template, rng: random.Random) -> SentenceSpec:
    fills: dict[int, str] = {}
    for i, (kind, val) in enumerate(t.parts):
        if kind == "slot":
            fills[i] = rng.choice(SLOT_CLASSES[val])
    return SentenceSpec(t.tid, t.realize(fills))


def _noise_inject(text: str, rng: random.Random) -> str:
    """Insert characters the normalizer strips (#, ::, spaces)."""
    for marker, p in (("#", 0.10), ("::", 0.05), (" ", 0.10)):
        if rng.random() < p and text:
            pos = rng.randrange(len(text))
            text = text[:pos] + marker + text[pos:]
    return text


def turn_count(seed: int, ci: int) -> int:
    """Zipf-ish turns per conversation in [1, 64] (skew exercise)."""
    rng = _rng(seed, "conv", ci)
    return max(1, min(64, int(rng.paretovariate(1.3))))


def turn_spec(seed: int, ci: int, ti: int) -> TurnSpec:
    rng = _rng(seed, ci, ti)
    conv_id = f"conv-{ci:08d}"
    role = ROLES[ti % 3]
    tool = rng.choice(TOOLS) if role == "tool" else ""
    ts_us = BASE_TS_US + ci * 3_600_000_000 + ti * 30_000_000
    kind = rng.choices(_KINDS, weights=_KIND_WEIGHTS, k=1)[0]
    spec = TurnSpec(conv_id, ti, role, tool, ts_us, kind)

    if kind == "sentences":
        n_sent = rng.randint(1, 4)
        spec.sentences = [_fill_template(rng.choice(TEMPLATES), rng)
                          for _ in range(n_sent)]
        spec.raw_text = _noise_inject("".join(s.text for s in spec.sentences), rng)
    elif kind == "ascii":
        spec.raw_text = "ok, running the query now... stand by (step %d)" % ti
    elif kind == "digits":
        spec.raw_text = " ".join(str(rng.randint(1000, 999999)) for _ in range(4))
    elif kind == "short":
        spec.raw_text = rng.choice(["好的。", "嗯。", "收到！", "没问题。"])
    elif kind == "long":
        clause = _fill_template(TEMPLATES[-4], rng)   # plain SVO, sans 。
        body = "，".join(["".join(clause.words[:-1])] * 75) + "。"
        spec.raw_text = body          # >430 Chinese chars -> re-chunk path
    else:   # tool_json
        spec.raw_text = '{"status": "ok", "rows": %d, "elapsed_ms": %d}' % (
            rng.randint(0, 500), rng.randint(1, 900))
    return spec


def iter_turns(seed: int, num_convs: int, start: int = 0):
    for ci in range(start, start + num_convs):
        for ti in range(turn_count(seed, ci)):
            yield turn_spec(seed, ci, ti)


SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def transcripts_table(seed: int, num_convs: int, start: int = 0) -> pa.Table:
    cols = {name: [] for name in SCHEMA.names}
    for s in iter_turns(seed, num_convs, start):
        cols["conv_id"].append(s.conv_id)
        cols["turn_idx"].append(s.turn_idx)
        cols["role"].append(s.role)
        cols["text"].append(s.raw_text)
        cols["tool"].append(s.tool)
        cols["ts"].append(s.ts_us)
    arrays = [
        pa.array(cols["conv_id"], pa.string()),
        pa.array(cols["turn_idx"], pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(np.asarray(cols["ts"], dtype="int64"), pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=SCHEMA)


def write_transcripts(out_dir: str, seed: int, num_convs: int,
                      files: int | None = None) -> str:
    """Write the transcripts table as multiple Parquet files (multi-block
    read path); idempotent for a given (seed, num_convs).

    File count scales with corpus size so the downstream read parallelizes —
    one file per ~250 conversations (at 100 TB this is the "one shard per
    input partition" layout the resumable writer produces)."""
    if files is None:
        files = max(4, min(256, num_convs // 250))
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f"_DONE_{seed}_{num_convs}_{files}")
    if os.path.exists(marker):
        return out_dir

    # one shard per file, each a contiguous conv range — generation is a pure
    # function of (seed, conv_idx), so shards are independent and run as Ray
    # tasks when a Ray session exists (sequential fallback otherwise)
    per_convs = max(1, (num_convs + files - 1) // files)
    shards = [(k, k * per_convs, min(per_convs, num_convs - k * per_convs))
              for k in range(files) if k * per_convs < num_convs]

    def _write_shard(k: int, start: int, count: int) -> None:
        pq.write_table(transcripts_table(seed, count, start),
                       os.path.join(out_dir, f"transcripts-{k:04d}.parquet"))

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:
        pass
    if use_ray and len(shards) > 1:
        import ray

        shard_task = ray.remote(num_cpus=1)(_write_shard)
        ray.get([shard_task.remote(k, s, c) for k, s, c in shards])
    else:
        for k, s, c in shards:
            _write_shard(k, s, c)
    with open(marker, "w") as fp:
        fp.write("ok")
    return out_dir


#: scale presets keyed off the testdata sf directory names
SF_PRESETS = {
    "sf0.001": (42, 200),
    "sf0.01": (42, 2000),
    "sf0.1": (42, 600000),
    "sf1": (42, 6000000),
}


def transcripts_dir_for_sf(sf_dir: str, base: str = "/tmp/entgraph_transcripts") -> str:
    """Deterministic transcript corpus matching a testdata scale factor."""
    name = os.path.basename(os.path.normpath(sf_dir))
    seed, num_convs = SF_PRESETS.get(name, (42, 2000))
    out = os.path.join(base, name)
    return write_transcripts(out, seed, num_convs)
