"""Parses -> triples (the extraction-cascade stage).

Stateless ``map_batches`` over Arrow batches: per sentence row, run the pure
rule cascade (``functions/cascade.process_sentence`` — extraction, amendments,
filters, negation, coarsification; reference post_processing
/root/reference/dudepparse.py:1718-1786) and explode the five relation streams
into one row per triple.

The POS map is derived from the static gazetteer (the analog of
corenlp_pos_tags, reference main_ner.py:36-40) — module-constant state shipped
with the code, so no broadcast is needed.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.cascade import DEFAULT_CONFIG, ExtractionConfig, process_sentence
from ..functions.lexicon import pos_map_for_words

TRIPLES_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("rel_kind", pa.string()),       # fine | coarse | amend_fine | amend_coarse | possible
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_idx", pa.int32()),
    ("pred_idx", pa.int32()),
    ("obj_idx", pa.int32()),
    ("negated", pa.bool_()),
])


# Per-process memo: full parse key -> flattened triple rows.  Transcript
# corpora repeat sentences heavily (tool outputs, greetings, boilerplate), and
# the cascade is a pure function of the parse, so identical sentences are
# extracted once per worker.  Bounded so the worker heap stays flat at 100 TB.
_EXTRACT_MEMO: dict[tuple, dict[str, list]] = {}
_EXTRACT_MEMO_MAX = 0 if __import__('os').environ.get('GRAFT_NO_MEMO') else 200_000


def _cascade_rows(words, heads, deprels,
                  config: ExtractionConfig = DEFAULT_CONFIG) -> list:
    """Cached pure-cascade result: list of per-triple row tuples.  The memo
    is partitioned by config (a different flag set is a different function)."""
    memo = _EXTRACT_MEMO.setdefault(config, {})
    key = "\x00".join(words) + "|" + ",".join(map(str, heads)) \
        + "|" + ",".join(deprels)
    rows = memo.get(key)
    if rows is None:
        ddp = {"word": words, "head": heads, "deprel": deprels}
        streams = process_sentence(ddp, pos_map_for_words(words), config=config)
        rows = [
            (kind, names[0], names[1], names[2], idxs[0], idxs[1], idxs[2],
             bool(names[1] and names[1].startswith("否·")))
            for kind, rels in streams.items()
            for (names, _, idxs) in rels
        ]
        if len(memo) < _EXTRACT_MEMO_MAX:
            memo[key] = rows
    return rows


def extract_triples(batch: pa.Table,
                    config: ExtractionConfig = DEFAULT_CONFIG) -> pa.Table:
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    sent_idxs = batch.column("sent_idx").to_pylist()
    words_col = batch.column("words").to_pylist()
    heads_col = batch.column("heads").to_pylist()
    deprels_col = batch.column("deprels").to_pylist()

    cols: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}
    for cid, tid, sid, words, heads, deprels in zip(
            conv_ids, turn_idxs, sent_idxs, words_col, heads_col, deprels_col):
        for kind, s, p, o, si, vi, oi, neg in _cascade_rows(
                words, heads, deprels, config):
            cols["conv_id"].append(cid)
            cols["turn_idx"].append(tid)
            cols["sent_idx"].append(sid)
            cols["rel_kind"].append(kind)
            cols["subj"].append(s)
            cols["pred"].append(p)
            cols["obj"].append(o)
            cols["subj_idx"].append(si)
            cols["pred_idx"].append(vi)
            cols["obj_idx"].append(oi)
            cols["negated"].append(neg)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLES_SCHEMA],
        schema=TRIPLES_SCHEMA)
