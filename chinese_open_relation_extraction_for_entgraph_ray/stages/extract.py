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

from ..functions.cascade import process_sentence
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


def extract_triples(batch: pa.Table) -> pa.Table:
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    sent_idxs = batch.column("sent_idx").to_pylist()
    words_col = batch.column("words").to_pylist()
    heads_col = batch.column("heads").to_pylist()
    deprels_col = batch.column("deprels").to_pylist()

    cols: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}
    for cid, tid, sid, words, heads, deprels in zip(
            conv_ids, turn_idxs, sent_idxs, words_col, heads_col, deprels_col):
        ddp = {"word": words, "head": heads, "deprel": deprels}
        streams = process_sentence(ddp, pos_map_for_words(words))
        for kind, rels in streams.items():
            for rel in rels:
                names, _, idxs = rel
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tid)
                cols["sent_idx"].append(sid)
                cols["rel_kind"].append(kind)
                cols["subj"].append(names[0])
                cols["pred"].append(names[1])
                cols["obj"].append(names[2])
                cols["subj_idx"].append(idxs[0])
                cols["pred_idx"].append(idxs[1])
                cols["obj_idx"].append(idxs[2])
                cols["negated"].append(bool(names[1] and names[1].startswith("否·")))
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLES_SCHEMA],
        schema=TRIPLES_SCHEMA)
