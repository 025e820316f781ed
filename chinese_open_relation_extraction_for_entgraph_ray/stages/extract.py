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


def _cascade_columns(words, heads, deprels,
                     config: ExtractionConfig = DEFAULT_CONFIG) -> tuple:
    """Cached pure-cascade result in COLUMNAR form:
    (kinds, subjs, preds, objs, subj_idxs, pred_idxs, obj_idxs, negated, n).
    Columnar so the replay path extends whole columns per sentence instead of
    appending per row.  The memo is partitioned by config (a different flag
    set is a different function)."""
    memo = _EXTRACT_MEMO.setdefault(config, {})
    key = "\x00".join(words) + "|" + ",".join(map(str, heads)) \
        + "|" + ",".join(deprels)
    cols = memo.get(key)
    if cols is None:
        ddp = {"word": words, "head": heads, "deprel": deprels}
        streams = process_sentence(ddp, pos_map_for_words(words), config=config)
        kinds, subjs, preds, objs = [], [], [], []
        sis, vis, ois, negs = [], [], [], []
        for kind, rels in streams.items():
            for (names, _, idxs) in rels:
                kinds.append(kind)
                subjs.append(names[0])
                preds.append(names[1])
                objs.append(names[2])
                sis.append(idxs[0])
                vis.append(idxs[1])
                ois.append(idxs[2])
                negs.append(bool(names[1] and names[1].startswith("否·")))
        cols = (kinds, subjs, preds, objs, sis, vis, ois, negs, len(kinds))
        if len(memo) < _EXTRACT_MEMO_MAX:
            memo[key] = cols
    return cols


# reference bucket names (merge_parsed_results.py:82-90) keyed by the
# counter-prefix process_sentence emits
_HIST_BUCKETS = {
    "fine_stop::": "fine_stop_word_count_bucket",
    "coarse_stop::": "coarse_stop_word_count_bucket",
    "vcmp::": "vcmp_bucket",
}

_COUNTER_MEMO: dict = {}
_COUNTER_MEMO_MAX = _EXTRACT_MEMO_MAX


def _sentence_hist_counters(words, heads, deprels,
                            config: ExtractionConfig) -> list[tuple]:
    """[(bucket, token, n)] for one sentence — memoized per worker like the
    triple cascade (same duplicate-heavy-corpus argument)."""
    memo = _COUNTER_MEMO.setdefault(config, {})
    key = "\x00".join(words) + "|" + ",".join(map(str, heads)) \
        + "|" + ",".join(deprels)
    rows = memo.get(key)
    if rows is None:
        counters: dict = {}
        process_sentence({"word": words, "head": heads, "deprel": deprels},
                         pos_map_for_words(words), counters, config=config)
        rows = []
        for ck, n in counters.items():
            for prefix, bucket in _HIST_BUCKETS.items():
                if ck.startswith(prefix):
                    rows.append((bucket, ck[len(prefix):], n))
                    break
        if len(memo) < _COUNTER_MEMO_MAX:
            memo[key] = rows
    return rows


def filter_histograms(parses_ds, config: ExtractionConfig = DEFAULT_CONFIG):
    """The reference's sorted stop-word / V_CMP-complement histograms
    (fine/coarse_stop_word_count_bucket + vcmp_bucket filled per slice,
    dudepparse.py:296-309,1724-1725, merged and count-sorted in
    merge_parsed_results.py:100-106,133-135) as a distributed view:
    per-batch counter rows -> grouped sum -> count-desc sort per bucket.
    Returns (bucket, token, n) rows."""
    from .groupagg import auto_hash_aggregate

    def batch_counts(batch: pa.Table) -> pa.Table:
        agg: dict[tuple, int] = {}
        for words, heads, deprels in zip(batch.column("words").to_pylist(),
                                         batch.column("heads").to_pylist(),
                                         batch.column("deprels").to_pylist()):
            for bucket, token, n in _sentence_hist_counters(
                    words, heads, deprels, config):
                agg[(bucket, token)] = agg.get((bucket, token), 0) + n
        keys = list(agg)
        return pa.Table.from_arrays(
            [pa.array([k[0] for k in keys], pa.string()),
             pa.array([k[1] for k in keys], pa.string()),
             pa.array([agg[k] for k in keys], pa.int64())],
            names=["bucket", "token", "n"])

    # (bucket, token) cardinality is vocabulary-bound — same
    # observed-cardinality dispatch as the other token-keyed aggregates
    return (auto_hash_aggregate(
                parses_ds.map_batches(batch_counts, batch_format="pyarrow"),
                ["bucket", "token"], [("n", "sum")])
            .sort(["bucket", "n", "token"], descending=[False, True, False]))


def extract_triples(batch: pa.Table,
                    config: ExtractionConfig = DEFAULT_CONFIG) -> pa.Table:
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    sent_idxs = batch.column("sent_idx").to_pylist()
    words_col = batch.column("words").to_pylist()
    heads_col = batch.column("heads").to_pylist()
    deprels_col = batch.column("deprels").to_pylist()

    out_conv: list = []
    out_turn: list = []
    out_sent: list = []
    out = ([], [], [], [], [], [], [], [])   # kinds..negs, column-parallel
    for cid, tid, sid, words, heads, deprels in zip(
            conv_ids, turn_idxs, sent_idxs, words_col, heads_col, deprels_col):
        cols = _cascade_columns(words, heads, deprels, config)
        n = cols[8]
        if not n:
            continue
        out_conv.extend([cid] * n)
        out_turn.extend([tid] * n)
        out_sent.extend([sid] * n)
        for acc, col in zip(out, cols):
            acc.extend(col)
    arrays = [pa.array(out_conv, pa.string()),
              pa.array(out_turn, pa.int32()),
              pa.array(out_sent, pa.int32()),
              pa.array(out[0], pa.string()),     # rel_kind
              pa.array(out[1], pa.string()),     # subj
              pa.array(out[2], pa.string()),     # pred
              pa.array(out[3], pa.string()),     # obj
              pa.array(out[4], pa.int32()),      # subj_idx
              pa.array(out[5], pa.int32()),      # pred_idx
              pa.array(out[6], pa.int32()),      # obj_idx
              pa.array(out[7], pa.bool_())]      # negated
    return pa.Table.from_arrays(arrays, schema=TRIPLES_SCHEMA)
