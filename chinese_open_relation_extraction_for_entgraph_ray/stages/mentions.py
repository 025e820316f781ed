"""Batched mention detection + link scoring over sentence rows.

The reference runs CoreNLP NER per sentence and keeps every non-O/PERCENT
token mention with char spans plus a word->POS map
(`/root/reference/main_ner.py:9-41`, mention dict built at :33, spans at
:24-31), then merges per-slice NER label histograms (:126-127, :137-152).

Here the detector is the deterministic gazetteer automaton shipped with the
code (SURVEY.md §7.0 — no CoreNLP/JVM in this environment): a compiled
longest-first alternation regex held warm per actor, emitting one row per
mention with char span, NER label, the canonical entity id, and a link score
(exact surface = 1.0, alias = 0.9 — the "entity-link scoring" the north rule
asks for; a learned linker would slot into the same actor).

Scale shape: pure actor-pool ``map_batches`` over pyarrow batches — no
shuffle; the label histogram is a small ``groupby`` downstream.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.lexicon import ENTITY_ALIASES, NER_GAZETTEER

MENTIONS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("surface", pa.string()),
    ("label", pa.string()),
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),       # exclusive, like main_ner.py spans
    ("entity_id", pa.string()),
    ("link_score", pa.float64()),
])


class MentionDetector:
    """Actor-pool stage: sentences(conv_id, turn_idx, sent_idx, text) ->
    mentions rows (one per gazetteer/alias hit, leftmost-longest)."""

    def __init__(self):
        surfaces = sorted(set(NER_GAZETTEER) | set(ENTITY_ALIASES),
                          key=len, reverse=True)
        self._re = re.compile("|".join(re.escape(s) for s in surfaces))

    def _label_and_link(self, surface: str) -> tuple[str, str, float]:
        canon = ENTITY_ALIASES.get(surface)
        if canon is not None:
            return NER_GAZETTEER.get(canon, "MISC"), canon, 0.9
        return NER_GAZETTEER.get(surface, "MISC"), surface, 1.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        sent_idxs = batch.column("sent_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {n: [] for n in MENTIONS_SCHEMA.names}
        for cid, tid, sid, text in zip(conv_ids, turn_idxs, sent_idxs, texts):
            for m in self._re.finditer(text or ""):
                label, ent, score = self._label_and_link(m.group(0))
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tid)
                cols["sent_idx"].append(sid)
                cols["surface"].append(m.group(0))
                cols["label"].append(label)
                cols["span_start"].append(m.start())
                cols["span_end"].append(m.end())
                cols["entity_id"].append(ent)
                cols["link_score"].append(score)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in MENTIONS_SCHEMA],
            schema=MENTIONS_SCHEMA)


def detect_mentions(sentences_ds, concurrency: int = 4):
    return sentences_ds.map_batches(MentionDetector, batch_format="pyarrow",
                                    batch_size=4096, concurrency=concurrency)


def _add_sent_key(batch: pa.Table) -> pa.Table:
    """Composite (conv_id, turn_idx, sent_idx) key as one string column —
    the join key for the reuse-vs-rerun split."""
    import pyarrow.compute as pc

    k = pc.binary_join_element_wise(
        batch.column("conv_id").cast(pa.string()),
        batch.column("turn_idx").cast(pa.string()),
        batch.column("sent_idx").cast(pa.string()), "|")
    return batch.append_column("__sk", k)


def mentions_with_coref(sentences_ds, parses_ds, concurrency: int = 4):
    """M18: mention detection over coref-substituted text (reference
    main_ner.py:484-559).  NER re-runs ONLY over sentences the pronoun
    substitution changed; unchanged sentences reuse the original-text
    detection (the reference's reuse branch, :530-534).  Output =
    MENTIONS_SCHEMA + ``source`` ('orig' reused / 'coref' re-run over
    substituted text) — coref-recovered entities appear with
    source='coref'.

    Scale shape: one sorted-block grouped apply (conv_id) to find changed
    sentences, one distributed anti-join to split reuse-vs-rerun, then the
    same actor-pool detector over both branches; no driver-side key sets."""
    from .coref import corefed_sentence_rows
    from .joins import semi_join

    corefed = corefed_sentence_rows(parses_ds).materialize()
    changed_keys = corefed.map_batches(_add_sent_key, batch_format="pyarrow") \
                          .map_batches(lambda b: b.select(["__sk"]),
                                       batch_format="pyarrow")
    reuse = (semi_join(
        sentences_ds.map_batches(_add_sent_key, batch_format="pyarrow"),
        changed_keys, left_key="__sk", right_key="__sk", anti=True,
        # __sk is a computed join of non-null id columns — never null, so
        # skip the anti mode's null-key second scan (it would re-execute
        # the unmaterialized sentence pipeline for provably zero rows)
        left_key_nullable=False)
        .map_batches(lambda b: b.drop_columns(["__sk"]),
                     batch_format="pyarrow"))

    def tag(source: str):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "source", pa.array([source] * batch.num_rows, pa.string()))
        return _t

    rerun_sents = corefed.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "sent_idx", "text"]),
        batch_format="pyarrow")
    return detect_mentions(reuse, concurrency=concurrency) \
        .map_batches(tag("orig"), batch_format="pyarrow") \
        .union(detect_mentions(rerun_sents, concurrency=concurrency)
               .map_batches(tag("coref"), batch_format="pyarrow"))


def mention_label_histogram(mentions_ds):
    """NER label histogram (reference ner_token_bucket, main_ner.py:20-23,
    merged :137-152) as a grouped count."""
    from ray.data.aggregate import Count

    return mentions_ds.groupby("label").aggregate(Count(alias_name="n_mentions"))
