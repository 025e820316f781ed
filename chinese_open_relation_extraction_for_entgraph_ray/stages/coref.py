"""Conversation-level coreference stage (the reference's coref branch).

The reference runs CoreNLP coref over 1536-char document chunks, splices
representative mentions over pronouns, re-runs NER + extraction on changed
sentences, and keeps only triples NOT already found in the original sentence
(`/root/reference/main_ner.py:168-325`, `dudepparse.py:2149-2169`).

Transcript-native, deterministic rebuild: within one conversation, processed
in stable ``(turn_idx, sent_idx)`` order, the most recent PERSON gazetteer
mention is the active antecedent; a sentence-initial subject pronoun
(他/她/它/他们/她们) is substituted with it, the corefed sentence is re-parsed
and re-extracted, and the delta is computed as a serialize_rel anti-join
against the original sentence's triples (the M19 dedup,
dudepparse.py:2157-2166).

Ray mapping: ``groupby(conv_id).map_groups`` — the ONLY stage needing
cross-sentence state, keyed and sorted exactly like the reference's per-doc
loop; per-turn text equality and turn ordering are preserved because rows are
re-sorted inside the group, never by block order.
"""

from __future__ import annotations

import pandas as pd

from ..functions.cascade import process_sentence, serialize_rel
from ..functions.grammar import parse_sentence
from ..functions.lexicon import NER_GAZETTEER, PRONOUNS, pos_map_for_words

_PERSONS = {w for w, label in NER_GAZETTEER.items() if label == "PERSON"}
_PRONOUN_SET = set(PRONOUNS)

COREF_COLUMNS = ["conv_id", "turn_idx", "sent_idx", "rel_kind", "subj", "pred",
                 "obj", "subj_idx", "pred_idx", "obj_idx", "antecedent"]


def _sentence_triples(ddp: dict) -> dict[str, list]:
    return process_sentence(ddp, pos_map_for_words(ddp["word"]))


def coref_conversation(group: pd.DataFrame) -> pd.DataFrame:
    """One conversation's parse rows -> delta triples found only after
    pronoun substitution."""
    g = group.sort_values(["turn_idx", "sent_idx"])
    antecedent: str | None = None
    out: list[dict] = []
    # itertuples: ~10x cheaper than iterrows for this sequential scan
    for row in g.itertuples(index=False):
        words = list(row.words)
        pron_idx = next((i for i, w in enumerate(words)
                         if w in _PRONOUN_SET), None)
        if pron_idx is not None and antecedent is not None:
            ddp_orig = {"word": words, "head": list(row.heads),
                        "deprel": list(row.deprels)}
            orig = _sentence_triples(ddp_orig)
            orig_keys = {serialize_rel(r) for rels in orig.values() for r in rels}

            corefed_text = row.text.replace(words[pron_idx], antecedent, 1)
            ddp_new = parse_sentence(corefed_text)
            for kind, rels in _sentence_triples(ddp_new).items():
                for rel in rels:
                    if serialize_rel(rel) in orig_keys:
                        continue
                    out.append({
                        "conv_id": row.conv_id, "turn_idx": row.turn_idx,
                        "sent_idx": row.sent_idx,
                        "rel_kind": f"coref_{kind}",
                        "subj": rel[0][0], "pred": rel[0][1], "obj": rel[0][2],
                        "subj_idx": rel[2][0], "pred_idx": rel[2][1],
                        "obj_idx": rel[2][2], "antecedent": antecedent,
                    })
        # update the antecedent AFTER processing the sentence (a pronoun never
        # refers forward within its own sentence here)
        for w in words:
            if w in _PERSONS:
                antecedent = w
    if not out:
        return pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in COREF_COLUMNS})
    return pd.DataFrame(out, columns=COREF_COLUMNS)


SUBST_COLUMNS = ["conv_id", "turn_idx", "sent_idx", "text", "antecedent"]


def conversation_substitutions(group: "pd.DataFrame") -> "pd.DataFrame":
    """One conversation's parse rows -> the sentences whose text CHANGED
    under pronoun substitution, with the substituted text (the reference
    re-runs NER only on changed sentences and reuses otherwise,
    main_ner.py:484-559, reuse test :530-534).  Antecedent tracking is
    identical to :func:`coref_conversation` (updated AFTER each sentence)."""
    g = group.sort_values(["turn_idx", "sent_idx"])
    antecedent: str | None = None
    out: list[dict] = []
    for row in g.itertuples(index=False):
        words = list(row.words)
        pron_idx = next((i for i, w in enumerate(words)
                         if w in _PRONOUN_SET), None)
        if pron_idx is not None and antecedent is not None:
            corefed_text = row.text.replace(words[pron_idx], antecedent, 1)
            if corefed_text != row.text:
                out.append({"conv_id": row.conv_id,
                            "turn_idx": row.turn_idx,
                            "sent_idx": row.sent_idx,
                            "text": corefed_text,
                            "antecedent": antecedent})
        for w in words:
            if w in _PERSONS:
                antecedent = w
    if not out:
        return pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in SUBST_COLUMNS})
    return pd.DataFrame(out, columns=SUBST_COLUMNS)


def corefed_sentence_rows(parses_ds):
    """parses Dataset -> Dataset of coref-CHANGED sentences with substituted
    text (conv_id, turn_idx, sent_idx, text, antecedent) — the M18 input.
    Sorted-block grouped apply keyed by conv_id; no per-conversation
    dispatch at scale."""
    import pyarrow as pa

    from .blockgroup import sorted_map_groups

    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("sent_idx", pa.int32()), ("text", pa.string()),
                        ("antecedent", pa.string())])
    return sorted_map_groups(parses_ds, ["conv_id"],
                             conversation_substitutions, schema=schema)


COREF_SCHEMA = None     # built lazily (needs pyarrow)


def _coref_schema():
    import pyarrow as pa

    global COREF_SCHEMA
    if COREF_SCHEMA is None:
        COREF_SCHEMA = pa.schema([
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("sent_idx", pa.int32()), ("rel_kind", pa.string()),
            ("subj", pa.string()), ("pred", pa.string()),
            ("obj", pa.string()), ("subj_idx", pa.int32()),
            ("pred_idx", pa.int32()), ("obj_idx", pa.int32()),
            ("antecedent", pa.string())])
    return COREF_SCHEMA


def coref_chain_buckets(parses_ds) -> "pd.DataFrame":
    """The reference's ``coref_chain_bucket`` histogram (number of resolved
    coref chains per document -> document count, seeded with the 0 bucket
    and key-sorted; main_ner.py:332,380-381) — here: pronoun substitutions
    per conversation.  Distributed: substitution rows -> per-conv count ->
    bucket count; the 0 bucket is total conversations minus represented
    ones (one exact distinct-key aggregate).  Returns a small DataFrame
    (n_chains, n_conversations) — bounded by the max chains in any single
    conversation."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Count

    from .groupagg import sorted_hash_aggregate

    corefed = corefed_sentence_rows(parses_ds)

    def ones(batch: pa.Table) -> pa.Table:
        import numpy as np

        return pa.Table.from_arrays(
            [batch.column("conv_id"),
             pa.array(np.ones(batch.num_rows, dtype=np.int64))],
            names=["conv_id", "n_chains"])

    # per-conversation counts key on conv_id (millions at scale) — the
    # sorted-block aggregate, not the linear-in-groups builtin reduce
    # (VERDICT r2 #3); the n_chains bucket histogram below is tiny and
    # stays on the builtin groupby
    per_conv = sorted_hash_aggregate(
        corefed.map_batches(ones, batch_format="pyarrow"),
        ["conv_id"], [("n_chains", "sum")])
    bucket_rows = per_conv.groupby("n_chains").aggregate(
        Count(alias_name="n_conversations")).take_all()
    total_convs = sorted_hash_aggregate(
        parses_ds.map_batches(lambda t: t.select(["conv_id"]),
                              batch_format="pyarrow"),
        ["conv_id"], []).count()
    buckets = {int(r["n_chains"]): int(r["n_conversations"])
               for r in bucket_rows}
    buckets[0] = total_convs - sum(buckets.values())
    keys = sorted(buckets)
    return pd.DataFrame({"n_chains": keys,
                         "n_conversations": [buckets[k] for k in keys]})


def coref_delta_triples(parses_ds, scale: bool = True):
    """parses Dataset -> coref delta-triples Dataset (shuffle key: conv_id).

    ``scale=False``: plain ``groupby(conv_id).map_groups`` — simplest, but
    Ray's per-group dispatch (~60µs/group) dominates once conversations
    number in the millions.

    ``scale=True`` (default): the sorted-block grouped apply
    (``stages/blockgroup.sorted_map_groups``) — one sort by conv_id,
    :func:`coref_conversation` runs inline per block, boundary-straddling
    conversations through the tiny second pass."""
    if not scale:
        return parses_ds.groupby("conv_id").map_groups(
            coref_conversation, batch_format="pandas")

    from .blockgroup import sorted_map_groups

    return sorted_map_groups(parses_ds, ["conv_id"], coref_conversation,
                             schema=_coref_schema())
