"""JSON/JSONL corpus ingestion -> the transcripts schema (S1-S3 parity).

The reference reads three corpus layouts (reference preprocess_corpus.py):
- a directory of one-JSON-object-per-file articles, field ``text``
  (main_webhose, :166-196),
- newline-delimited JSON with field ``content`` (main_clue, :238-273),
- newline-delimited JSON with a pre-split ``splitted_text`` list
  (main_newsspike, :318-357).

Each adapter returns a Ray Dataset with the engine's transcripts schema
(``conv_id, turn_idx, role, text, tool, ts``) so any such corpus feeds
straight into ``build_kg`` with no pre-conversion step.  Document corpora
map one entry -> one conversation: ``turn_idx`` 0 for whole-text entries, or
one turn per pre-split element for the newsspike dialect.

Scale shape: ``read_text`` / ``read_binary_files`` split across files and
byte ranges like any Ray datasource; parsing is per-batch ``json.loads`` —
no driver-side loops.

Conversation ids: ``id_field`` when the corpus has one, else the md5 of the
raw entry — byte-identical duplicate entries then collapse into ONE
conversation (dedup-at-ingest; the reference has no entry ids either and
relies on downstream dedup).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([r["conv_id"] for r in rows], pa.string()),
         pa.array([r["turn_idx"] for r in rows], pa.int32()),
         pa.array([r.get("role", "doc") for r in rows], pa.string()),
         pa.array([r["text"] for r in rows], pa.string()),
         pa.array([r.get("tool") for r in rows], pa.string()),
         pa.array([r.get("ts") for r in rows], pa.timestamp("us"))],
        schema=TRANSCRIPTS_SCHEMA)


def _entry_rows(entry: dict, raw: str, *, text_field: str,
                id_field: str | None, split_field: str | None) -> list[dict]:
    if id_field is not None and id_field in entry:
        conv_id = str(entry[id_field])
    else:
        conv_id = hashlib.md5(raw.encode("utf-8")).hexdigest()
    if split_field is not None:
        parts = entry.get(split_field) or []
        return [{"conv_id": conv_id, "turn_idx": i, "text": str(t)}
                for i, t in enumerate(parts)]
    text = entry.get(text_field)
    if text is None:
        return []
    return [{"conv_id": conv_id, "turn_idx": 0, "text": str(text)}]


def read_transcripts_jsonl(path: str, *, text_field: str = "text",
                           id_field: str | None = None,
                           split_field: str | None = None):
    """NDJSON file(s) -> transcripts Dataset.

    ``text_field="content"`` covers the reference's clue dialect
    (preprocess_corpus.py:273); ``split_field="splitted_text"`` the
    newsspike dialect (:343 — one turn per pre-split element)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for line in batch.column("text").to_pylist():
            if not line or not line.strip():
                continue
            rows.extend(_entry_rows(json.loads(line), line,
                                    text_field=text_field,
                                    id_field=id_field,
                                    split_field=split_field))
        return _rows_to_table(rows)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_transcripts_json_dir(path: str, *, text_field: str = "text",
                              id_field: str | None = None):
    """Directory of one-JSON-object-per-file articles -> transcripts
    Dataset (the reference's webhose layout, preprocess_corpus.py:166-196).
    ``conv_id`` falls back to the file's basename (stable and unique per
    directory) when ``id_field`` is absent.  Robust to pretty-printed
    (multi-line) objects — each FILE is parsed whole."""
    import ray.data as rd

    def parse(batch: "dict") -> pa.Table:
        rows: list[dict] = []
        for raw, fpath in zip(batch["bytes"], batch["path"]):
            text = raw.decode("utf-8")
            entry = json.loads(text)
            if id_field is not None and id_field in entry:
                conv_id = str(entry[id_field])
            else:
                conv_id = os.path.basename(fpath)
            body = entry.get(text_field)
            if body is None:
                continue
            rows.append({"conv_id": conv_id, "turn_idx": 0,
                         "text": str(body)})
        return _rows_to_table(rows)

    return rd.read_binary_files(path, include_paths=True) \
             .map_batches(parse, batch_format="numpy")
