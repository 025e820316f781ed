"""Distributed BM25 ranked retrieval — the lexical-search scoring op behind
quality-weighted corpus sampling, retrieval-based decontamination checks and
seed-document expansion in large curation pipelines (Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", 2009).

Scale shape (everything driver-side is O(|query|) scalars):

1. **tf, in-batch**: (doc, term, tf) triples from ONE vectorized
   ``map_batches`` (shared with :mod:`tfidf` — same tokenizer, so BM25 and
   TF-IDF rank over the identical vocabulary).  Materialized once, reused
   by the three aggregates below.
2. **corpus stats**: N from ``count()``; total token mass (-> avgdl) from
   one pre-combined hash aggregate.  Two driver scalars.
3. **query terms**: top-``n_query_terms`` by collection frequency
   (sum tf desc, term asc) — one aggregate over the tf triples, a
   ``limit(n)`` take of n rows.  The query is data-derived and
   deterministic, standing in for a user query at test time; callers can
   pass an explicit ``query_terms`` list instead (the 100-TB path: terms
   come from the user, no aggregate runs).
4. **df**: tf rows are distinct per (doc, term), so document frequency of
   the query terms is one filtered aggregate — |query| rows, broadcast
   into the scoring stage as a plain dict (never a shuffle join; the
   query side is tiny by definition).
5. **score + top-k**: per-(doc, term) partial scores need the doc length,
   attached by ONE keyed lookup join (doc-length table, built in step 2's
   pass); per-doc sum via the pre-combined hash aggregate; global top-k =
   sort on the ROUNDED score + limit — k rows leave the cluster.

Scores are rounded half-away-from-zero (4 digits) BEFORE the final
ranking, so the DuckDB oracle (same pipeline in SQL) reproduces the
ordering bit-for-bit; ties break on doc_id ascending.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tfidf import _term_freqs


def bm25_topk(docs_ds, *, k: int = 20, k1: float = 1.2, b: float = 0.75,
              n_query_terms: int = 3, query_terms: list[str] | None = None,
              id_col: str = "doc_id", text_col: str = "text",
              round_digits: int = 4):
    """documents -> top-``k`` (id_col, bm25) rows, scored against
    ``query_terms`` (default: the ``n_query_terms`` highest-collection-
    frequency terms, ties broken lexically).  idf uses the standard
    +1-inside-the-log variant: ln((N - df + 0.5)/(df + 0.5) + 1), which is
    always positive (Lucene's choice), so stop-word-heavy queries cannot
    produce negative partials."""
    from ..functions.fputil import np_round_away
    from .groupagg import auto_hash_aggregate
    from .joins import lookup_join

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    exploded = docs_ds.map_batches(
        lambda t: _term_freqs(t, id_col, text_col),
        batch_format="pyarrow").materialize()   # reused by 3 aggregates
    n_docs = float(docs_ds.count())

    # doc lengths (sum tf per doc) — also yields avgdl in one pass.
    dl_tbl = auto_hash_aggregate(exploded, [id_col], [("tf", "sum")])
    dl_tbl = dl_tbl.map_batches(
        lambda t: t.rename_columns([id_col, "dl"]),
        batch_format="pyarrow").materialize()   # reused: avgdl + the join
    total_tokens = float(dl_tbl.sum("dl") or 0.0)
    avgdl = total_tokens / max(n_docs, 1.0)

    if query_terms is None:
        cf = auto_hash_aggregate(exploded.select_columns(["term", "tf"]),
                                 ["term"], [("tf", "sum")])
        top = cf.sort(["tf", "term"], descending=[True, False]) \
                .limit(n_query_terms).take_all()
        query_terms = [r["term"] for r in top]
    qset = set(query_terms)

    # df per query term: tf rows are distinct per (doc, term) already.
    def qrows(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t.column("term"),
                                value_set=pa.array(sorted(qset)))
        return t.filter(mask)

    qtf = exploded.map_batches(qrows, batch_format="pyarrow").materialize()
    df_rows = auto_hash_aggregate(
        qtf.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("term"),
                 pa.array(np.ones(t.num_rows, dtype=np.int64))],
                names=["term", "df"]),
            batch_format="pyarrow"),
        ["term"], [("df", "sum")]).take_all()
    idf = {r["term"]: float(np.log((n_docs - r["df"] + 0.5)
                                   / (r["df"] + 0.5) + 1.0))
           for r in df_rows}

    scored_schema = pa.schema([(id_col, id_type), ("part", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return scored_schema.empty_table()
        tf = t.column("tf").to_numpy().astype(np.float64)
        dl = t.column("dl").to_numpy().astype(np.float64)
        # idf lookup via dictionary-encode: one Python step per DISTINCT
        # query term in the batch (<= |query|), numpy gather per row.
        enc = t.column("term").combine_chunks().dictionary_encode()
        by_code = np.array([idf[v] for v in enc.dictionary.to_pylist()],
                           dtype=np.float64)
        w = by_code[enc.indices.to_numpy()]
        part = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.Table.from_arrays(
            [t.column(id_col), pa.array(part, pa.float64())],
            names=[id_col, "part"])

    parts = lookup_join(qtf, dl_tbl, left_key=id_col, right_key=id_col,
                        payload=["dl"], suffix="") \
        .map_batches(score, batch_format="pyarrow")
    doc_scores = auto_hash_aggregate(parts, [id_col], [("part", "sum")])

    def rnd(t: pa.Table) -> pa.Table:
        s = np_round_away(t.column("part").to_numpy().astype(np.float64),
                          round_digits)
        return pa.Table.from_arrays(
            [t.column(id_col), pa.array(s, pa.float64())],
            names=[id_col, "bm25"])

    return (doc_scores.map_batches(rnd, batch_format="pyarrow")
            .sort(["bm25", id_col], descending=[True, False])
            .limit(k))
