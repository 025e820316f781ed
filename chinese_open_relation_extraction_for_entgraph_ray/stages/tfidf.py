"""Distributed TF-IDF top-terms — per-document salient-term extraction,
the classic corpus-statistics op behind keyword tagging, topic labeling and
lexical search indexing in large curation pipelines.

Scale shape (three bounded exchanges, nothing driver-side):

1. **tf, in-batch**: each document is whole inside its row, so the
   (doc, term, tf) triples come out of ONE vectorized ``map_batches``
   (polars extract_all -> explode -> group) with no shuffle at all.
2. **df**: the (doc, term) rows are distinct by construction, so document
   frequency is one :func:`groupagg.auto_hash_aggregate` over ``term``
   (block pre-combine first; exchange bounded at one row per (block,
   distinct term)).
3. **idf join + grouped top-k**: one sorted-block lookup join attaches df
   to the term rows, then one sorted-block grouped apply ranks each doc's
   terms by (rounded score desc, term asc) and keeps k — C-level pandas
   head/cumcount per block, no per-doc Python.

Scores are ``tf * ln(N/df)`` rounded half-away-from-zero (4 digits) and
the RANKING uses the rounded value, so the DuckDB oracle — the same three
steps in SQL — is reproducible bit-for-bit (ranking on raw doubles would
let a 1-ulp libm difference reorder near-ties across systems).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import TOKEN_RE_PORTABLE


def _term_freqs(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    import polars as pl

    if batch.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], batch.schema.field(id_col).type),
             pa.array([], pa.string()), pa.array([], pa.int64())],
            names=[id_col, "term", "tf"])
    frame = pl.DataFrame({
        id_col: pl.from_arrow(batch.column(id_col).combine_chunks()),
        "term": pl.from_arrow(
            pa.compute.fill_null(batch.column(text_col), "")
            .combine_chunks()).str.extract_all(TOKEN_RE_PORTABLE),
    })
    tf = (frame.explode("term").drop_nulls("term")
          .group_by([id_col, "term"]).len().rename({"len": "tf"})
          .with_columns(pl.col("tf").cast(pl.Int64)))
    return tf.to_arrow().cast(pa.schema(
        [(id_col, batch.schema.field(id_col).type),
         ("term", pa.string()), ("tf", pa.int64())]))


def tfidf_top_terms(docs_ds, *, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text", round_digits: int = 4):
    """documents -> top-``k`` rows per doc: (id_col, term, tf, df, tfidf,
    rank), ranked by (tfidf desc, term asc) with tfidf rounded before
    ranking (see module docstring)."""
    from ..functions.fputil import np_round_away
    from .blockgroup import sorted_map_groups
    from .groupagg import auto_hash_aggregate
    from .joins import lookup_join

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    exploded = docs_ds.map_batches(
        lambda b: _term_freqs(b, id_col, text_col),
        batch_format="pyarrow").materialize()   # reused by df-agg AND join
    n_docs = docs_ds.count()

    def ones(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("term"),
             pa.array(np.ones(b.num_rows, dtype=np.int64))],
            names=["term", "df"])

    df_tbl = auto_hash_aggregate(
        exploded.map_batches(ones, batch_format="pyarrow"),
        ["term"], [("df", "sum")])

    joined = lookup_join(exploded, df_tbl, left_key="term",
                         right_key="term", payload=["df"], suffix="")

    def score(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy().astype(np.float64)
        df = b.column("df").to_numpy().astype(np.float64)
        s = np_round_away(tf * np.log(float(n_docs) / df), round_digits)
        return b.append_column("tfidf", pa.array(s, pa.float64()))

    schema = pa.schema([(id_col, id_type), ("term", pa.string()),
                        ("tf", pa.int64()), ("df", pa.int64()),
                        ("tfidf", pa.float64()), ("rank", pa.int64())])

    def topk_block(df_: pd.DataFrame) -> pd.DataFrame:
        g = df_.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True], kind="mergesort")
        grp = g.groupby(id_col, sort=False)
        top = grp.head(k).copy()
        top["rank"] = top.groupby(id_col, sort=False).cumcount() + 1
        return top[[id_col, "term", "tf", "df", "tfidf", "rank"]]

    return sorted_map_groups(
        joined.map_batches(score, batch_format="pyarrow"),
        [id_col], block_fn=topk_block, schema=schema)
