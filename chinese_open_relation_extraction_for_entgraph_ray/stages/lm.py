"""Unigram LM quality scoring (the CCNet-style corpus-LM filter signal):
train a token LM over one corpus, score every document by mean token
log2-probability — low scores mark gibberish / boilerplate / wrong-language
docs for the curation gate.

Distributed shape mirrors the decontamination stage: token counts come
from ONE pre-combined aggregate (vocabulary cardinality, not corpus
size), the (token -> log-prob) table is ``ray.put`` once and read per
batch, scoring is a vectorized polars explode + join + grouped mean —
no shuffle on the scoring pass, no per-row Python.  A vocabulary beyond
``MAX_VOCAB`` fails loudly (at that size the LM table is itself big data;
shard it or prune to top-K before broadcasting).

Out-of-vocabulary tokens (scoring corpus B with corpus A's LM) get
``log2(oov_alpha / N)`` — additive smoothing at the floor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import TOKEN_RE_PORTABLE

#: refuse to broadcast an LM bigger than this many distinct tokens
MAX_VOCAB = 50_000_000


def unigram_lm(docs_ds, *, text_col: str = "text"):
    """Corpus -> ray.put((sorted token array, log2-prob array, total N)).
    Counts via the pre-combined aggregate; the broadcast is O(vocab)."""
    import ray

    from .groupagg import auto_hash_aggregate
    from .tfidf import _term_freqs

    def tf(batch: pa.Table) -> pa.Table:
        t = _term_freqs(batch, batch.column_names[0], text_col)
        return t.select(["term", "tf"])

    counts = auto_hash_aggregate(
        docs_ds.map_batches(tf, batch_format="pyarrow"),
        ["term"], [("tf", "sum")])
    toks, cnts = [], []
    total = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        toks.extend(b.column("term").to_pylist())
        cnts.extend(b.column("tf").to_pylist())
        if len(toks) > MAX_VOCAB:
            raise ValueError(
                f"vocabulary exceeds MAX_VOCAB ({MAX_VOCAB}) — prune to "
                "top-K or shard the LM instead of broadcasting")
    tok_arr = np.array(toks, dtype=object)
    cnt_arr = np.array(cnts, dtype=np.float64)
    total = float(cnt_arr.sum())
    order = np.argsort(tok_arr)
    logp = np.log2(cnt_arr[order] / max(total, 1.0))
    return ray.put((tok_arr[order], logp, total))


def score_docs(docs_ds, lm_ref, *, doc_col: str = "doc_id",
               text_col: str = "text", oov_alpha: float = 0.5,
               passthrough: tuple[str, ...] = ()):
    """docs -> (doc_id, n_tokens, lm_logp) where lm_logp = round(mean
    token log2-prob, 4); empty docs score null.  ``passthrough`` carries
    extra input columns (e.g. ``lang``) onto the output rows — the batch
    already holds them, so downstream consumers skip a keyed re-attach
    join and a second scan of the source table."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl

        toks, logp, total = ray.get(lm_ref)
        oov = float(np.log2(oov_alpha / max(total, 1.0)))
        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch.column(doc_col)),
            "text": pl.from_arrow(batch.column(text_col)),
            **{c: pl.from_arrow(batch.column(c).combine_chunks())
               for c in passthrough},
        })
        exploded = df.with_columns(
            pl.col("text").str.extract_all(TOKEN_RE_PORTABLE).alias("tok")) \
            .select(["doc_id", "tok"]).explode("tok").drop_nulls("tok")
        idx = np.searchsorted(toks, exploded["tok"].to_numpy())
        idx_c = np.minimum(idx, len(toks) - 1)
        hit = (len(toks) > 0) & (toks[idx_c] == exploded["tok"].to_numpy())
        tok_logp = np.where(hit, logp[idx_c], oov)
        scored = exploded.with_columns(
            pl.Series("lp", tok_logp)).group_by("doc_id").agg(
            pl.len().alias("n_tokens"), pl.col("lp").mean().alias("m"))
        out = df.select(["doc_id", *passthrough]).join(
            scored, on="doc_id", how="left")
        n_tok = out["n_tokens"].fill_null(0).to_numpy().astype(np.int64)
        m = out["m"].to_numpy().astype(np.float64)   # nulls -> NaN
        return pa.Table.from_arrays(
            [pa.array(out["doc_id"].to_numpy()),
             pa.array(n_tok, pa.int64()),
             # token-less docs carry a NULL score (matching SQL's avg of
             # an empty group), not NaN
             pa.array(np.round(m, 4), pa.float64(), mask=np.isnan(m)),
             *(out[c].to_arrow() for c in passthrough)],
            names=[doc_col, "n_tokens", "lm_logp", *passthrough])

    return docs_ds.map_batches(score, batch_format="pyarrow")
