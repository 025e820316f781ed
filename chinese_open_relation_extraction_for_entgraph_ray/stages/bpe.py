"""Distributed BPE vocabulary learning — the tokenizer-training step of
an LLM data pipeline (Sennrich et al. 2016).  The corpus-scale work is
ONE word-frequency aggregate (the same pre-combined exchange as the
LM/tfidf stages: cardinality = vocabulary, never corpus size); the
merge loop itself runs over that word-frequency table — O(vocab), the
standard shape of production tokenizer trainers, which never stream
the corpus per merge round.

Determinism: merge selection is (pair frequency DESC, pair
lexicographic ASC) — no hash-order or insertion-order dependence, so
the learned merge table is a pure function of the word-frequency
multiset and therefore of the corpus, regardless of partitioning.

Encoding (applying a learned merge table to new text) is a broadcast
pattern: the merge ranks ship once via ``ray.put``; each batch encodes
only its UNIQUE words (memoized per batch) and re-expands — O(block
vocabulary × token length), not O(block tokens).

A vocabulary beyond ``MAX_VOCAB`` distinct words fails loudly: at that
size the word-frequency table is itself big data and the merge loop
must move to sampled/streamed counting (noted, not implemented).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import TOKEN_RE_PORTABLE

#: refuse to pull a word-frequency table bigger than this to the driver
MAX_VOCAB = 10_000_000

#: end-of-word sentinel (classic BPE '</w>' marker)
EOW = "</w>"


def word_frequencies(docs_ds, *, text_col: str = "text") -> dict[str, int]:
    """Corpus -> {word: count} via one pre-combined distributed
    aggregate; the dict is vocabulary-sized."""
    from .groupagg import auto_hash_aggregate

    def tf(batch: pa.Table) -> pa.Table:
        import polars as pl

        toks = (pl.DataFrame({
            "t": pl.from_arrow(
                pa.compute.fill_null(batch.column(text_col), "")
                .combine_chunks()).str.extract_all(TOKEN_RE_PORTABLE)})
            .explode("t").drop_nulls("t")
            .group_by("t").len().rename({"len": "n"})
            .with_columns(pl.col("n").cast(pl.Int64)))
        return toks.to_arrow().cast(
            pa.schema([("t", pa.string()), ("n", pa.int64())]))

    agg = auto_hash_aggregate(
        docs_ds.map_batches(tf, batch_format="pyarrow"),
        ["t"], [("n", "sum")])
    freqs: dict[str, int] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        for w, n in zip(b.column("t").to_pylist(),
                        b.column("n").to_pylist()):
            freqs[w] = int(n)
        if len(freqs) > MAX_VOCAB:
            raise ValueError(
                f"word vocabulary exceeds MAX_VOCAB ({MAX_VOCAB}) — "
                "switch the merge loop to sampled/streamed pair counting")
    return freqs


def learn_bpe(word_freqs: dict[str, int],
              n_merges: int) -> list[tuple[str, str, int]]:
    """Word-frequency dict -> ordered merge list [(left, right, pair
    frequency at selection time)]; stops early when no pair repeats."""
    words = {w: tuple(w) + (EOW,) for w in word_freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            f = word_freqs[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break
        merges.append((left, right, freq))
        joined = left + right
        for w, sym in words.items():
            if left not in sym:
                continue
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def bpe_train(docs_ds, *, n_merges: int = 50, text_col: str = "text"):
    """documents -> Dataset(rank, left, right, pair_freq) of learned
    merges (rows-only operator: the loop is iterative, not SQL)."""
    import ray.data as rd

    merges = learn_bpe(word_frequencies(docs_ds, text_col=text_col),
                       n_merges)
    return rd.from_arrow(pa.Table.from_arrays(
        [pa.array(np.arange(len(merges), dtype=np.int64), pa.int64()),
         pa.array([m[0] for m in merges], pa.string()),
         pa.array([m[1] for m in merges], pa.string()),
         pa.array([m[2] for m in merges], pa.int64())],
        names=["rank", "left", "right", "pair_freq"]))


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a learned merge table to one word (lowest-rank pair first —
    the standard BPE inference order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        ranked = [(ranks.get((a, b)), i)
                  for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_token_counts(docs_ds, merges_ref, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """documents + ray.put merge-rank dict -> (id_col, n_words,
    n_bpe_tokens); encoding memoized over each block's unique words."""
    import ray

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def count(batch: pa.Table) -> pa.Table:
        import polars as pl

        ranks = ray.get(merges_ref)
        frame = pl.DataFrame({
            id_col: pl.from_arrow(batch.column(id_col).combine_chunks()),
            "t": pl.from_arrow(
                pa.compute.fill_null(batch.column(text_col), "")
                .combine_chunks()).str.extract_all(TOKEN_RE_PORTABLE),
        })
        ex = frame.explode("t").drop_nulls("t")
        words = ex["t"].to_numpy()
        uniq, inv = np.unique(words, return_inverse=True) if len(words) \
            else (np.array([], dtype=object), np.array([], dtype=np.int64))
        lens = np.array([len(encode_word(w, ranks)) for w in uniq],
                        dtype=np.int64)
        per_tok = lens[inv] if len(words) else np.array([], dtype=np.int64)
        ids = ex[id_col].to_numpy()
        uid, id_inv = np.unique(ids, return_inverse=True) if len(ids) \
            else (np.array([], dtype=object), np.array([], dtype=np.int64))
        n_words = np.bincount(id_inv, minlength=len(uid)).astype(np.int64)
        n_bpe = np.bincount(id_inv, weights=per_tok,
                            minlength=len(uid)).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(uid, id_type), pa.array(n_words, pa.int64()),
             pa.array(n_bpe, pa.int64())],
            names=[id_col, "n_words", "n_bpe_tokens"])

    return docs_ds.map_batches(count, batch_format="pyarrow")
