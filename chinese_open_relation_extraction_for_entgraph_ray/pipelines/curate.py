"""Training-data curation pipeline: the composite "clean a web-scale corpus"
flow a 100-TB training-data job runs, chaining the document operators:

    quality filter (token counts / stop ratio)
    -> language filter
    -> exact dedup (md5 groupby, keep min doc_id)
    -> near-dup removal (MinHash-LSH candidates, Jaccard-verified,
       drop the higher doc_id of each duplicate pair)

Shuffle shape: the md5 groupby, the MinHash sort, and the keyed sorted-block
joins that replace every driver-side id-set broadcast: the exact-dedup
survivor set (which is ~the whole corpus — O(corpus) driver state if
collected) reaches the docs via a distributed semi-join, and the near-dup
drop set via a distributed anti-join (``stages/joins.semi_join``).  Nothing
corpus-proportional ever lands on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import exact_dedup, jaccard_near_dups
from ..stages.textstats import STOPWORD_RE, TOKEN_RE


def quality_lang_filter(batch: pa.Table, *, min_tokens: int = 3,
                        max_tokens: int = 5000,
                        max_stop_ratio: float = 0.8,
                        langs: tuple = ("en",)) -> pa.Table:
    """Keep docs in token-count bounds, below the stop-word ratio, and whose
    detected language is in ``langs`` (same cues as stages/textstats.py)."""
    text = batch.column("text")
    n_tok = pc.count_substring_regex(text, TOKEN_RE).cast(pa.float64())
    n_stop = pc.count_substring_regex(text, STOPWORD_RE).cast(pa.float64())
    denom = pc.max_element_wise(n_tok, pa.scalar(1.0))
    stop_ratio = pc.divide(n_stop, denom)
    keep = pc.and_(
        pc.and_(pc.greater_equal(n_tok, float(min_tokens)),
                pc.less_equal(n_tok, float(max_tokens))),
        pc.less_equal(stop_ratio, max_stop_ratio))

    import numpy as np

    from ..stages.textstats import lang_codes

    lang_keep = np.isin(lang_codes(batch), list(langs))
    keep = pc.and_(keep, pa.array(lang_keep))
    return batch.filter(keep)


def curate_step1_exact(docs_ds, **filter_kwargs):
    """Filtered + exactly-deduped survivor ids (SQL-expressible half)."""
    filtered = docs_ds.map_batches(
        lambda b: quality_lang_filter(b, **filter_kwargs),
        batch_format="pyarrow")
    return exact_dedup(filtered)    # (md5, keep_doc_id, dup_count)


def curate_documents(docs_ds, *, jaccard_threshold: float = 0.5,
                     cluster_dedup: bool = False, pairs_mode: str = "lsh",
                     **filter_kwargs):
    """Full curation: returns the curated documents Dataset (doc_id, text).

    Survivor selection and near-dup removal are distributed keyed joins —
    no ``take_all()`` over corpus-proportional data anywhere on the path.

    ``cluster_dedup=False`` (default, the round-1 semantics): drop the
    higher doc_id of each verified pair.  On duplicate CHAINS (a~b, b~c
    where a~c was not verified) this over-keeps.
    ``cluster_dedup=True``: close the pairs into connected components
    (``stages/cluster.py``) and keep exactly one representative (the
    minimum doc_id) per component — the correct cluster-level semantics,
    at the cost of the iterative component rounds.

    ``pairs_mode`` — how near-dup pairs are found:
    - "lsh" (default): MinHash-LSH candidates, Jaccard-verified — the
      cheap scale path (recall is the LSH's, near-1 above ~0.6 Jaccard).
    - "exact": the inverted-index exact all-pairs join
      (``stages/dedup.similar_pairs_exact``) — deterministic recall=1 over
      pairs sharing >=1 shingle; the one divergence from the LSH path is
      docs with NO shingles (empty/whitespace-only text), which the
      ``jaccard()`` convention treats as J=1.0 pairs but the index can
      never emit — the default quality filter's min-token bound removes
      such docs before this step.  Costlier on corpora with ubiquitous
      shingles (see its ``max_df``)."""
    if pairs_mode not in ("lsh", "exact"):
        raise ValueError(f"pairs_mode must be 'lsh' or 'exact', "
                         f"got {pairs_mode!r}")
    from ..stages.joins import semi_join

    # materialized: id-only (O(corpus) ids in the object store, not text),
    # and it opts the semi-join into the broadcast path while the survivor
    # count fits BROADCAST_KEYS_THRESHOLD — beyond it the sorted-block
    # exchange engages automatically
    survivors = curate_step1_exact(docs_ds, **filter_kwargs) \
        .map_batches(lambda b: b.select(["keep_doc_id"]),
                     batch_format="pyarrow").materialize()
    kept = semi_join(docs_ds, survivors,
                     left_key="doc_id", right_key="keep_doc_id") \
        .materialize()   # consumed twice: near-dup candidate gen + anti-join
    if pairs_mode == "exact":
        from ..stages.dedup import similar_pairs_exact

        pairs = similar_pairs_exact(kept, threshold=jaccard_threshold)
    else:
        pairs = jaccard_near_dups(kept, threshold=jaccard_threshold)
    if cluster_dedup:
        from ..stages.cluster import dedup_cluster_representatives

        drop_ids = (dedup_cluster_representatives(pairs)
                    .filter(expr="keep == False")
                    .map_batches(lambda b: b.select(["node"]),
                                 batch_format="pyarrow")
                    .materialize())
        return semi_join(kept, drop_ids, left_key="doc_id",
                         right_key="node", anti=True)
    drop_ids = pairs.map_batches(lambda b: b.select(["b"]),
                                 batch_format="pyarrow") \
        .materialize()   # bounded by verified duplicate pairs
    return semi_join(kept, drop_ids, left_key="doc_id", right_key="b",
                     anti=True)
