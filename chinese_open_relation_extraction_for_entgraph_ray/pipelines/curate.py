"""Training-data curation pipeline: the composite "clean a web-scale corpus"
flow a 100-TB training-data job runs, chaining the document operators:

    quality filter (token counts / stop ratio)
    -> language filter
    -> exact dedup (md5 groupby, keep min doc_id)
    -> near-dup removal (MinHash-LSH candidates, Jaccard-verified,
       drop the higher doc_id of each duplicate pair)

Shuffle shape: ONE md5 groupby + the MinHash sort; everything else is
streaming map_batches.  The near-dup drop set is collected to the driver and
broadcast — it is bounded by the number of verified duplicate pairs, which at
any scale is a small fraction of the corpus (and the classic way this is done
in production dedup pipelines).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import exact_dedup, jaccard_near_dups
from ..stages.textstats import LANG_PATTERNS, STOPWORD_RE, TOKEN_RE


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

    counts = {k: pc.count_substring_regex(text, p).to_pylist()
              for k, p in LANG_PATTERNS.items()}
    lang_keep = []
    for i in range(batch.num_rows):
        if counts["zh"][i] > 0:
            lang = "zh"
        elif counts["en"][i] >= counts["de"][i] and \
                counts["en"][i] >= counts["fr"][i] and \
                counts["en"][i] >= counts["es"][i]:
            lang = "en"
        elif counts["de"][i] >= counts["fr"][i] and \
                counts["de"][i] >= counts["es"][i]:
            lang = "de"
        elif counts["fr"][i] >= counts["es"][i]:
            lang = "fr"
        else:
            lang = "es"
        lang_keep.append(lang in langs)
    keep = pc.and_(keep, pa.array(lang_keep, pa.bool_()))
    return batch.filter(keep)


def curate_step1_exact(docs_ds, **filter_kwargs):
    """Filtered + exactly-deduped survivor ids (SQL-expressible half)."""
    filtered = docs_ds.map_batches(
        lambda b: quality_lang_filter(b, **filter_kwargs),
        batch_format="pyarrow")
    return exact_dedup(filtered)    # (md5, keep_doc_id, dup_count)


def curate_documents(docs_ds, *, jaccard_threshold: float = 0.5,
                     **filter_kwargs):
    """Full curation: returns the curated documents Dataset (doc_id, text)."""
    import ray

    survivors = curate_step1_exact(docs_ds, **filter_kwargs).materialize()
    keep_ids = pa.array(
        sorted(r["keep_doc_id"] for r in survivors.take_all()), pa.int64())

    def only_survivors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=keep_ids))

    kept = docs_ds.map_batches(only_survivors, batch_format="pyarrow")
    dup_pairs = jaccard_near_dups(kept, threshold=jaccard_threshold).take_all()
    drop = pa.array(sorted({r["b"] for r in dup_pairs}), pa.int64())

    def drop_near_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch.column("doc_id"),
                                               value_set=drop)))

    return kept.map_batches(drop_near_dups, batch_format="pyarrow")
