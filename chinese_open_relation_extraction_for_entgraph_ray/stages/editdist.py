"""Edit-distance verification over near-duplicate candidate pairs — the
character-level second opinion curation pipelines run after a set-based
(shingle/Jaccard) detector: two docs can share every word 3-shingle yet
differ in punctuation-level edits that matter for exact-span dedup, and
vice versa a low-Jaccard pair can be one transposition apart.

Scale shape: the pair set is the (already capped / thresholded) OUTPUT of
an upstream detector, orders of magnitude smaller than the corpus; texts
are attached by two keyed lookup joins against a prefix table built in one
vectorized pass (only ``prefix_chars`` chars per doc ever leave the scan —
never full documents), and the O(len^2) DP runs per pair on fixed-width
byte arrays.  Cost is O(|pairs| * prefix^2), independent of corpus size.

Distances are computed over the UTF-8 BYTES of the character-truncated
prefix, matching DuckDB's ``levenshtein`` (byte-oriented: one CJK
substitution costs 3, verified in-sandbox) so the oracle mirrors
bit-for-bit; the byte convention is documented here because it differs
from Python-level ``difflib`` intuition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Unit-cost edit distance over byte strings — numpy row DP
    (Wagner-Fischer with the classic two-row space bound; the inner
    minimum over deletions is a vectorized ``np.minimum.accumulate``
    equivalent done via the standard sequential trick below)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):          # DP over the shorter row
        a, b = b, a
    bv = np.frombuffer(b, dtype=np.uint8)
    prev = np.arange(len(bv) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a):
        # substitution / insertion are row-parallel:
        cur[0] = i + 1
        sub = prev[:-1] + (bv != ca)
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletion needs the left neighbor of CUR — a prefix-min scan:
        # cur[j] = min(cur[j], cur[j-1]+1) left-to-right.  The vectorized
        # form: running minimum of (cur[j] - j) then + j.
        shifted = np.minimum.accumulate(cur - np.arange(len(cur)))
        cur = shifted + np.arange(len(cur))
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_pairs(pairs_ds, docs_ds, *, prefix_chars: int = 64,
                        id_col: str = "doc_id", text_col: str = "text",
                        a_col: str = "a", b_col: str = "b"):
    """Attach ``lev`` (byte-level edit distance between the two docs'
    ``prefix_chars``-character prefixes) to every candidate pair.

    ``pairs_ds``: (a, b, ...) candidate rows from any detector.
    ``docs_ds``:  the corpus (only id + text columns are read)."""
    from .joins import lookup_join

    def prefixes(t: pa.Table) -> pa.Table:
        txt = pa.compute.utf8_slice_codeunits(
            pa.compute.fill_null(t.column(text_col), ""), 0, prefix_chars)
        return pa.Table.from_arrays([t.column(id_col), txt],
                                    names=[id_col, "prefix"])

    pref = docs_ds.map_batches(prefixes, batch_format="pyarrow") \
                  .materialize()    # reused by both sides of the pair

    with_a = lookup_join(pairs_ds, pref, left_key=a_col, right_key=id_col,
                         payload=["prefix"], suffix="_a")
    both = lookup_join(with_a, pref, left_key=b_col, right_key=id_col,
                       payload=["prefix"], suffix="_b")
    pa_col, pb_col = "prefix_a", "prefix_b"   # lookup_join always suffixes

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[pa_col, pb_col])
        out["lev"] = np.fromiter(
            (levenshtein_bytes(x.encode("utf-8"), y.encode("utf-8"))
             for x, y in zip(df[pa_col], df[pb_col])),
            dtype=np.int64, count=len(df))
        return out

    return both.map_batches(dist, batch_format="pandas")
