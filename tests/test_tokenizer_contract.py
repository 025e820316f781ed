"""Tokenizer-contract tests (review finding, r5 day-3).

Every DuckDB oracle tokenizes with RE2, whose ``\\S`` is ASCII-only
(``[^\\t\\n\\f\\r ]`` — U+3000 ideographic space, U+00A0 NBSP and \\x0b
vertical tab are NON-space there), while polars' Rust regex ``\\S`` and
Python's ``str.split()`` are Unicode-aware.  Before this contract landed,
engine paths tokenizing via polars/str.split silently disagreed with
their oracles on any document carrying non-ASCII whitespace — exactly the
whitespace found in Chinese web text, this engine's domain.  These tests
pin the fix: every engine tokenizer (pyarrow RE2 kernels, polars
TOKEN_RE_PORTABLE, Python re2_tokens) must produce the SAME tokens as
DuckDB's ``regexp_extract_all(text, '\\S+')`` on a probe corpus that
exercises every divergent separator.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from chinese_open_relation_extraction_for_entgraph_ray.stages.textstats import (
    TOKEN_RE,
    TOKEN_RE_PORTABLE,
    re2_tokens,
    repetition_stats,
)

# every separator class that distinguishes RE2-\s from Unicode-\s plus
# ordinary ones: ideographic space, NBSP, vertical tab (all NON-space in
# RE2), and tab/newline/formfeed/CR/space (space everywhere)
PROBES = [
    "a　b c\td e\x0bf\x0cg\rh\ni  j",
    "中文　分词 测试",          # ideographic space inside CJK text
    "plain ascii words only",
    "",
    "　",                       # a single non-ASCII-space char = 1 token
    " \t\n ",                       # ASCII whitespace only = 0 tokens
]


def duck_tokens(text: str) -> list[str]:
    return duckdb.sql(
        "select regexp_extract_all(?, '\\S+')", params=[text]).fetchone()[0]


def test_re2_tokens_matches_duckdb():
    for t in PROBES:
        assert re2_tokens(t) == duck_tokens(t), repr(t)


def test_polars_portable_pattern_matches_duckdb():
    got = pl.Series(PROBES).str.extract_all(TOKEN_RE_PORTABLE).to_list()
    for t, g in zip(PROBES, got):
        assert g == duck_tokens(t), repr(t)


def test_pyarrow_count_matches_duckdb():
    arr = pa.array(PROBES)
    counts = pc.count_substring_regex(arr, TOKEN_RE).to_pylist()
    for t, c in zip(PROBES, counts):
        assert c == len(duck_tokens(t)), repr(t)


def test_word_shingles_matches_shingle_cte_semantics():
    """word_shingles must agree with the _shingle_cte SQL mirror on
    non-ASCII whitespace (the review repro: 'x\\u3000y z')."""
    from chinese_open_relation_extraction_for_entgraph_ray.stages.dedup import (
        word_shingles,
    )

    for t in PROBES + ["x　y z"]:
        toks = duck_tokens(t)
        if not toks:
            want = set()
        elif len(toks) < 3:
            want = {" ".join(toks)}
        else:
            want = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        assert word_shingles(t, 3) == want, repr(t)


def test_repetition_stats_consistent_on_unicode_ws_and_capped():
    """The review repro: U+3000-separated repeats must yield fractions in
    [0, 1] with n_tokens consistent with the bigram stream (the pre-fix
    code mixed RE2 n_tokens with Unicode bigrams -> top_bigram_frac 3.33),
    and the overlapping-repeat case ('x x x') must hit the 1.0 cap."""
    batch = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array(["x　x x　x x　x",     # RE2: 3 tokens 'x　x'
                   "x x x"], pa.string())],  # overlapping bigram repeat
        names=["doc_id", "text"])
    out = repetition_stats(batch)
    assert out.column("n_tokens").to_pylist() == [3, 3]
    # both docs: bigram count 2 of 2 positions -> dup 1.0; 2*2/3 caps at 1
    assert out.column("top_bigram_frac").to_pylist() == [1.0, 1.0]
    assert out.column("dup_bigram_frac").to_pylist() == [1.0, 1.0]


def test_repetition_stats_matches_oracle_on_unicode_whitespace():
    """End-to-end engine-vs-oracle agreement on the whitespace classes the
    synthetic gate corpus never exercises: run the REAL docs_repetition_stats
    SQL against a DuckDB view of the probe docs and compare row-for-row."""
    import __ray_entry__ as entry_mod

    texts = PROBES + ["x　y z", "x x x", "a b a b a"]
    tbl = pa.Table.from_arrays(
        [pa.array(list(range(len(texts))), pa.int64()),
         pa.array(texts, pa.string()),
         pa.array(["zh"] * len(texts), pa.string())],
        names=["doc_id", "text", "lang"])
    got = repetition_stats(tbl).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        entry_mod._oracle_sql_impl("/nonexistent/*.parquet")
        ["docs_repetition_stats"]).df().sort_values("doc_id") \
        .reset_index(drop=True)
    for col in ["n_tokens", "top_bigram_frac", "dup_bigram_frac"]:
        assert got[col].tolist() == want[col].tolist(), col
