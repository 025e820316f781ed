"""Cohort retention (stages/retention.py) and text normalization
(stages/textstats.normalize_text): hand-built multi-cohort triangle,
week-truncation parity vs DuckDB date_trunc, and normalization edge cases
verified against the exact oracle expression."""

import datetime

import numpy as np
import pyarrow as pa

from chinese_open_relation_extraction_for_entgraph_ray.stages.retention import (
    _week_days,
    cohort_retention,
)
from chinese_open_relation_extraction_for_entgraph_ray.stages.textstats import (
    normalize_text,
)


def test_week_days_matches_duckdb_date_trunc():
    import duckdb

    rng = np.random.default_rng(5)
    epochs = rng.integers(0, 2_000_000_000, 50)   # 1970..2033
    ts = pa.chunked_array([pa.array(epochs * 1_000_000,
                                    pa.timestamp("us"))])
    got = _week_days(ts)
    for e, d in zip(epochs, got):
        want = duckdb.sql(
            "SELECT date_trunc('week', to_timestamp(?)::TIMESTAMP)",
            params=[int(e)]).fetchone()[0]
        assert datetime.date(1970, 1, 1) + datetime.timedelta(int(d)) \
            == want, e


def test_cohort_retention_triangle(ray_session):
    import ray.data as rd

    day = 86_400_000_000   # us
    mon1, mon2 = 4 * day, 11 * day        # 1970-01-05, 1970-01-12 Mondays

    def ev(uid, us):
        return {"user_id": uid, "ts": np.datetime64(us, "us")}

    rows = [
        ev(1, mon1), ev(1, mon1 + day), ev(1, mon2),     # w1 cohort, both
        ev(2, mon1 + 2 * day),                           # w1 cohort, w1 only
        ev(3, mon2 + 3 * day),                           # w2 cohort
    ]
    out = cohort_retention(rd.from_items(rows).repartition(2)).to_pandas()
    got = {(r.cohort_week, r.activity_week): r.n_users
           for r in out.itertuples()}
    assert got == {
        ("1970-01-05", "1970-01-05"): 2,
        ("1970-01-05", "1970-01-12"): 1,
        ("1970-01-12", "1970-01-12"): 1,
    }


def test_normalize_text_semantics():
    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["  Hello\t WORLD \n", "abc", None, "Ä  Straße"],
    })
    out = {r["doc_id"]: r for r in normalize_text(batch).to_pylist()}
    import hashlib

    assert out[1]["norm_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["n_chars_norm"] == len("hello world")
    assert out[2]["norm_md5"] == hashlib.md5(b"abc").hexdigest()
    assert out[3]["norm_md5"] == hashlib.md5(b"").hexdigest()
    assert out[4]["n_chars_norm"] == len("ä straße")


def test_normalize_matches_duckdb_expression():
    import duckdb

    texts = ["  MiXeD   Caseé ", "tab\there", "ÄÖÜ ß",
             "中文 TEXT", ""]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = {r["doc_id"]: (r["n_chars_norm"], r["norm_md5"])
           for r in normalize_text(batch).to_pylist()}
    for i, t in enumerate(texts):
        n, h = duckdb.sql(
            r"""SELECT length(norm), md5(norm) FROM (SELECT
                trim(regexp_replace(lower(nfc_normalize(?)),
                                    '\s+', ' ', 'g')) AS norm)""",
            params=[t]).fetchone()
        assert got[i] == (n, h), (i, t)
