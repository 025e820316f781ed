"""Transcript analytics (tool usage, inter-turn latency): the registered
oracles are gate-scale (sf0.01) like every transcripts_* oracle, so this
re-derives the same SQL over the sf0.001 synthetic transcripts and
compares engine output value-for-value at that scale too."""

import os


def _sf0001_glob():
    import __ray_entry__ as entry_mod

    tdir = entry_mod._transcripts_dir("/root/testdata/sf0.001")
    return os.path.join(tdir, "transcripts-*.parquet")


def _cmp(df, sql):
    import duckdb

    want = duckdb.sql(sql).df()
    got = df.reindex(sorted(df.columns), axis=1) \
            .sort_values(sorted(df.columns)).reset_index(drop=True)
    want = want.reindex(sorted(want.columns), axis=1) \
               .sort_values(sorted(want.columns)).reset_index(drop=True)
    assert got.columns.tolist() == want.columns.tolist()
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].astype(str) == want[c].astype(str)).all(), c


def test_tool_stats_sf0001_parity(ray_session):
    import __ray_entry__ as entry_mod

    df = entry_mod._q_transcripts_tool_stats(
        "/root/testdata/sf0.001").to_pandas()
    _cmp(df, f"""
        WITH a AS (SELECT tool, conv_id, count(*)::BIGINT AS n_calls
                   FROM read_parquet('{_sf0001_glob()}')
                   WHERE tool IS NOT NULL AND tool <> ''
                   GROUP BY 1, 2)
        SELECT tool, sum(n_calls)::BIGINT AS n_calls,
               count(*)::BIGINT AS n_convs
        FROM a GROUP BY tool""")


def test_entity_cooccurrence_sf0001_parity(ray_session):
    import __ray_entry__ as entry_mod

    df = entry_mod._q_transcripts_entity_cooccurrence(
        "/root/testdata/sf0.001").to_pandas()
    _cmp(df, entry_mod._cooccurrence_sql(_sf0001_glob()))


def test_conversation_dedup_sf0001_parity(ray_session):
    import __ray_entry__ as entry_mod

    df = entry_mod._q_transcripts_conversation_dedup(
        "/root/testdata/sf0.001").to_pandas()
    _cmp(df, f"""
        SELECT min(conv_id) AS conv_id
        FROM (SELECT conv_id,
                     md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS h
              FROM read_parquet('{_sf0001_glob()}') GROUP BY conv_id)
        GROUP BY h""")


def test_turn_latency_sf0001_parity(ray_session):
    import __ray_entry__ as entry_mod

    df = entry_mod._q_transcripts_turn_latency(
        "/root/testdata/sf0.001").to_pandas()
    _cmp(df, f"""
        WITH g AS (SELECT conv_id,
                          epoch_us(ts) - lag(epoch_us(ts))
                              OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS d
                   FROM read_parquet('{_sf0001_glob()}'))
        SELECT conv_id, count(d)::BIGINT AS n_gaps,
               sum(d)::BIGINT AS sum_gap_us, max(d) AS max_gap_us
        FROM g WHERE d IS NOT NULL GROUP BY conv_id""")
