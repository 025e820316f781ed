"""Driver-gate mirror for the in-window kg_golden_* family: the REAL
distributed pipeline over the pinned worked-example corpus must reproduce the
VALUES oracles row-for-row under exactly the driver's comparison (columns
sorted by name, rows stringified order-insensitively, floats at 6 dp).

Semantic anchors (beyond the mechanical match) assert a few rows the
reference documents directly, so a regenerated golden_expected.py that
pinned wrong behavior would still fail here.
"""

import duckdb
import pytest


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(df.notna(), None)

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row)
                  for row in df.itertuples(index=False))
    return list(df.columns), rows


GOLDEN_QUERIES = ["kg_golden_triples", "kg_golden_edges",
                  "kg_golden_coref_delta", "kg_golden_mentions_corefed"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_query_matches_values_oracle(entry_mod, name):
    got = entry_mod.queries()[name]("/root/testdata/sf0.001").to_pandas()
    exp = duckdb.connect().execute(entry_mod._golden_oracles()[name]).df()
    gc, gr = _canon(got)
    ec, er = _canon(exp)
    assert gc == ec, f"{name}: column drift {gc} != {ec}"
    assert len(gr) == len(er), f"{name}: {len(gr)} rows != {len(er)}"
    if gr != er:
        bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
        raise AssertionError(
            f"{name}: first mismatch at sorted row {bad}:\n"
            f"  got: {gr[bad]}\n  exp: {er[bad]}")


def test_golden_semantic_anchors(entry_mod):
    """Reference-documented rows that must be present verbatim."""
    tr = entry_mod.queries()["kg_golden_triples"](
        "/root/testdata/sf0.001").to_pandas()
    fine = {(r.subj, r.pred, r.obj)
            for r in tr[tr.rel_kind == "fine"].itertuples()}
    amend = {(r.subj, r.pred, r.obj)
             for r in tr[tr.rel_kind == "amend_fine"].itertuples()}
    # g01 base SVO (dudepparse.py:459-460)
    assert ("张三", "赶往", "机场") in fine
    # g02 POB amendment (dudepparse.py:477)
    assert ("中国", "与·X·接壤", "印度") in amend
    # g10 COP_SBJ (dudepparse.py:1145)
    assert ("北京大学", "校长·是", "郝平") in amend
    # g14 VOB_VOB chain (dudepparse.py:1436)
    assert ("张三", "被控·试图·杀死", "李四") in amend
    # negation flag (check_nct, dudepparse.py:1550-1596)
    neg = tr[tr.negated]
    assert set(zip(neg.subj, neg.pred, neg.obj)) == {("张三", "否·喜欢", "方案")}
    # bei-passive swaps roles (extract.py:204-238)
    assert ("李四", "批评", "张三") in fine
    # Merkel possible-stream row (dudepparse.py:1398)
    poss = tr[tr.rel_kind == "possible"]
    assert set(zip(poss.subj, poss.pred, poss.obj)) == {
        ("默克尔", "是·X·的·总理", "德国")}

    # the coref conversation resolves both pronouns to 张三
    cd = entry_mod.queries()["kg_golden_coref_delta"](
        "/root/testdata/sf0.001").to_pandas()
    assert set(zip(cd.subj, cd.pred, cd.obj, cd.antecedent)) == {
        ("张三", "研究", "技术", "张三"), ("张三", "发布", "文章", "张三")}
    assert set(cd.rel_kind) == {"coref_fine", "coref_coarse"}

    # M18: exactly the two coref-changed sentences re-ran mention detection
    mc = entry_mod.queries()["kg_golden_mentions_corefed"](
        "/root/testdata/sf0.001").to_pandas()
    coref_rows = mc[mc.source == "coref"]
    assert sorted(zip(coref_rows.conv_id, coref_rows.turn_idx)) == [
        ("golden-0005", 1), ("golden-0005", 2)]
    assert set(coref_rows.surface) == {"张三"}
