"""Token-window chunking (stages/chunking.py): boundary arithmetic,
overlap, degenerate inputs, and full-coverage invariants."""

import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.chunking import (
    chunk_documents,
)


def _ds(rows):
    import ray.data as rd

    ids, txt = zip(*rows) if rows else ((), ())
    return rd.from_arrow(pa.Table.from_arrays(
        [pa.array(list(ids), pa.int64()), pa.array(list(txt), pa.string())],
        names=["doc_id", "text"]))


def test_boundaries_and_overlap(ray_session):
    toks = " ".join(str(i) for i in range(10))
    out = chunk_documents(_ds([(1, toks)]), size=4, stride=3).to_pandas()
    out = out.sort_values("chunk_idx").reset_index(drop=True)
    assert list(out.chunk_text) == ["0 1 2 3", "3 4 5 6", "6 7 8 9"]
    assert list(out.n_tok) == [4, 4, 4]


def test_every_token_covered_no_degenerate_tail(ray_session):
    for n in range(1, 30):
        toks = " ".join(f"t{i}" for i in range(n))
        out = chunk_documents(_ds([(1, toks)]), size=8, stride=5) \
            .to_pandas().sort_values("chunk_idx")
        covered = set()
        for i, row in out.iterrows():
            lo = row.chunk_idx * 5
            covered.update(range(lo, lo + row.n_tok))
        assert covered == set(range(n))
        # a chunk fully inside its predecessor is never emitted
        ends = (out.chunk_idx * 5 + out.n_tok).to_numpy()
        prev_end = (out.chunk_idx.to_numpy() - 1) * 5 + 8
        assert (ends[1:] > prev_end[1:]).all()


def test_short_empty_null_docs(ray_session):
    out = chunk_documents(
        _ds([(1, "solo"), (2, ""), (3, None)]), size=4, stride=3) \
        .to_pandas()
    assert list(out.doc_id) == [1]          # empty/null emit nothing
    assert out.iloc[0].chunk_text == "solo" and out.iloc[0].n_tok == 1


def test_stride_validation():
    with pytest.raises(ValueError):
        chunk_documents(_ds([]), size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_ds([]), size=4, stride=0)
