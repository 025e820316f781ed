"""Product quantization (stages/pq.py): exactness on codebook-built
vectors, ADC-vs-exact recall, reconstruction-error monotonicity, and
partition invariance of the search."""

import numpy as np
import pyarrow as pa
import pytest

from chinese_open_relation_extraction_for_entgraph_ray.stages.pq import (
    pq_encode,
    pq_search,
    pq_topk,
    train_pq,
)
from chinese_open_relation_extraction_for_entgraph_ray.stages.similarity import (
    normalize,
)


def _emb_ds(mat, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(np.arange(len(mat)), pa.int64()),
         pa.array(list(np.asarray(mat, dtype=np.float32)),
                  pa.list_(pa.float32()))],
        names=["vec_id", "embedding"]))
    return ds.repartition(parts) if parts else ds


def test_dim_must_divide():
    with pytest.raises(ValueError):
        train_pq(np.ones((4, 6)), m=4)


def test_exact_on_codebook_vectors(ray_session):
    """Vectors assembled FROM codewords reconstruct with zero error and
    ADC distance equals the true L2 distance."""
    import ray

    rng = np.random.RandomState(3)
    base = normalize(rng.standard_normal((16, 8)))
    books = train_pq(base, m=2, ksub=16, iters=10)
    # build vectors whose subvectors are exact codewords
    vecs = np.hstack([books[0][[0, 3, 7]], books[1][[1, 4, 2]]])
    vecs = normalize(vecs)
    # re-train on exactly these points with ksub >= n so each subvector
    # is its own codeword
    books2 = train_pq(vecs, m=2, ksub=3, iters=10)
    enc = pq_encode(_emb_ds(vecs), ray.put(books2)).to_pandas()
    assert (enc.reconstruction_err < 1e-9).all()
    q = vecs[1]
    codes = pq_encode(_emb_ds(vecs), ray.put(books2))
    top = pq_search(codes, books2, q, k=3).to_pandas()
    true_d = np.sqrt(((normalize(vecs) - normalize(q.reshape(1, -1))) ** 2)
                     .sum(1))
    got = top.set_index("vec_id").adc_dist
    for vid in top.vec_id:
        assert got[vid] == pytest.approx(true_d[vid], abs=1e-6)
    assert top.iloc[0].vec_id == 1          # the query itself ranks first


def test_recall_vs_exact_on_clustered_data(ray_session):
    """ADC can't rank WITHIN a quantization cell (that's the method's
    trade), but on well-separated clusters every top-k hit must come
    from the query's own cluster — the invariant IVF-PQ relies on."""
    rng = np.random.RandomState(5)
    centers = normalize(rng.standard_normal((4, 16)))
    mat = normalize(np.repeat(centers, 50, axis=0)
                    + 0.05 * rng.standard_normal((200, 16)))
    q = mat[7]                               # cluster 0 = ids 0..49
    top = pq_topk(_emb_ds(mat), q, k=10, m=4, ksub=16).to_pandas()
    assert (top.vec_id < 50).all()
    # and the ADC distances to same-cluster points are far below the
    # distance to any other cluster's points
    other = pq_topk(_emb_ds(mat), centers[1], k=10, m=4,
                    ksub=16).to_pandas()
    assert top.adc_dist.max() < other.adc_dist.min() + 1.0


def test_reconstruction_err_decreases_with_ksub(ray_session):
    import ray

    rng = np.random.RandomState(9)
    mat = normalize(rng.standard_normal((256, 8)))
    errs = []
    for ksub in (2, 8, 32):
        books = train_pq(mat, m=2, ksub=ksub, iters=8)
        enc = pq_encode(_emb_ds(mat), ray.put(books)).to_pandas()
        errs.append(enc.reconstruction_err.mean())
    assert errs[0] > errs[1] > errs[2]


def test_search_partition_invariant(ray_session):
    import ray

    rng = np.random.RandomState(1)
    mat = normalize(rng.standard_normal((120, 8)))
    books = train_pq(mat, m=2, ksub=8)
    q = mat[0]
    c1 = pq_encode(_emb_ds(mat, parts=1), ray.put(books))
    c6 = pq_encode(_emb_ds(mat, parts=6), ray.put(books))
    t1 = pq_search(c1, books, q, k=5).to_pandas()
    t6 = pq_search(c6, books, q, k=5).to_pandas()
    assert t1.equals(t6)


def test_explicit_init_validation_and_determinism(ray_session):
    """init path (the SQL-oracle seam of embeddings_pq_topk_explicit):
    shape errors are loud; explicit init is partition-invariant."""
    import ray.data as rd
    import pytest

    from chinese_open_relation_extraction_for_entgraph_ray.stages.pq import (
        pq_topk,
        train_pq,
    )

    rng = np.random.RandomState(3)
    emb = rng.standard_normal((60, 8))
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(emb)]
    with pytest.raises(ValueError, match="init shape"):
        train_pq(emb, m=2, ksub=4, init=emb[:3])
    with pytest.raises(ValueError, match="not in the training sample"):
        pq_topk(rd.from_items(rows), emb[0], m=2, ksub=4,
                init_ids=[0, 1, 2, 999])

    outs = []
    for parts in (2, 7):
        ds = rd.from_items(rows).repartition(parts)
        got = pq_topk(ds, emb[0], k=5, m=2, ksub=4,
                      init_ids=[0, 15, 30, 45]).to_pandas()
        outs.append(got.sort_values("vec_id", ignore_index=True))
    assert outs[0].equals(outs[1])
