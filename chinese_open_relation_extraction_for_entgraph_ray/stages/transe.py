"""Distributed TransE training — knowledge-graph embeddings learned over
the engine's own (subj, pred, obj) triple table, the canonical downstream
consumer of a KG-construction pipeline (Bordes et al. 2013).

Synchronous full-batch gradient descent with margin loss

    L = sum over triples  max(0, margin + ||h+r-t||^2 - ||h+r-t'||^2)

where the corrupt tail t' is the DETERMINISTIC rank-shift negative of
the negative-sampling stage (vocab[(rank(t)+1) mod |V|] — no RNG), so
the whole training run is reproducible from the triple set alone.

**Partition-invariant by construction.**  Float gradient sums are not
associative, so a naive distributed sum would make the learned
embeddings depend on Ray's block boundaries.  Instead every triple's
per-slot gradient is quantized to int64 fixed point (scale 2^20)
BEFORE any summation; integer addition is exact and associative, so
the per-epoch gradient — and therefore the final embeddings — are
bit-identical across any parallelism level or block structure (the
same exactness discipline as the engine's 22-bit-limb checksums).
Overflow bound: |grad slot| <= 4*(margin + 4) per triple after the
unit-norm projection, so the int64 accumulator holds ~2^38 triples
per entity per slot before wrapping — loudly asserted.

Scale shape per epoch (the part that must survive 100 TB of triples):

1. the (entities + predicates) embedding matrix is the SMALL side —
   ``ray.put`` once per epoch, read inside every task (the gazetteer-
   bounded regime; beyond ~10M entities the broadcast asserts loudly
   and the sharded alternative is a parameter-server actor pool keyed
   by ``hash(entity) % n_shards``, with the gradient exchange below
   unchanged);
2. ONE vectorized ``map_batches`` over the triples computes quantized
   gradient contributions and pre-combines them per block (np.add.at
   on in-block unique ids) — the exchange carries at most one row per
   (block, touched id), never one per triple;
3. one :func:`groupagg.auto_hash_aggregate` sums the int64 gradient
   columns; the result (O(vocab) rows) returns to the driver, which
   applies the update and re-projects entity rows to the unit sphere.

Epochs are driver-coordinated dataset passes (K passes for K epochs);
the triples dataset should be materialized by the caller if rereading
the source is expensive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: fixed-point scale for gradient quantization (2^20 ~ 1e-6 resolution)
FP_SCALE = 1 << 20
#: refuse to broadcast an embedding table bigger than this
MAX_VOCAB = 10_000_000


def _init_embeddings(n: int, dim: int, seed: int,
                     md5_prefix: str | None = None) -> np.ndarray:
    """Deterministic unit-norm init: rows of a seeded Gaussian, or — when
    ``md5_prefix`` is given — md5-uniform coords keyed
    ``{md5_prefix}:{row}:{dim}`` so an external engine with only a
    string-md5 primitive (the DuckDB oracle of kg_golden_transe) can
    recompute the init bit-for-bit.  Distribution differs (uniform cube
    vs Gaussian) but both are valid unit-sphere inits; the md5 path is
    the verification seam, seeded Gaussian stays the default."""
    if md5_prefix is not None:
        import hashlib

        m = np.empty((n, dim), dtype=np.float64)
        for k in range(n):
            for d in range(dim):
                h = int.from_bytes(hashlib.md5(
                    f"{md5_prefix}:{k}:{d}".encode()).digest()[:8], "big")
                m[k, d] = (h / (1 << 64)) * 2.0 - 1.0
    else:
        rng = np.random.RandomState(seed)
        m = rng.standard_normal((n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _vocab(triples_ds, cols: list[str]) -> np.ndarray:
    """Sorted distinct values of the given columns (one aggregate)."""
    from .groupagg import auto_hash_aggregate

    def vals(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.concat_arrays([b.column(c).combine_chunks()
                               for c in cols])], names=["v"])

    ds = auto_hash_aggregate(
        triples_ds.map_batches(vals, batch_format="pyarrow"), ["v"], [])
    out = np.sort(np.concatenate(
        [t.column("v").to_numpy(zero_copy_only=False)
         for t in ds.iter_batches(batch_format="pyarrow")] or
        [np.array([], dtype=object)]))
    if len(out) > MAX_VOCAB:
        raise ValueError(
            f"vocabulary {len(out)} too large to broadcast — shard the "
            "embedding table over a parameter-server actor pool instead")
    return out


def transe_train(triples_ds, *, dim: int = 16, epochs: int = 4,
                 lr: float = 0.1, margin: float = 1.0, seed: int = 7,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj", init: str = "seeded"):
    """Triples -> (entity vocab, entity embeddings, pred vocab, pred
    embeddings, per-epoch losses).  Deterministic and partition-invariant
    (see module docstring); callers wanting a Dataset use
    :func:`transe_embedding_table`."""
    import ray

    ents = _vocab(triples_ds, [subj_col, obj_col])
    preds = _vocab(triples_ds, [pred_col])
    n_e, n_p = len(ents), len(preds)
    md5_e = "te:e" if init == "md5" else None
    md5_p = "te:p" if init == "md5" else None
    ent_emb = _init_embeddings(max(n_e, 1), dim, seed, md5_e)[:n_e]
    pred_emb = _init_embeddings(max(n_p, 1), dim, seed + 1, md5_p)[:n_p]
    n_triples = max(triples_ds.count(), 1)
    losses: list[float] = []

    from .groupagg import auto_hash_aggregate

    gcols = [f"g{i}" for i in range(dim)]

    for _ in range(epochs):
        state_ref = ray.put((ents, ent_emb, preds, pred_emb))

        def grads(batch: pa.Table, _ref=state_ref) -> pa.Table:
            ev, ee, pv, pe = ray.get(_ref)
            h_i = np.searchsorted(ev, batch.column(subj_col)
                                  .to_numpy(zero_copy_only=False))
            t_i = np.searchsorted(ev, batch.column(obj_col)
                                  .to_numpy(zero_copy_only=False))
            r_i = np.searchsorted(pv, batch.column(pred_col)
                                  .to_numpy(zero_copy_only=False))
            n_i = (t_i + 1) % max(len(ev), 1)     # deterministic corrupt tail
            h, t, r, tn = ee[h_i], ee[t_i], pe[r_i], ee[n_i]
            d_pos = h + r - t
            d_neg = h + r - tn
            loss = margin + (d_pos * d_pos).sum(1) - (d_neg * d_neg).sum(1)
            active = loss > 0
            # quantize PER TRIPLE before any summation (associativity)
            q = lambda m: np.rint(m * FP_SCALE).astype(np.int64)  # noqa: E731
            g_h = q(2.0 * (tn - t)[active])       # d/dh == d/dr
            g_t = q(-2.0 * d_pos[active])
            g_n = q(2.0 * d_neg[active])
            ids = np.concatenate([h_i[active], t_i[active], n_i[active],
                                  r_i[active] + len(ev)])
            gs = np.concatenate([g_h, g_t, g_n, g_h])
            loss_fp = int(np.rint(np.maximum(loss, 0.0)
                                  * FP_SCALE).astype(np.int64).sum())
            # in-block pre-combine: one row per touched id
            uniq, inv = np.unique(ids, return_inverse=True)
            acc = np.zeros((len(uniq), dim), dtype=np.int64)
            np.add.at(acc, inv, gs)
            out_ids = np.concatenate([uniq, [-1]])   # -1 carries the loss
            acc = np.vstack([acc, np.zeros(dim, dtype=np.int64)])
            acc[-1, 0] = loss_fp
            return pa.Table.from_arrays(
                [pa.array(out_ids, pa.int64())]
                + [pa.array(acc[:, i], pa.int64()) for i in range(dim)],
                names=["id"] + gcols)

        agg = auto_hash_aggregate(
            triples_ds.map_batches(grads, batch_format="pyarrow"),
            ["id"], [(c, "sum") for c in gcols])
        grad = np.zeros((n_e + n_p, dim), dtype=np.float64)
        loss_total = 0.0
        for b in agg.iter_batches(batch_format="pyarrow"):
            idx = b.column("id").to_numpy()
            g = np.stack([b.column(c).to_numpy() for c in gcols], axis=1)
            is_loss = idx == -1
            loss_total += float(g[is_loss, 0].sum()) / FP_SCALE
            keep = ~is_loss
            grad[idx[keep]] = g[keep] / FP_SCALE
        losses.append(loss_total / n_triples)
        step = lr / n_triples
        ent_emb = ent_emb - step * grad[:n_e]
        pred_emb = pred_emb - step * grad[n_e:]
        # TransE constraint: entity embeddings live on the unit sphere
        norms = np.linalg.norm(ent_emb, axis=1, keepdims=True)
        ent_emb = ent_emb / np.maximum(norms, 1e-12)
    return ents, ent_emb, preds, pred_emb, losses


def transe_embedding_table(triples_ds, **kw):
    """Triples -> Dataset(kind, name, embedding list<float>, final_loss)
    — the materializable form of :func:`transe_train` (embeddings rounded
    to 6 digits for a stable output contract)."""
    import ray.data as rd

    ents, ee, preds, pe, losses = transe_train(triples_ds, **kw)
    kind = np.array(["entity"] * len(ents) + ["pred"] * len(preds),
                    dtype=object)
    names = np.concatenate([ents, preds]) if len(ents) + len(preds) else \
        np.array([], dtype=object)
    emb = np.round(np.vstack([ee, pe]) if len(names) else
                   np.zeros((0, 1)), 6)
    tbl = pa.Table.from_arrays(
        [pa.array(kind, pa.string()), pa.array(names, pa.string()),
         pa.array(list(emb), pa.list_(pa.float64())),
         pa.array(np.full(len(names), round(losses[-1], 6) if losses
                          else 0.0), pa.float64())],
        names=["kind", "name", "embedding", "final_loss"])
    return rd.from_arrow(tbl)


def link_prediction_eval(triples_ds, ents, ent_emb, preds, pred_emb, *,
                         subj_col: str = "subj", pred_col: str = "pred",
                         obj_col: str = "obj"):
    """Tail link-prediction evaluation of trained embeddings: for every
    triple, rank the true tail among ALL entities by ||h + r - t'||^2
    (raw rank = 1 + #candidates strictly closer; ties don't penalize —
    deterministic, no RNG) and report MRR / Hits@1 / Hits@10.

    Scale shape: the candidate matrix is the broadcast embedding table
    (vocab-bounded); each batch scores its triples against it in one
    GEMM.  Reciprocal ranks quantize to 2^30 fixed point per triple
    before the distributed sum, so the reported MRR is bit-identical
    across block structures (same contract as training).  Returns a
    one-row Dataset (n_triples, mrr, hits_at_1, hits_at_10)."""
    import ray
    import ray.data as rd

    from .groupagg import auto_hash_aggregate

    rr_scale = 1 << 30
    state_ref = ray.put((ents, ent_emb, preds, pred_emb))
    # candidate squared norms are shared by every task via the same put
    cand_sq_ref = ray.put((ent_emb * ent_emb).sum(1))

    def partial(batch: pa.Table) -> pa.Table:
        ev, ee, pv, pe = ray.get(state_ref)
        cand_sq = ray.get(cand_sq_ref)
        h_i = np.searchsorted(ev, batch.column(subj_col)
                              .to_numpy(zero_copy_only=False))
        t_i = np.searchsorted(ev, batch.column(obj_col)
                              .to_numpy(zero_copy_only=False))
        r_i = np.searchsorted(pv, batch.column(pred_col)
                              .to_numpy(zero_copy_only=False))
        q = ee[h_i] + pe[r_i]                      # (B, dim)
        # dist^2(q, cand) = |q|^2 + |cand|^2 - 2 q.cand ; |q|^2 is
        # constant per row and cancels in the comparison below
        cross = q @ ee.T                           # ONE GEMM per batch
        d = cand_sq[None, :] - 2.0 * cross         # (B, V) up to +|q|^2
        true_d = d[np.arange(len(t_i)), t_i]
        rank = 1 + (d < true_d[:, None]).sum(1)
        rr_fp = np.rint(rr_scale / rank).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([0], pa.int64()),
             pa.array([len(rank)], pa.int64()),
             pa.array([int(rr_fp.sum())], pa.int64()),
             pa.array([int((rank == 1).sum())], pa.int64()),
             pa.array([int((rank <= 10).sum())], pa.int64())],
            names=["k", "n", "rr_fp", "h1", "h10"])

    agg = auto_hash_aggregate(
        triples_ds.map_batches(partial, batch_format="pyarrow"),
        ["k"], [("n", "sum"), ("rr_fp", "sum"), ("h1", "sum"),
                ("h10", "sum")])
    tot = agg.to_pandas()
    n = int(tot["n"].iloc[0]) if len(tot) else 0
    if n == 0:
        mrr = h1 = h10 = 0.0
    else:
        mrr = round(float(tot["rr_fp"].iloc[0]) / rr_scale / n, 6)
        h1 = round(float(tot["h1"].iloc[0]) / n, 6)
        h10 = round(float(tot["h10"].iloc[0]) / n, 6)
    return rd.from_arrow(pa.Table.from_arrays(
        [pa.array([n], pa.int64()), pa.array([mrr], pa.float64()),
         pa.array([h1], pa.float64()), pa.array([h10], pa.float64())],
        names=["n_triples", "mrr", "hits_at_1", "hits_at_10"]))
