"""Connected components over a pair stream — duplicate-CLUSTER resolution.

Pairwise near-dup output (``jaccard_near_dups`` / ``simhash_near_dups`` /
``embedding_near_dups``) is not what a curation job keeps: transitive
duplicates (a~b, b~c) must collapse to ONE representative per connected
component, or chained duplicates survive pairwise dropping.  The reference
has no analog (it never dedups); this is the standard web-scale dedup
closer (the union-find pass of MinHash dedup pipelines), expressed in
Dataset operators.

Algorithm: minimum-label propagation with pointer jumping —

    labels(v)   = min(v, neighbors(v))            seed
    per round:  labels(v) = min( labels(v),
                                 min_{u in N(v)} labels(u),   # neighbor hop
                                 labels(labels(v)) )          # pointer jump

The neighbor hop alone converges in O(diameter) rounds; the pointer jump
(label of my label) shortcuts chains exponentially, giving O(log n) rounds
on paths — both are keyed lookup joins + ONE grouped min per round.
Convergence is detected by the scalar sum of labels (labels only ever
decrease, so an unchanged sum is a fixpoint) — no driver-side collection.

Partitioning assumption: like any hash aggregate — a single vertex's
incident edges fit in a worker.
"""

from __future__ import annotations

import logging

import pyarrow as pa

logger = logging.getLogger(__name__)


def connected_components(pairs_ds, *, a: str = "a", b: str = "b",
                         max_iters: int = 20):
    """(a, b) pair Dataset -> (node, component) Dataset, component = the
    minimum node id in the node's connected component.

    Only nodes that appear in at least one pair are returned (isolated
    nodes have no duplicate to resolve).  Raises RuntimeError if
    ``max_iters`` rounds don't converge (pointer jumping makes that
    ~2^max_iters-long chains — unreachable in practice)."""
    from .groupagg import auto_hash_aggregate
    from .joins import lookup_join

    # symmetric neighbor stream (src, dst): each edge in both directions
    def sym(batch: pa.Table) -> pa.Table:
        av = batch.column(a).cast(pa.int64()).combine_chunks()
        bv = batch.column(b).cast(pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([av, bv]), pa.concat_arrays([bv, av])],
            names=["src", "dst"])

    endpoints = pairs_ds.map_batches(sym,
                                     batch_format="pyarrow").materialize()

    def _grouped_min(ds):
        """node-keyed min — node cardinality ~ corpus size, so this runs
        through the observed-cardinality dispatch (the builtin groupby
        reduce is linear in group count), falling back to the no-sort
        merge path on small graphs."""
        return auto_hash_aggregate(
            ds.map_batches(lambda t: t.rename_columns(["node", "label"]),
                           batch_format="pyarrow"),
            ["node"], [("label", "min")])

    # seed: labels(v) = min(v, N(v)) — one grouped min over (src, dst) +
    # self rows
    labels = _grouped_min(endpoints.union(endpoints.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("src"), t.column("src")], names=["src", "dst"]),
        batch_format="pyarrow"))).materialize()

    if labels.count() == 0:
        # explicit empty-input short-circuit (sum() on an empty Dataset
        # returns None; relying on None == None to converge was implicit).
        # Node-id magnitude bound for the sum-based convergence test below:
        # labels only ever DECREASE, so sum-unchanged == fixpoint as long as
        # the int64 sum is exact — i.e. sum(node_ids) < 2^63, guaranteed for
        # ids < 2^63 / n_nodes; salt-free 63-bit ids over ~2^40 nodes are
        # out of that bound — rehash ids to a smaller dense domain first if
        # your ids are full-range hashes.
        return labels.map_batches(
            lambda t: t.rename_columns(["node", "component"]),
            batch_format="pyarrow")
    prev_sum = labels.sum("label")
    for it in range(max_iters):
        # ONE lookup per round answers both rules: a query row (src, dst)
        # asks "attach labels(src), deliver it to dst".
        #   neighbor hop:  (u, v) for every directed edge   -> labels(u) to v
        #   pointer jump:  (labels(v), v) for every node    -> labels(labels(v)) to v
        queries = endpoints.union(labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("label"), t.column("node")],
                names=["src", "dst"]), batch_format="pyarrow"))
        cand = lookup_join(queries, labels, left_key="src",
                           right_key="node", payload=["label"],
                           suffix="_q", how="inner") \
            .map_batches(lambda t: pa.Table.from_arrays(
                [t.column("dst"), t.column("label_q")],
                names=["node", "label"]), batch_format="pyarrow")
        labels = _grouped_min(labels.union(cand)).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:      # labels only decrease -> fixpoint
            logger.info("connected_components converged in %d rounds",
                        it + 1)
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


def dedup_cluster_representatives(pairs_ds, *, a: str = "a", b: str = "b"):
    """Pairs -> (node, component, keep) rows: keep=True for the component's
    minimum node id (the survivor), False for every other member — the
    cluster-level drop set pairwise dropping gets wrong on chains."""
    import pyarrow.compute as pc

    comp = connected_components(pairs_ds, a=a, b=b)

    def mark(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("node"), batch.column("component"))
        return batch.append_column("keep", keep)

    return comp.map_batches(mark, batch_format="pyarrow")
