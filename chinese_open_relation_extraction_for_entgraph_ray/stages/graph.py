"""Distributed PageRank over an edge stream — KG analytics on the canonical
edges table (the EntGraph-style consumer of this engine's output ranks
entities/predicates by graph centrality; the reference itself stops at edge
extraction, so this is a downstream-capability operator, not a port).

Per iteration (all Dataset operators — no driver-side graph state):

    contrib(v) = sum over edges (u -> v) of rank(u) * w / outdeg(u)
    rank'(v)   = (1-d)/N + d * (contrib(v) + dangling_mass / N)

- the edge->rank attach is ONE keyed lookup join (``stages/joins``),
- the contrib sum is ONE sorted-block hash aggregate,
- ranks rejoin the full node list with a left lookup (no-in-edge nodes
  keep the base term),
- dangling mass (rank parked on nodes with no out-edges) is a scalar
  aggregate per round.

Convergence: scalar L1 delta between successive rank vectors (computed as
an aggregate, never collected).  Out-degrees are attached once up front.
Partitioning assumption: like any keyed aggregate — one node's incident
edges fit in a worker.
"""

from __future__ import annotations

import pyarrow as pa


def pagerank(edges_ds, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 8,
             tol: float | None = 1e-6):
    """(src, dst) edge Dataset -> (node, rank) Dataset (ranks sum to ~1).

    ``iters`` bounds the rounds; ``tol`` (L1 delta) stops early when set.
    Deterministic for a given input and parameters."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .groupagg import sorted_hash_aggregate
    from .joins import lookup_join

    edges = edges_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(src).cast(pa.string()), t.column(dst).cast(pa.string())],
            names=["src", "dst"]),
        batch_format="pyarrow").materialize()

    # node list = distinct src ∪ dst; out-degree per src
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.concat_arrays([t.column("src").combine_chunks(),
                               t.column("dst").combine_chunks()])],
            names=["node"])

    def ones(t: pa.Table, name: str) -> pa.Table:
        return t.append_column(
            name, pa.array(np.ones(t.num_rows, dtype=np.int64)))

    nodes = sorted_hash_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow")
        .map_batches(lambda t: ones(t, "n"), batch_format="pyarrow"),
        ["node"], [("n", "sum")]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda t: pa.schema([("node", pa.string()),
                                 ("rank", pa.float64())]).empty_table(),
            batch_format="pyarrow")
    outdeg = sorted_hash_aggregate(
        edges.map_batches(
            lambda t: ones(t.select(["src"]), "outdeg"),
            batch_format="pyarrow"),
        ["src"], [("outdeg", "sum")])

    # ranks table: (node, outdeg [0 = dangling], rank)
    ranks = lookup_join(nodes, outdeg, left_key="node", right_key="src",
                        payload=["outdeg"], suffix="", how="left") \
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"),
                 t.column("outdeg").fill_null(0).cast(pa.float64()),
                 pa.array(np.full(t.num_rows, 1.0 / n_nodes))],
                names=["node", "outdeg", "rank"]),
            batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        dangling = ranks.filter(expr="outdeg == 0.0") \
            .aggregate(Sum("rank", alias_name="s"))["s"] or 0.0
        add = base + damping * dangling / n_nodes

        # per-edge contributions, keyed by dst (one lookup join)
        contrib_rows = lookup_join(
            edges, ranks, left_key="src", right_key="node",
            payload=["rank", "outdeg"], suffix="_s", how="inner") \
            .map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("dst"),
                     pa.array(np.zeros(t.num_rows)),          # outdeg slot
                     pa.array(np.zeros(t.num_rows)),          # old-rank slot
                     pa.array(np.asarray(t.column("rank_s"),
                                         dtype=np.float64)
                              / np.asarray(t.column("outdeg_s"),
                                           dtype=np.float64))],
                    names=["node", "outdeg", "old_rank", "contrib"]),
                batch_format="pyarrow")
        # carrier rows for EVERY node (so no-in-edge nodes keep the base
        # term); fused with the contribution sum in ONE sorted aggregate —
        # outdeg/old_rank ride along via max (zero on contribution rows)
        carrier = ranks.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), t.column("outdeg"), t.column("rank"),
                 pa.array(np.zeros(t.num_rows))],
                names=["node", "outdeg", "old_rank", "contrib"]),
            batch_format="pyarrow")
        merged = sorted_hash_aggregate(
            carrier.union(contrib_rows), ["node"],
            [("outdeg", "max"), ("old_rank", "max"), ("contrib", "sum")])

        def update(t: pa.Table, _add=add) -> pa.Table:
            c = np.asarray(t.column("contrib"), dtype=np.float64)
            old = np.asarray(t.column("old_rank"), dtype=np.float64)
            new = _add + damping * c
            return pa.Table.from_arrays(
                [t.column("node"), t.column("outdeg"),
                 pa.array(new), pa.array(np.abs(new - old))],
                names=["node", "outdeg", "rank", "delta"])

        new_ranks = merged.map_batches(update,
                                       batch_format="pyarrow").materialize()
        l1 = new_ranks.aggregate(Sum("delta", alias_name="s"))["s"] or 0.0
        ranks = new_ranks.map_batches(
            lambda t: t.select(["node", "outdeg", "rank"]),
            batch_format="pyarrow").materialize()
        if tol is not None and l1 < tol:
            break
    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")
