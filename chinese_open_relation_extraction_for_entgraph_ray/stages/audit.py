"""Data-quality / referential-integrity audit — the validation stage a
100-TB ingest runs BEFORE anything downstream trusts the tables (the
"expectations" pattern: null rates, key uniqueness, FK orphans, domain
bounds), emitted as one tiny (metric, n) summary table.

Engine shape, per metric family:

- **predicate violations** (null / non-positive / out-of-domain …): ONE
  streaming pass — each batch emits one partial-count row per metric
  (a combiner: the exchange carries ``n_metrics`` rows per block, never
  data rows), finished by one tiny grouped sum.
- **FK orphans**: :func:`joins.semi_join` in anti mode (broadcast key
  membership while the referenced key set fits, sorted-block exchange
  beyond) — never a driver-side key set.
- **duplicate keys**: sorted-block aggregate over the composite key (the
  honest all-to-all: key multiplicity is a global property), then a
  per-block count of groups with multiplicity > 1 — the exchange carries
  one row per DISTINCT key, the reduce one row per block.

A zero-violation metric still appears (a seed row of 0 per metric is
unioned in), so the audit's schema is stable whether or not the data is
clean — ``absence of a row`` is never the signal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def predicate_counts(ds, predicates: dict):
    """(metric, n) partial-count rows for ``{metric: fn(batch) -> bool
    array}`` — one combiner pass; every metric appears in every block's
    partial (zero included) so downstream never loses a metric."""
    names = sorted(predicates)

    def partials(batch: pa.Table) -> pa.Table:
        ns = []
        for m in names:
            mask = predicates[m](batch)
            ns.append(int(pc.sum(mask).as_py() or 0)
                      if isinstance(mask, (pa.Array, pa.ChunkedArray))
                      else int(np.count_nonzero(mask)))
        return pa.Table.from_arrays(
            [pa.array(names, pa.string()), pa.array(ns, pa.int64())],
            names=["metric", "n"])

    return ds.map_batches(partials, batch_format="pyarrow")


def duplicate_key_counts(ds, key_cols: list[str], *, metric: str):
    """(metric, n) partial rows counting composite keys with multiplicity
    > 1 — distinct-key exchange (sorted-block aggregate), then a per-block
    combiner over the aggregated stream."""
    from .groupagg import sorted_hash_aggregate

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "c", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    per_key = sorted_hash_aggregate(
        ds.select_columns(key_cols).map_batches(one, batch_format="pyarrow"),
        key_cols, [("c", "sum")])

    def count_dups(batch: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.greater(batch.column("c"),
                                  pa.scalar(1))).as_py() or 0)
        return pa.Table.from_arrays(
            [pa.array([metric], pa.string()), pa.array([n], pa.int64())],
            names=["metric", "n"])

    return per_key.map_batches(count_dups, batch_format="pyarrow")


def orphan_counts(ds, ref_ds, *, left_key: str, right_key: str,
                  metric: str):
    """(metric, n) partial rows counting left rows whose key has no match
    in ``ref_ds`` — anti semi-join then a per-block row count."""
    from .joins import semi_join

    orphans = semi_join(ds.select_columns([left_key]),
                        ref_ds.select_columns([right_key]).materialize(),
                        left_key=left_key, right_key=right_key, anti=True)

    def count_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([metric], pa.string()),
             pa.array([batch.num_rows], pa.int64())],
            names=["metric", "n"])

    return orphans.map_batches(count_rows, batch_format="pyarrow")


def integrity_audit(partial_streams: list, metrics: list[str]):
    """Union the partial-count streams with a zero seed per metric and
    reduce to ONE row per metric (grouped sum) — the audit summary."""
    import ray.data as rd

    from .groupagg import auto_hash_aggregate

    seed = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(sorted(metrics), pa.string()),
         pa.array([0] * len(metrics), pa.int64())],
        names=["metric", "n"]))
    stream = seed
    for s in partial_streams:
        stream = stream.union(s)
    return auto_hash_aggregate(stream, ["metric"], [("n", "sum")])
