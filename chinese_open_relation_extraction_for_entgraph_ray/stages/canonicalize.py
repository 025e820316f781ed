"""Entity linking + EntGraph-style canonicalization (dedup/aggregate).

The reference has no relational joins (SURVEY.md §2.5) — its only dedup is the
serialize_rel set in the coref path (/root/reference/dudepparse.py:41-46,
2157-2166).  This module adds the EntGraph-side canonicalization the north
rule requires:

- mention -> entity linking via a broadcast-style gazetteer lookup (static
  alias map shipped with the code; a large gazetteer would be ``ray.put`` once
  and fetched in ``__init__``), with containment fallback for coarse spans;
- (subj, pred, obj) triple dedup as a salted two-phase groupby-aggregate:
  per-batch partial counts (combiner) -> groupby(salt + key) -> groupby(key),
  so a hot key (e.g. a copular predicate over a celebrity entity) is first
  reduced in parallel across NUM_SALTS sub-groups before the final exchange.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.lexicon import ENTITY_ALIASES, NER_GAZETTEER

NUM_SALTS = 16
# Engage the extra salted exchange only when the per-key fan-in (= number of
# combined blocks, since the combiner emits each key at most once per block)
# is large enough that a single reducer would otherwise receive that many rows
# for one hot key.  Below this, one exchange over combined partials is cheaper
# (measured 16s vs 26s at sf0.1 / 32 CPUs).
SALT_BLOCK_THRESHOLD = 512


def combine_batch_size() -> int:
    """Combiner batch size adapted to cluster width: few CPUs -> bigger
    batches (more in-batch dedup, less exchange volume); many CPUs -> smaller
    batches so the combiner map has ~2 tasks per core (measured: 65536 best
    at 32 CPUs, 262144 best at 8 CPUs on the sf0.1 corpus)."""
    try:
        import ray

        ncpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        ncpus = 32
    return max(65536, 2_097_152 // max(ncpus, 1))


def stable_salt(sample_conv_id: str) -> int:
    """Process-stable salt for the hot-key pre-aggregation round.

    Must vary WITHIN a (subj, pred, obj) key so one hot key is split across
    NUM_SALTS sub-groups — we derive it from the row-varying provenance
    column, not from the key (``hash()`` is PYTHONHASHSEED-dependent; crc32
    is not)."""
    import zlib

    return zlib.crc32(sample_conv_id.encode("utf-8")) % NUM_SALTS

_CANONICAL = {s: s for s in NER_GAZETTEER}
_CANONICAL.update(ENTITY_ALIASES)
_SURFACE_RE = re.compile(
    "|".join(re.escape(w) for w in sorted(_CANONICAL, key=len, reverse=True)))


_LINK_MEMO: dict[str, str | None] = {}
_LINK_MEMO_MAX = 500_000


def link_surface(surface) -> str | None:
    """surface -> canonical entity surface, or None if unlinkable.

    Exact gazetteer/alias hit first; else the longest-first leftmost gazetteer
    mention contained in the (possibly span-expanded, coarse) argument.
    Memoized per process (argument surfaces repeat heavily).
    """
    if not surface:
        return None
    hit = _CANONICAL.get(surface)
    if hit is not None:
        return hit
    if surface in _LINK_MEMO:
        return _LINK_MEMO[surface]
    m = _SURFACE_RE.search(surface)
    res = _CANONICAL[m.group(0)] if m else None
    if len(_LINK_MEMO) < _LINK_MEMO_MAX:
        _LINK_MEMO[surface] = res
    return res


def link_entities(batch: pa.Table) -> pa.Table:
    """Adds subj_ent / obj_ent columns (nullable canonical surfaces)."""
    subj_ent = [link_surface(s) for s in batch.column("subj").to_pylist()]
    obj_ent = [link_surface(o) for o in batch.column("obj").to_pylist()]
    return batch.append_column("subj_ent", pa.array(subj_ent, pa.string())) \
                .append_column("obj_ent", pa.array(obj_ent, pa.string()))


EDGE_KEYS = ["subj", "pred", "obj", "subj_ent", "obj_ent"]


def partial_edge_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse the batch to one row per distinct triple
    with a partial weight + a sample provenance, and a salt for the first
    aggregation round."""
    if batch.num_rows == 0:
        return _empty_partial()
    batch = batch.set_column(
        batch.schema.get_field_index("subj"), "subj",
        pc.fill_null(batch.column("subj"), ""))
    batch = batch.set_column(
        batch.schema.get_field_index("obj"), "obj",
        pc.fill_null(batch.column("obj"), ""))
    batch = batch.set_column(
        batch.schema.get_field_index("subj_ent"), "subj_ent",
        pc.fill_null(batch.column("subj_ent"), ""))
    batch = batch.set_column(
        batch.schema.get_field_index("obj_ent"), "obj_ent",
        pc.fill_null(batch.column("obj_ent"), ""))
    agg = batch.group_by(EDGE_KEYS).aggregate(
        [("conv_id", "min"), ("turn_idx", "min"), ("subj", "count")])
    cols = {
        "subj": agg.column("subj"), "pred": agg.column("pred"),
        "obj": agg.column("obj"), "subj_ent": agg.column("subj_ent"),
        "obj_ent": agg.column("obj_ent"),
        "sample_conv_id": agg.column("conv_id_min"),
        "sample_turn_idx": agg.column("turn_idx_min"),
        "weight": agg.column("subj_count").cast(pa.int64()),
    }
    salt = [stable_salt(c) for c in cols["sample_conv_id"].to_pylist()]
    cols["salt"] = pa.array(salt, pa.int32())
    return pa.Table.from_arrays(list(cols.values()), names=list(cols.keys()))


def _empty_partial() -> pa.Table:
    schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("subj_ent", pa.string()), ("obj_ent", pa.string()),
        ("sample_conv_id", pa.string()), ("sample_turn_idx", pa.int32()),
        ("weight", pa.int64()), ("salt", pa.int32()),
    ])
    return pa.Table.from_arrays([pa.array([], f.type) for f in schema], schema=schema)


def aggregate_edges(triples_ds, rel_kinds=("fine", "amend_fine"),
                    salting: bool | str = "auto"):
    """triples Dataset -> canonical edges Dataset.

    Shuffle plan (two-phase, skew-aware):

    1. **Map-side combiner** (no shuffle): each ~64k-row batch collapses to
       one row per distinct triple via ``pa.Table.group_by`` — a hot key
       reaches the exchange at most once per block, so reducer fan-in per key
       is bounded by the block count, not the row count.
    2. **Salted pre-exchange** (only when block-count fan-in is large —
       ``salting="auto"`` engages it above SALT_BLOCK_THRESHOLD input blocks,
       i.e. the 100-TB regime, where a single hot copular predicate would
       otherwise funnel millions of partial rows into one reducer): groupby
       (salt + key) with a row-varying salt partially sums each hot key
       across NUM_SALTS sub-groups.
    3. **Final exchange**: groupby(key) sums the ≤NUM_SALTS (salted) or
       ≤#blocks (unsalted) partials per key.

    Keys are the triple surfaces; entity ids ride along (functions of the
    key); provenance via ``min``.  The exchange itself runs through
    :func:`..groupagg.sorted_hash_aggregate` — a numeric-key sort plus
    vectorized pyarrow block aggregation, which is also inherently hot-key
    safe (each key reduced once per block, then once over its <= #blocks
    partials).  ``salting=True`` adds the classic salted pre-exchange on top
    for the extreme-fan-in regime; "auto" engages it above
    SALT_BLOCK_THRESHOLD input blocks.
    """
    from .groupagg import sorted_hash_aggregate

    kinds = sorted(set(rel_kinds))

    def filtered_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("rel_kind"),
                                      value_set=pa.array(kinds)))
        return partial_edge_counts(batch)

    partials = triples_ds.map_batches(filtered_partials,
                                      batch_format="pyarrow",
                                      batch_size=combine_batch_size())
    agg_spec = [("weight", "sum"), ("sample_conv_id", "min"),
                ("sample_turn_idx", "min")]
    if salting == "auto":
        try:
            n_blocks = triples_ds.num_blocks()
        except Exception:
            n_blocks = 0
        salting = bool(n_blocks and n_blocks > SALT_BLOCK_THRESHOLD)
    if salting:
        partials = sorted_hash_aggregate(partials, ["salt"] + EDGE_KEYS,
                                         agg_spec)
    return sorted_hash_aggregate(partials, EDGE_KEYS, agg_spec)


def aggregate_entities(edges_ds):
    """Edges -> entity table: canonical surface + total mention weight."""
    

    def explode_mentions(batch: pa.Table) -> pa.Table:
        ents, weights = [], []
        for col in ("subj_ent", "obj_ent"):
            e = batch.column(col).to_pylist()
            w = batch.column("weight").to_pylist()
            for ent, wt in zip(e, w):
                if ent:
                    ents.append(ent)
                    weights.append(wt)
        return pa.Table.from_arrays(
            [pa.array(ents, pa.string()), pa.array(weights, pa.int64())],
            names=["entity_id", "mention_count"])

    # entity cardinality is tiny (one row per canonical gazetteer entity), so
    # the built-in groupby beats the sorted-block operator's fixed op count
    from ray.data.aggregate import Sum

    # coalesce before the exchange: entity cardinality is tiny, so dozens of
    # input blocks would otherwise spawn dozens of near-empty reduce partitions
    return edges_ds.map_batches(explode_mentions, batch_format="pyarrow") \
                   .repartition(4) \
                   .groupby("entity_id") \
                   .aggregate(Sum("mention_count", alias_name="mention_count"))
