"""End-to-end KG construction pipeline (the flagship pipeline).

transcripts.parquet
  -> explode_turns           (stateless map_batches; split+normalize)   [sentences]
  -> TemplateParserActor     (actor-pool map_batches; warm parser)      [parses]
  -> extract_triples         (stateless map_batches; rule cascade)      [triples]
  -> link_entities           (broadcast gazetteer lookup)
  -> aggregate_edges         (salted two-phase groupby)                 [edges]
  -> aggregate_entities      (groupby entity)                           [entities]

Every stage materializes to Parquet under ``out_dir`` with a lineage manifest
(``state/lineage.py``); a resumed run skips completed stages.  The per-stage
checkpoints double as the reference's ``--ready_ddp`` contract: downstream
stages re-read ``parses`` instead of re-parsing (dudepparse.py:1891-1897).

Scale notes (100 TB / multi-node):
- the only all-to-all exchanges are the two edge/entity group-bys, which run
  over batch-level partial counts (the combiner collapses each ~10k-row batch
  to distinct triples first) with explicit hot-key salting;
- reads prune to the columns each stage needs;
- everything else is embarrassingly parallel map_batches with streaming
  execution — no driver-side loops, no full materialization.
"""

from __future__ import annotations

import os

from ..sources.synthetic import transcripts_dir_for_sf
from ..stages.canonicalize import aggregate_edges, aggregate_entities, link_entities
from ..stages.extract import extract_triples
from ..stages.parse import TemplateParserActor
from ..stages.preprocess import explode_turns
from ..state.lineage import CheckpointStore, fingerprint_paths, parquet_files

PARSE_BATCH_SIZE = 4096
PARSE_CONCURRENCY = 4


def _read(path_or_dir, columns=None):
    import ray.data as rd

    return rd.read_parquet(path_or_dir, columns=columns)


DEDUP_SORT_MIN_RATE = 0.3      # enable the sort when >=30% duplicate texts
DEDUP_SORT_PROBE_ROWS = 50_000


def sampled_duplicate_rate(transcripts_dir: str,
                           sample_rows: int = DEDUP_SORT_PROBE_ROWS) -> float:
    """Bounded probe for dedup_sort='auto': duplicate fraction of sentence
    texts over the first ~sample_rows turns.  Biased toward the head of the
    file list — acceptable for a rate estimate; pass dedup_sort=True/False
    explicitly when the head is known to be unrepresentative."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(transcripts_dir,
                         columns=["conv_id", "turn_idx", "text"]) \
           .limit(sample_rows) \
           .map_batches(explode_turns, batch_format="pyarrow")
    n = 0
    distinct: set = set()
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        texts = batch.column("text")
        n += len(texts)
        distinct.update(pc.unique(texts).to_pylist())
    return 1.0 - len(distinct) / n if n else 0.0


def build_kg(transcripts_dir: str, out_dir: str, *, resume: bool = True,
             parse_concurrency: int | None = None,
             config_tag: str = "v1", checkpoints: str = "all",
             config=None, extra_stages=(), parse_num_gpus: float = 0.0,
             triples_shards: int = 0, parser_cls=None,
             dedup_sort: bool | str = "auto") -> dict:
    """Run (or resume) the full pipeline; returns {stage: Dataset} handles of
    the materialized outputs plus run metadata under "_meta".

    checkpoints="all": materialize every stage (sentences, parses, triples,
    edges, entities) — finest resume granularity; ``parses`` doubles as the
    reference's ``--ready_ddp`` reuse contract.
    checkpoints="minimal": fuse transcripts -> sentences -> parses -> triples
    into ONE streaming execution with a single materialization at ``triples``
    (the map stages pipeline through the object store with no write/read
    barriers); resume granularity becomes {triples, edges, entities}.  Use
    for throughput; "all" for long jobs where re-parsing is the expensive
    part.

    ``config``: an :class:`..functions.cascade.ExtractionConfig` — rule
    flags/caps (SURVEY.md §2.8); part of the checkpoint fingerprint, so
    changing flags invalidates downstream stages.
    ``extra_stages``: user stage hooks — callables ``Dataset -> Dataset``
    applied to the triples stream after entity linking (the §2.8
    stage-registration point).

    ``dedup_sort``: co-locate identical sentence texts before the parse
    stage so per-worker parse/extract memos hit for every duplicate.  The
    sort is a full exchange of the sentence stream — a measured win when
    the corpus repeats heavily, a pure cost when it doesn't — so
    ``"auto"`` (default) decides from a sampled duplicate-rate probe
    (:func:`sampled_duplicate_rate` >= ``DEDUP_SORT_MIN_RATE``);
    True/False force it.  Outputs are identical either way (the sort only
    reorders rows).

    ``triples_shards`` (minimal mode only): >0 splits the transcripts files
    into that many shard groups, each processed and committed independently
    under ``triples/shard-<k>/`` with its own lineage manifest — a preempted
    job resumes MID-STAGE, skipping finished shards (at 100 TB this is the
    unit of recovery; 0 = single streaming execution, fastest when the job
    is expected to finish in one go)."""
    import time as _time

    from ..functions.cascade import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG
    if parse_concurrency is not None and parse_concurrency < 1:
        raise ValueError(f"parse_concurrency must be >= 1 or None, "
                         f"got {parse_concurrency!r}")
    if parse_concurrency is None:
        # leave headroom for the task operators feeding/draining the pool —
        # an actor pool sized to the whole cluster starves them (observed
        # stall at num_cpus=4 with 4 actors)
        try:
            import ray

            ncpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpus = 8
        parse_concurrency = max(1, min(PARSE_CONCURRENCY, ncpus // 2,
                                       ncpus - 2))
    store = CheckpointStore(out_dir)
    in_files = parquet_files(transcripts_dir)
    extra_tag = ",".join(getattr(s, "__name__", repr(s)) for s in extra_stages)
    parser_tag = getattr(parser_cls, "__name__", "") if parser_cls else ""
    base_fp = fingerprint_paths(
        in_files,
        extra=f"{config_tag}|{cfg!r}|{extra_tag}|{parser_tag}|ds={dedup_sort}")
    ran: list[str] = []
    timings: dict[str, float] = {}

    def stage(name: str, make, upstream_fp: str) -> str:
        fp = f"{upstream_fp}:{name}"
        if not (resume and store.is_complete(name, fp)):
            store.reset_metrics(name)
            t0 = _time.perf_counter()
            ds = make()
            ds.write_parquet(store.stage_dir(name), mode="overwrite")
            timings[name] = round(_time.perf_counter() - t0, 3)
            store.commit_stage(name, fp,
                              metrics={"wall_sec": timings[name]})
            ran.append(name)
        # downstream fingerprints chain through this stage's commit record, so
        # recomputing a stage invalidates everything after it
        manifest = store.read_manifest(name)
        return f"{fp}@{manifest['completed_at']}"

    if checkpoints not in ("all", "minimal"):
        raise ValueError(f"checkpoints must be 'all' or 'minimal', got {checkpoints!r}")

    def _sentences(src):
        return src.map_batches(explode_turns, batch_format="pyarrow")

    def _dedup_sort(src):
        """Co-locate identical sentence texts (sort by text hash) so the
        parser/extractor per-worker memos hit for every duplicate regardless
        of pool width — the dedup-before-expensive-op exchange: one cheap
        int64 sort of the sentence stream buys near-total elimination of
        repeated parsing/extraction (transcripts repeat heavily)."""
        import pyarrow as _pa

        def add_hash(batch: "_pa.Table") -> "_pa.Table":
            # full-buffer vectorized hash (polars; embedded-NUL-safe and
            # cross-process deterministic) — this runs over EVERY sentence
            # of the corpus, where the old per-row Python crc32 loop was
            # O(corpus) interpreter time (VERDICT r2 #4)
            import numpy as _np
            import polars as _pl

            if batch.num_rows == 0:
                return batch.append_column("__th",
                                           _pa.array([], _pa.int64()))
            ser = _pl.from_arrow(batch.column("text").combine_chunks())
            hs = ser.hash(seed=0).to_numpy().view(_np.int64)
            return batch.append_column("__th", _pa.array(hs, _pa.int64()))

        def drop_hash(batch: "_pa.Table") -> "_pa.Table":
            return batch.drop_columns(["__th"])

        return src.map_batches(add_hash, batch_format="pyarrow") \
                  .sort("__th") \
                  .map_batches(drop_hash, batch_format="pyarrow")

    parser = parser_cls or TemplateParserActor

    if dedup_sort not in (True, False, "auto"):
        raise ValueError(f"dedup_sort must be True/False/'auto', "
                         f"got {dedup_sort!r}")
    _dedup_decision: dict = {}

    def _use_dedup_sort() -> bool:
        """Evaluated lazily (probe reads only run when a parse stage
        actually executes) and once per build."""
        if dedup_sort != "auto":
            return bool(dedup_sort)
        if "on" not in _dedup_decision:
            rate = sampled_duplicate_rate(transcripts_dir)
            _dedup_decision["on"] = rate >= DEDUP_SORT_MIN_RATE
            _dedup_decision["rate"] = round(rate, 4)
        return _dedup_decision["on"]

    def _parses(src):
        # a model-backed parser actor (e.g. stages.parse.DDParserActor) sets
        # fractional num_gpus here (ST3, SURVEY.md §2.4); the template
        # parser is CPU-only by default
        kwargs = {"num_gpus": parse_num_gpus} if parse_num_gpus else {}
        if _use_dedup_sort():
            src = _dedup_sort(src)
        return src.map_batches(
            parser, batch_format="pyarrow",
            batch_size=PARSE_BATCH_SIZE, concurrency=parse_concurrency,
            **kwargs)

    def _triples(src, metrics_stage: str = "triples"):
        # per-partition extraction-count metrics to the checkpoint store
        # (north-rule lineage contract; merged key-additively at commit like
        # the reference's merge_dict, merge_parsed_results.py:8-14)
        metrics_dir = store.metrics_dir(metrics_stage)

        def extract_with_config(batch):
            return extract_triples(batch, cfg)

        def link_and_meter(batch):
            import pyarrow.compute as _pc

            from ..state.lineage import emit_partition_metrics

            out = link_entities(batch)
            rec = {"n_triples": out.num_rows,
                   "n_linked_subj": int(_pc.sum(
                       _pc.is_valid(out.column("subj_ent"))).as_py() or 0),
                   "n_linked_obj": int(_pc.sum(
                       _pc.is_valid(out.column("obj_ent"))).as_py() or 0),
                   "n_negated": int(_pc.sum(
                       out.column("negated").cast("int64")).as_py() or 0)}
            kinds = _pc.value_counts(out.column("rel_kind"))
            for item in kinds.to_pylist():
                rec[f"n_{item['values']}"] = item["counts"]
            emit_partition_metrics(metrics_dir, rec)
            return out

        ds = src.map_batches(extract_with_config, batch_format="pyarrow") \
                .map_batches(link_and_meter, batch_format="pyarrow")
        for hook in extra_stages:
            ds = hook(ds)
        return ds

    transcripts_cols = ["conv_id", "turn_idx", "text"]
    if checkpoints == "all":
        fp = stage("sentences",
                   lambda: _sentences(_read(transcripts_dir,
                                            columns=transcripts_cols)),
                   base_fp)
        fp = stage("parses",
                   lambda: _parses(_read(store.stage_dir("sentences"))), fp)
        fp = stage("triples",
                   lambda: _triples(_read(store.stage_dir("parses"))), fp)
    elif not triples_shards:
        # fused: one streaming execution, no intermediate barriers
        fp = stage(
            "triples",
            lambda: _triples(_parses(_sentences(
                _read(transcripts_dir, columns=transcripts_cols)))),
            f"{base_fp}:fused")
    else:
        # fused + sharded: independent shard commits -> mid-stage resume
        fp_base = f"{base_fp}:fused:shards{triples_shards}"
        fp = f"{fp_base}:triples"
        if not (resume and store.is_complete("triples", fp)):
            t0 = _time.perf_counter()
            groups: list[list[str]] = [[] for _ in range(triples_shards)]
            for i, f in enumerate(in_files):
                groups[i % triples_shards].append(f)
            # clear layouts from other configurations: top-level parquet from
            # a fused run, shard dirs beyond the current shard count
            import glob as _glob
            import shutil as _shutil

            sdir = store.stage_dir("triples")
            for stale in _glob.glob(os.path.join(sdir, "*.parquet")):
                os.remove(stale)
            for d in _glob.glob(os.path.join(sdir, "shard-*")):
                if int(os.path.basename(d).split("-")[1]) >= triples_shards:
                    _shutil.rmtree(d, ignore_errors=True)
            for k, files in enumerate(groups):
                if not files:
                    continue
                shard_name = f"triples/shard-{k:04d}"
                shard_fp = f"{fp_base}:{fingerprint_paths(files)}"
                if resume and store.is_complete(shard_name, shard_fp):
                    continue
                store.reset_metrics(shard_name)   # only THIS shard's metrics
                ds = _triples(_parses(_sentences(
                    _read(files, columns=transcripts_cols))),
                    metrics_stage=shard_name)
                ds.write_parquet(store.stage_dir(shard_name), mode="overwrite")
                store.commit_stage(shard_name, shard_fp)
            timings["triples"] = round(_time.perf_counter() - t0, 3)
            from ..state.lineage import merge_metric_records

            merged = {}
            for k in range(triples_shards):
                rec = merge_metric_records(
                    store.metrics_dir(f"triples/shard-{k:04d}"))
                for mk, mv in rec.items():
                    merged[mk] = merged.get(mk, 0) + mv
            store.commit_stage("triples", fp,
                               metrics={"wall_sec": timings["triples"],
                                        "shards": triples_shards,
                                        "extraction": merged})
            ran.append("triples")
        manifest = store.read_manifest("triples")
        fp = f"{fp}@{manifest['completed_at']}"

    edges_fp = stage(
        "edges",
        lambda: aggregate_edges(_read(store.stage_dir("triples"))),
        fp)

    stage(
        "entities",
        lambda: aggregate_entities(_read(store.stage_dir("edges"))),
        edges_fp)

    out = {
        "triples": _read(store.stage_dir("triples")),
        "edges": _read(store.stage_dir("edges")),
        "entities": _read(store.stage_dir("entities")),
        "_meta": {"ran_stages": ran, "out_dir": out_dir,
                  "input_fingerprint": base_fp, "stage_wall_sec": timings,
                  "dedup_sort": dict(_dedup_decision) if _dedup_decision
                  else {"on": dedup_sort if dedup_sort != "auto" else None}},
    }
    if checkpoints == "all":
        out["sentences"] = _read(store.stage_dir("sentences"))
        out["parses"] = _read(store.stage_dir("parses"))
    return out


def build_kg_for_sf(sf_dir: str, out_base: str = "/tmp/entgraph_kg",
                    **kwargs) -> dict:
    """Convenience: synthesize (once) the deterministic transcripts matching a
    testdata scale-factor dir, then build the KG from them."""
    tdir = transcripts_dir_for_sf(sf_dir)
    out_dir = os.path.join(out_base, os.path.basename(os.path.normpath(tdir)))
    return build_kg(tdir, out_dir, **kwargs)
