"""Hive-partitioned Parquet sink + partition-pruned re-read.

The 100-TB output contract (SURVEY §7 / north rule): results land as
partitioned Parquet so (a) a downstream consumer reads ONLY the partitions
it needs — the read plan must not touch the other partitions' files — and
(b) a resumed run can skip finished partitions.  Ray Data's
``write_parquet(partition_cols=...)`` + ``read_parquet(filter=...)`` over
the hive layout is that contract; these tests pin it end to end.
"""

import glob
import os

import pyarrow.dataset as pads


def test_partitioned_write_then_pruned_read(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "docs_by_lang")
    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "lang", "n_chars"])
    src.write_parquet(out, partition_cols=["lang"])

    # hive layout: one directory per lang value, nothing at the root
    part_dirs = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(out, "lang=*")))
    assert part_dirs, "no hive partition directories written"
    langs = sorted(set(r["lang"] for r in
                       src.select_columns(["lang"]).take_all()))
    assert part_dirs == [f"lang={v}" for v in langs]
    assert not glob.glob(os.path.join(out, "*.parquet")), \
        "files escaped the partition directories"

    # pruned read: the pyarrow-level plan over lang=zh must only list the
    # zh partition's fragments (partition pruning, not post-filtering)
    target = langs[0]
    frags = pads.dataset(out, partitioning="hive").get_fragments(
        filter=(pads.field("lang") == target))
    frag_paths = [f.path for f in frags]
    assert frag_paths and all(f"lang={target}" in p for p in frag_paths)

    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    # PATH-level pruning: the non-matching partitions' files never enter
    # the read plan (a row filter after a full scan would not prune)
    back = rd.read_parquet(
        out, partitioning=Partitioning("hive"),
        partition_filter=PathPartitionFilter.of(
            lambda d: d.get("lang") == target, style="hive"))
    want = src.filter(expr=f"lang == '{target}'")
    assert back.count() == want.count() > 0
    assert (sorted(r["doc_id"] for r in back.take_all())
            == sorted(r["doc_id"] for r in want.take_all()))


def test_partitioned_resume_skips_finished_partitions(ray_session,
                                                      tmp_path):
    """The resumable-output shape: per-partition writes are independent
    directories, so a retried run overwrites only the partition it
    recomputes and an already-finished partition's files are untouched."""
    import ray.data as rd

    out = str(tmp_path / "docs_by_lang")
    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "lang"])
    src.write_parquet(out, partition_cols=["lang"])
    langs = sorted(os.path.basename(p).split("=", 1)[1]
                   for p in glob.glob(os.path.join(out, "lang=*")))
    assert len(langs) >= 2
    done, redo = langs[0], langs[1]
    done_files = {p: os.path.getmtime(p) for p in
                  glob.glob(os.path.join(out, f"lang={done}", "*"))}

    # "resume": recompute ONE partition, overwrite only its directory
    (src.filter(expr=f"lang == '{redo}'")
        .write_parquet(os.path.join(out, f"lang={redo}"),
                       mode="overwrite"))
    for p, mt in done_files.items():
        assert os.path.getmtime(p) == mt, f"finished partition touched: {p}"
    total = rd.read_parquet(out).count()
    assert total == src.count()
