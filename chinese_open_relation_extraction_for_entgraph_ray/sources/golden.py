"""Pinned golden transcript corpus — the driver-checkable cascade fixture.

One sentence per grammar template with FIXED slot fills (the reference's
worked-example words wherever they are in the lexicons — citations inline),
arranged into six deterministic conversations.  Because every template's
``(heads, deprels)`` shape is the worked example embedded in the reference
(see ``functions/grammar.py``), running the REAL distributed pipeline
(`pipelines/kg.build_kg`) over this corpus exercises the full rule cascade on
exactly the structures the reference documents — and its output is a small
FIXED table that a ``SELECT * FROM (VALUES ...)`` DuckDB oracle can pin
row-for-row (VERDICT r4 next-round #1: the driver-gate hard oracle for the
flagship ``kg_*`` family).

The corpus also exercises the preprocessing drop paths (an ASCII turn and a
<5-Chinese-char turn contribute no sentences) and the coref branch
(conversation ``golden-0005``: a PERSON mention followed by pronoun-subject
turns, the main_ner.py:194-325 analog).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .synthetic import SCHEMA

#: conversations -> turns -> text.  DO NOT REORDER: (conv_id, turn_idx) are
#: derived from positions, and the pinned oracles key on them.
GOLDEN_CONVS: list[list[str]] = [
    [   # golden-0000
        # adv_svo (dudepparse.py:459-460) + pob_noobj (:477), one turn,
        # two sentences (sent_idx 0/1)
        "张三急匆匆地赶往机场。中国与印度接壤。",
        "李四光为科学做出了贡献。",      # pob_obj (dudepparse.py:482-483)
        "张三在图书馆玩。",              # mt_prep (dudepparse.py:640-641)
        "ok, plain ascii tool chatter (step 3)",   # no Chinese -> dropped
        "张伟去诊所打疫苗。",            # vv_obj (dudepparse.py:739)
    ],
    [   # golden-0001
        "李四去法国旅游。",              # vv_plain (dudepparse.py:739)
        "张伟奔跑、跳跃在大草原。",      # coo_merge (dudepparse.py:740)
        "张三走到图书馆。",              # vcmp (dudepparse.py:858-866)
        "好的。",                        # <5 Chinese chars -> dropped
        "咽炎成为发热的原因。",          # att_obj (dudepparse.py:960-964)
    ],
    [   # golden-0002
        "张三发出关于事故的报道。",      # att_pob (dudepparse.py:1044)
        "北京大学的校长是郝平。",        # cop_sbj (dudepparse.py:1145)
        "玉米是从美国引进的。",          # cop_adj_mt (dudepparse.py:1211)
        # cop_adj_adv + cop_adj_pob (dudepparse.py:1212-1213), one turn
        "设备是木头做的。设备是用木头做的。",
        "语言是埃及人说的。",            # cop_adj_sbv (dudepparse.py:1214)
    ],
    [   # golden-0003
        "李四成为建设家园的力量。",      # att_sub (dudepparse.py:1337-1341)
        "德国总理默克尔访问法国。",      # att_att (dudepparse.py:1398)
        "张三被控试图杀死李四。",        # vob_vob (dudepparse.py:1436)
        "张三把苹果吃掉。",              # ba_svo (extract.py:183-202)
        "张三把礼物送给李四。",          # ba_dob (extract.py:183-194)
    ],
    [   # golden-0004
        "张三被李四批评了。",            # bei_svo (extract.py:204-238)
        "张三不喜欢方案。",              # neg_svo (dudepparse.py:1550-1596)
        "张三让李四玩。",                # dbl (extract.py:277-304)
        "清华大学发布论文。",            # svo_gn
        "腾讯公司投资华为公司。",        # svo_gg
    ],
    [   # golden-0005 — the coref conversation (main_ner.py:194-325 analog):
        # PERSON antecedent, then pronoun-subject turns whose substituted
        # text re-parses via svo_pn
        "张三喜欢方案。",                # svo_pn; antecedent := 张三
        "他研究技术。",                  # pron_svo -> 张三研究技术。
        "她发布文章。",                  # pron_svo -> 张三发布文章。
    ],
]

_ROLES = ("user", "assistant", "tool")
_BASE_TS_US = 1_700_000_000_000_000


def golden_transcripts_table() -> pa.Table:
    """The golden corpus in the BASELINE.json transcripts shape."""
    cols: dict[str, list] = {n: [] for n in SCHEMA.names}
    for ci, turns in enumerate(GOLDEN_CONVS):
        for ti, text in enumerate(turns):
            role = _ROLES[ti % 3]
            cols["conv_id"].append(f"golden-{ci:04d}")
            cols["turn_idx"].append(ti)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append("search" if role == "tool" else "")
            cols["ts"].append(_BASE_TS_US + ci * 3_600_000_000
                              + ti * 30_000_000)
    return pa.Table.from_arrays(
        [pa.array(cols["conv_id"], pa.string()),
         pa.array(cols["turn_idx"], pa.int32()),
         pa.array(cols["role"], pa.string()),
         pa.array(cols["text"], pa.string()),
         pa.array(cols["tool"], pa.string()),
         pa.array(np.asarray(cols["ts"], dtype="int64"),
                  pa.timestamp("us"))],
        schema=SCHEMA)


def write_golden_transcripts(out_dir: str) -> str:
    """Idempotent two-file parquet write (two files so the read, parse and
    aggregate stages genuinely run multi-block).

    The done-marker is derived from the CORPUS CONTENT, so editing
    GOLDEN_CONVS invalidates any previously written directory on every
    machine — a stale fixed-name marker would silently serve the old
    corpus and desynchronize the pipeline from golden_expected.py."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    digest = hashlib.md5(
        "\x1e".join("\x1f".join(turns) for turns in GOLDEN_CONVS)
        .encode()).hexdigest()[:16]
    marker = os.path.join(out_dir, f"_DONE_{digest}")
    if os.path.exists(marker):
        return out_dir
    for stale in os.listdir(out_dir):      # stale markers/parquet
        os.remove(os.path.join(out_dir, stale))
    t = golden_transcripts_table()
    half = (len(GOLDEN_CONVS) + 1) // 2
    cut = 0
    for i, cid in enumerate(t.column("conv_id").to_pylist()):
        if cid == f"golden-{half:04d}":
            cut = i
            break
    pq.write_table(t.slice(0, cut),
                   os.path.join(out_dir, "transcripts-0000.parquet"))
    pq.write_table(t.slice(cut),
                   os.path.join(out_dir, "transcripts-0001.parquet"))
    with open(marker, "w") as fp:
        fp.write("ok")
    return out_dir
