"""Deterministic template grammar with gold DDParser-style parses.

The sandbox has no DDParser/CoreNLP models, so the synthetic transcript
corpus is generated from templates whose gold ``{word, head, deprel}`` parses
are known by construction, and the parse stage recovers them by template
matching.  The parse shapes are taken verbatim from the worked examples
embedded in the reference (citations per template below), so the extraction
cascade is exercised against exactly the structures the reference documents.

Contract mirrored from the reference (`/root/reference/dudepparse.py:1891-1906`):
``head`` is 1-based with 0 = root, and ``''.join(words) == sentence_text``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

from . import lexicon as lx

# slot-class name -> word list
SLOT_CLASSES: dict[str, list[str]] = {
    "person": lx.PERSONS,
    "org": lx.ORGS,
    "place": lx.PLACES,
    "noun": lx.COMMON_NOUNS,
    "vt": lx.VERBS_TRANS,
    "vi": lx.VERBS_INTRANS,
    "advm": lx.ADV_MANNER,
    "pron": lx.PRONOUNS,
    "border_v": lx.BORDER_VERBS,
    "walk_v": lx.WALK_VERBS,
    "ba_v": lx.BA_VERBS,
    "give_v": lx.GIVE_VERBS,
    "bei_v": lx.BEI_VERBS,
    "accuse_v": lx.ACCUSE_VERBS,
    "import_v": lx.IMPORT_VERBS,
    "make_v": lx.MAKE_VERBS,
    "say_v": lx.SAY_VERBS,
    "report_v": lx.REPORT_VERBS,
    "build_v": lx.BUILD_VERBS,
    "run_va": lx.RUN_VERBS_A,
    "run_vb": lx.RUN_VERBS_B,
    "role": lx.ROLE_NOUNS,
    "result": lx.RESULT_NOUNS,
    "cause": lx.CAUSE_NOUNS,
    "material": lx.MATERIAL_NOUNS,
    "report_n": lx.REPORT_NOUNS,
    "home": lx.HOME_NOUNS,
    "power": lx.POWER_NOUNS,
    "product": lx.PRODUCT_NOUNS,
    "neg": ["不", "没有", "无法", "难以"],
    "conj": ["与", "和", "同"],
}


@dataclass(frozen=True)
class Template:
    """One sentence construction: parts are ('lit', word) or ('slot', class)."""

    tid: str
    parts: tuple[tuple[str, str], ...]
    heads: tuple[int, ...]     # 1-based, 0 = root
    deprels: tuple[str, ...]

    def __post_init__(self):
        assert len(self.parts) == len(self.heads) == len(self.deprels), self.tid

    def realize(self, fills: dict[int, str]) -> list[str]:
        """Token list with slot i (position index) replaced by fills[i]."""
        words = []
        for i, (kind, val) in enumerate(self.parts):
            words.append(val if kind == "lit" else fills[i])
        return words


def _t(tid, parts, heads, deprels) -> Template:
    return Template(tid, tuple(parts), tuple(heads), tuple(deprels))


L = lambda w: ("lit", w)        # noqa: E731
S = lambda c: ("slot", c)       # noqa: E731

# NOTE on citations: each template's (heads, deprels) shape is the worked
# example at the given reference line, generalized over slot lexicons.
TEMPLATES: list[Template] = [
    # 张三急匆匆地赶往机场。  (dudepparse.py:459-460)
    _t("adv_svo", [S("person"), S("advm"), L("地"), L("赶往"), S("place"), L("。")],
       (4, 4, 2, 0, 4, 4), ("SBV", "ADV", "MT", "HED", "VOB", "MT")),
    # 中国与印度接壤  (dudepparse.py:477) — POB amendment, no object
    _t("pob_noobj", [S("place"), S("conj"), S("place"), S("border_v"), L("。")],
       (4, 4, 2, 0, 4), ("SBV", "ADV", "POB", "HED", "MT")),
    # 李四光为科学做出了贡献。  (dudepparse.py:482-483) — POB amendment with object
    _t("pob_obj", [S("person"), L("为"), S("noun"), L("做出"), L("了"), S("result"), L("。")],
       (4, 4, 2, 0, 4, 4, 4), ("SBV", "ADV", "POB", "HED", "MT", "VOB", "MT")),
    # 张三在李四家玩。  (dudepparse.py:640-641) — MT preposition quirk
    _t("mt_prep", [S("person"), L("在"), S("place"), S("vi"), L("。")],
       (4, 3, 4, 0, 4), ("SBV", "MT", "ADV", "HED", "MT")),
    # 我去诊所打疫苗  (dudepparse.py:739) — VV serial verb with object
    _t("vv_obj", [S("person"), L("去"), S("place"), L("打"), L("疫苗"), L("。")],
       (2, 0, 2, 2, 4, 2), ("SBV", "HED", "VOB", "VV", "VOB", "MT")),
    # 我去法国旅游  (dudepparse.py:739) — VV serial verb
    _t("vv_plain", [S("person"), L("去"), S("place"), S("vi"), L("。")],
       (2, 0, 2, 2, 2), ("SBV", "HED", "VOB", "VV", "MT")),
    # 他们奔跑、跳跃在…大草原  (dudepparse.py:740) — COO merge + MT quirk
    _t("coo_merge", [S("person"), S("run_va"), L("、"), S("run_vb"), L("在"), S("place"), L("。")],
       (2, 0, 4, 2, 6, 4, 2), ("SBV", "HED", "MT", "COO", "MT", "VOB", "MT")),
    # V_CMP fusion: 张三走到图书馆。  (schematic at dudepparse.py:858-866)
    _t("vcmp", [S("person"), S("walk_v"), L("到"), S("place"), L("。")],
       (2, 0, 2, 3, 2), ("SBV", "HED", "CMP", "VOB", "MT")),
    # 咽炎成为发热的原因。  (dudepparse.py:960-964) — ATT_OBJ
    _t("att_obj", [S("noun"), L("成为"), S("noun"), L("的"), S("cause"), L("。")],
       (2, 0, 5, 3, 2, 2), ("SBV", "HED", "ATT", "MT", "VOB", "MT")),
    # 张三发出关于那次事故的报道  (dudepparse.py:1044) — ATT_POB
    _t("att_pob", [S("person"), S("report_v"), L("关于"), S("noun"), L("的"), S("report_n"), L("。")],
       (2, 0, 6, 3, 3, 2, 2), ("SBV", "HED", "ATT", "POB", "MT", "VOB", "MT")),
    # 北京大学的校长是郝平。  (dudepparse.py:1145) — COP_SBJ
    _t("cop_sbj", [S("org"), L("的"), S("role"), L("是"), S("person"), L("。")],
       (3, 1, 4, 0, 4, 4), ("ATT", "MT", "SBV", "HED", "VOB", "MT")),
    # 玉米是从美国引进的。  (dudepparse.py:1211) — COP_ADJ v1 (MT variant)
    _t("cop_adj_mt", [S("product"), L("是"), L("从"), S("place"), S("import_v"), L("的"), L("。")],
       (2, 0, 4, 5, 6, 2, 2), ("SBV", "HED", "MT", "ADV", "ATT", "VOB", "MT")),
    # 设备是木头做的。  (dudepparse.py:1212) — COP_ADJ v2 (bare noun ADV)
    _t("cop_adj_adv", [S("product"), L("是"), S("material"), S("make_v"), L("的"), L("。")],
       (2, 0, 4, 5, 2, 2), ("SBV", "HED", "ADV", "ATT", "VOB", "MT")),
    # 设备是用木头做的。  (dudepparse.py:1213) — COP_ADJ v3 (ADV POB)
    _t("cop_adj_pob", [S("product"), L("是"), L("用"), S("material"), S("make_v"), L("的"), L("。")],
       (2, 0, 5, 3, 6, 2, 2), ("SBV", "HED", "ADV", "POB", "ATT", "VOB", "MT")),
    # 语言是埃及人说的。  (dudepparse.py:1214) — COP_ADJ v4 (SBV variant)
    _t("cop_adj_sbv", [S("product"), L("是"), S("person"), S("say_v"), L("的"), L("。")],
       (2, 0, 4, 5, 2, 2), ("SBV", "HED", "SBV", "ATT", "VOB", "MT")),
    # 他们成为建设家园的力量。  (dudepparse.py:1337-1341) — ATT_SUB chain
    _t("att_sub", [S("person"), L("成为"), S("build_v"), S("home"), L("的"), S("power"), L("。")],
       (2, 0, 6, 3, 3, 2, 2), ("SBV", "HED", "ATT", "VOB", "MT", "VOB", "MT")),
    # 德国总理默克尔访问法国。  (dudepparse.py:1398) — ATT_ATT "Merkel construction"
    _t("att_att", [S("place"), S("role"), S("person"), S("vt"), S("place"), L("。")],
       (2, 3, 4, 0, 4, 4), ("ATT", "ATT", "SBV", "HED", "VOB", "MT")),
    # 他被控试图杀死李四。  (dudepparse.py:1436) — VOB_VOB chain
    _t("vob_vob", [S("person"), L("被控"), L("试图"), S("accuse_v"), S("person"), L("。")],
       (2, 0, 2, 3, 4, 2), ("SBV", "HED", "VOB", "VOB", "VOB", "MT")),
    # 把-construction, simple object  (extract.py:183-202)
    _t("ba_svo", [S("person"), L("把"), S("noun"), S("ba_v"), L("。")],
       (4, 4, 2, 0, 4), ("SBV", "POB", "POB", "HED", "MT")),
    # 把-construction with VOB -> DOB 4-ary  (extract.py:183-194)
    _t("ba_dob", [S("person"), L("把"), S("noun"), S("give_v"), S("person"), L("。")],
       (4, 4, 2, 0, 4, 4), ("SBV", "POB", "POB", "HED", "VOB", "MT")),
    # 被-passive  (extract.py:204-238)
    _t("bei_svo", [S("person"), L("被"), S("person"), S("bei_v"), L("了"), L("。")],
       (4, 4, 2, 0, 4, 4), ("SBV", "POB", "POB", "HED", "MT", "MT")),
    # negation: 张三不喜欢方案。  (check_nct, dudepparse.py:1550-1596)
    _t("neg_svo", [S("person"), S("neg"), S("vt"), S("noun"), L("。")],
       (3, 3, 0, 3, 3), ("SBV", "ADV", "HED", "VOB", "MT")),
    # pivot (兼语) construction  (extract.py:277-304)
    _t("dbl", [S("person"), L("让"), S("person"), S("vi"), L("。")],
       (2, 0, 2, 2, 2), ("SBV", "HED", "DBL", "VOB", "MT")),
    # pronoun-subject SVO: the coref branch rewrites the pronoun (main_ner.py:194-325 analog)
    _t("pron_svo", [S("pron"), S("vt"), S("noun"), L("。")],
       (2, 0, 2, 2), ("SBV", "HED", "VOB", "MT")),
    # plain SVO over persons / orgs / person-org pairs (the bulk of the graph)
    _t("svo_pn", [S("person"), S("vt"), S("noun"), L("。")],
       (2, 0, 2, 2), ("SBV", "HED", "VOB", "MT")),
    _t("svo_gn", [S("org"), S("vt"), S("noun"), L("。")],
       (2, 0, 2, 2), ("SBV", "HED", "VOB", "MT")),
    _t("svo_pg", [S("person"), S("vt"), S("org"), L("。")],
       (2, 0, 2, 2), ("SBV", "HED", "VOB", "MT")),
    _t("svo_gg", [S("org"), S("vt"), S("org"), L("。")],
       (2, 0, 2, 2), ("SBV", "HED", "VOB", "MT")),
]

TEMPLATE_BY_ID = {t.tid: t for t in TEMPLATES}


# =============================================================================
# Template parser (the deterministic DependencyParser implementation)
# =============================================================================

def _class_pattern(cls: str) -> str:
    words = sorted(SLOT_CLASSES[cls], key=len, reverse=True)
    return "(?:" + "|".join(re.escape(w) for w in words) + ")"


@lru_cache(maxsize=1)
def compiled_templates() -> list[tuple[Template, "re.Pattern[str]"]]:
    """Per-template anchored regex; slots become named groups g{i}."""
    out = []
    for t in TEMPLATES:
        chunks = []
        for i, (kind, val) in enumerate(t.parts):
            if kind == "lit":
                chunks.append(re.escape(val))
            else:
                chunks.append(f"(?P<g{i}>{_class_pattern(val)})")
        out.append((t, re.compile("^" + "".join(chunks) + "$")))
    return out


def parse_sentence(text: str) -> dict:
    """text -> DDParser-style ``{'word': [...], 'head': [...], 'deprel': [...]}``.

    Falls back to a single-token HED parse for non-template text (noise turns,
    re-chunked long sentences); the cascade then emits only a Phrase relation
    for it, which downstream filtering drops — mirroring how unparseable
    content contributes nothing to the reference's SVO output.

    Invariant (reference dudepparse.py:1901-1906): ``''.join(word) == text``.
    """
    for t, pat in compiled_templates():
        m = pat.match(text)
        if m is None:
            continue
        words = []
        for i, (kind, val) in enumerate(t.parts):
            words.append(val if kind == "lit" else m.group(f"g{i}"))
        return {"word": words, "head": list(t.heads), "deprel": list(t.deprels)}
    return {"word": [text], "head": [0], "deprel": ["HED"]}
