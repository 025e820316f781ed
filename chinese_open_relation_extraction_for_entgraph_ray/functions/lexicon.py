"""Word lists, POS gazetteer and feature constants for the extraction cascade.

These mirror the reference's module-level word lists (the reference's only
"extension surface"): pivot prepositions (/root/reference/dudepparse.py:428-433),
copular predicates (:435-436), POS acceptability lists (:440-444), stop words
(:1662-1664), negation markers (:1554-1555), sentence-split delimiters
(/root/reference/preprocess_corpus.py:11).

The POS gazetteer replaces the CoreNLP POS tagger for the deterministic
synthetic-transcript grammar: every vocabulary word carries one CTB-style tag
(NR proper noun, NN common noun, VV verb, AD adverb, P preposition, PN pronoun),
matching the tag inventory the reference consumes via ``examine_postags``
(/root/reference/dudepparse.py:177-186).
"""

from __future__ import annotations

# --- sentence splitting (reference preprocess_corpus.py:11,17) ---------------
SPLIT_DELIMITERS = ["\n", "。", "！", "？", "；", "：\"", "……", ";", "。\""]
# delimiters re-attached to the RIGHT piece instead of the left
RIGHT_ATTACH_DELIMS = {"（", "：\""}
NO_ATTACH_DELIMS = {" ", "\n"}
MIN_CHINESE_CHARS = 4          # keep sentence iff chinese_chars > 4 (FILTER_LEN)
MAX_CHINESE_CHARS = 430        # and chinese_chars <= 430
MAX_SENT_LEN = 500             # and total length < 500
LONG_SPLIT_INTERVAL = 430
LONG_SPLIT_BREAKERS = {"，", "；", "、", " "}

# --- amendment-rule pivots (reference dudepparse.py:428-447) -----------------
PIVOT_ADV_WORDS = [
    "与", "和", "跟", "同",                                    # conjunction
    "在", "于", "自", "自从", "从", "当", "由", "趁", "趁着", "随着", "到",  # time
    "按照", "通过", "按", "比", "拿", "以", "凭", "凭借",          # method
    "为", "为了", "由于", "因为",                                # reason
    "对", "对于", "关于", "除了", "除", "让", "给", "使得", "使",
    "朝", "向", "沿", "沿着", "顺", "顺着",
]

COPULA_PREDS = {
    "是", "也是", "就是", "而是", "正是", "才是", "都是", "仍是", "既是", "又是",
    "却是", "只是", "算是", "竟是", "便是", "无疑是", "乃是", "并且是", "达", "高达",
}

# check_nct's copular conversion uses its own LOCAL set WITHOUT 达/高达
# (reference dudepparse.py:1556 vs the amendment-stage set at :435-436)
NCT_COPULA_PREDS = COPULA_PREDS - {"达", "高达"}

# CTB-ish POS acceptability lists (reference dudepparse.py:440-442)
ACCEPTABLE_POS = ["FW", "NN", "NR", "NT", "PN", "VV"]
NOUN_POS = ["FW", "NN", "NR", "NT", "PN"]
MODIF_NOUN_POS = ["FW", "NN", "NR"]

PUNCTUATION = [
    "。", "？", "！", "，", "、", "；", "：", "\"", "（", "）", "《", "》",
    "【", "】", "……", "“", "”", "「", "」", "～",
]

# --- triple filtering (reference dudepparse.py:1662-1664, 267-332) -----------
STOP_WORDS = [
    "有", "没有", "还有", "还", "是", "你", "我", "他", "她", "它", "他们", "她们",
    "它们", "带", "的", "任", "这", "那", "这些", "那些", "哪", "哪些", "这个",
    "那个", "这里", "那里", "里", "可能", "之", "个", "能", "内", "外", "等", "下", "上",
]
ARG_LEN_THRESHOLD = 20

# --- negation (reference dudepparse.py:1554-1555) ----------------------------
NEG_ADV_WORDS = ["不", "未能", "不会", "不能", "没有", "无法", "难以"]
NEG_CMP_WORDS = ["失败"]

# --- tense/modal (disabled in reference; kept behind flags,
#     reference dudepparse.py:1489-1535) --------------------------------------
PAST_MT_WORDS = ["了", "过"]
PAST_ADV_WORDS = ["曾经", "曾", "从前", "以前", "昨天", "上周", "近日", "去年"]
FUTURE_ADV_WORDS = ["将", "将要", "将会", "必将", "明天", "下周", "明年", "后天"]
MODAL_MAP = {
    "能": "能", "能够": "能", "该": "该", "应该": "该", "会": "会", "要": "要",
    "需要": "要", "敢": "敢", "敢于": "敢", "可以": "能", "必须": "要", "肯": "会",
}

# --- per-sentence relation caps (reference dudepparse.py:16,215) -------------
FILTER_REL_CAP = 2000
SVO_CAP = 3000

# =============================================================================
# POS gazetteer for the synthetic transcript grammar
# =============================================================================

PERSONS = [
    "张伟", "王芳", "李娜", "刘强", "陈静", "杨洋", "赵敏", "孙杰", "周涛", "吴磊",
    "郑爽", "郝平", "默克尔", "李四光", "马云", "钟南山", "袁隆平", "屠呦呦",
    "张三", "李四", "王五", "埃及人",
]

ORGS = [
    "北京大学", "清华大学", "阿里巴巴", "腾讯公司", "国家电网", "人民日报",
    "世界卫生组织", "中国科学院", "华为公司", "复旦大学", "交通银行", "故宫博物院",
]

PLACES = [
    "中国", "印度", "法国", "德国", "美国", "日本", "俄罗斯", "巴西",
    "北京", "上海", "广州", "深圳", "杭州", "成都", "武汉", "西安",
    "机场", "图书馆", "医院", "学校", "大草原", "实验室", "博物馆", "诊所",
]

COMMON_NOUNS = [
    "科学", "贡献", "原因", "力量", "报道", "事故", "疫苗", "设备", "木头",
    "玉米", "语言", "总理", "总统", "校长", "总裁", "创始人", "教授", "经理",
    "员工", "项目", "计划", "会议", "文章", "论文", "技术", "数据", "系统",
    "发热", "咽炎", "家园", "家乡", "动力", "苹果", "书籍", "礼物", "帮助",
    "关键", "重点", "评论", "钢铁", "演讲", "合同", "方案", "政策",
]

VERBS_TRANS = [
    "访问", "研究", "发布", "建设", "推动", "支持", "反对", "喜欢", "讨论",
    "分析", "开发", "设计", "提出", "完成", "宣布", "收购", "投资", "考察",
    "参观", "批准", "拒绝", "赞扬", "调查", "审核", "采纳",
]

VERBS_INTRANS = ["玩", "工作", "学习", "旅游", "休息", "散步"]

ADV_MANNER = ["急匆匆", "悄悄", "兴冲冲", "匆忙", "缓缓"]

PRONOUNS = ["他", "她", "它", "他们", "她们"]

# Small dedicated verb/noun classes used by individual grammar templates so
# that template regexes never overlap (each construction keeps its own verbs).
BORDER_VERBS = ["接壤", "合作", "会谈"]          # 与/和/同 + POB constructions
WALK_VERBS = ["走", "跑", "搬", "飞"]            # V + CMP(到) constructions
BA_VERBS = ["吃掉", "卖掉", "修好"]              # 把-constructions
GIVE_VERBS = ["送给", "交给"]                    # 把 + DOB constructions
BEI_VERBS = ["批评", "表扬", "超越"]             # 被-passives
ACCUSE_VERBS = ["杀死", "伤害", "欺骗"]          # 被控试图 + VOB chains
IMPORT_VERBS = ["引进", "进口"]                  # 是…的 cleft v1/v3
MAKE_VERBS = ["做", "制造"]                      # 是…的 cleft v2
SAY_VERBS = ["说", "写"]                         # 是…的 cleft v4
REPORT_VERBS = ["发出", "撰写", "发表"]          # ATT_POB constructions
BUILD_VERBS = ["建设", "保卫"]                   # ATT_SUB constructions
RUN_VERBS_A = ["奔跑", "行走"]                   # COO merge, first conjunct
RUN_VERBS_B = ["跳跃", "歌唱"]                   # COO merge, second conjunct

ROLE_NOUNS = ["总理", "总统", "校长", "总裁", "创始人"]
RESULT_NOUNS = ["贡献", "帮助"]
CAUSE_NOUNS = ["原因", "关键", "重点"]
MATERIAL_NOUNS = ["木头", "钢铁"]
REPORT_NOUNS = ["报道", "文章", "评论"]
HOME_NOUNS = ["家园", "家乡"]
POWER_NOUNS = ["力量", "动力"]
PRODUCT_NOUNS = ["玉米", "设备", "技术", "语言"]

_EXTRA_VERBS = (
    BORDER_VERBS + WALK_VERBS + BA_VERBS + GIVE_VERBS + BEI_VERBS + ACCUSE_VERBS
    + IMPORT_VERBS + MAKE_VERBS + SAY_VERBS + REPORT_VERBS + BUILD_VERBS
    + RUN_VERBS_A + RUN_VERBS_B + ["做出", "提供", "带来", "赶往", "成为", "让",
                                   "被控", "试图", "去", "打", "玩", "是"]
)

#: word -> CTB-ish POS tag; the per-sentence POS map handed to the cascade is
#: derived from this (analog of corenlp_pos_tags, reference main_ner.py:36-40).
POS_GAZETTEER: dict[str, str] = {}
for _w in PERSONS:
    POS_GAZETTEER[_w] = "NR"
for _w in ORGS:
    POS_GAZETTEER[_w] = "NT"
for _w in PLACES:
    POS_GAZETTEER[_w] = "NR"
for _w in COMMON_NOUNS:
    POS_GAZETTEER[_w] = "NN"
for _w in VERBS_TRANS + VERBS_INTRANS + _EXTRA_VERBS:
    POS_GAZETTEER[_w] = "VV"
for _w in ADV_MANNER:
    POS_GAZETTEER[_w] = "AD"
for _w in PRONOUNS:
    POS_GAZETTEER[_w] = "PN"

#: NER label per gazetteer class, used by the mention detector / entity linker.
NER_GAZETTEER: dict[str, str] = {}
for _w in PERSONS:
    NER_GAZETTEER[_w] = "PERSON"
for _w in ORGS:
    NER_GAZETTEER[_w] = "ORGANIZATION"
for _w in PLACES:
    NER_GAZETTEER[_w] = "LOCATION"

#: alias -> canonical surface for entity linking (EntGraph-style canonicalization)
ENTITY_ALIASES: dict[str, str] = {
    "北大": "北京大学",
    "清华": "清华大学",
    "阿里": "阿里巴巴",
    "腾讯": "腾讯公司",
    "华为": "华为公司",
    "世卫组织": "世界卫生组织",
}


def pos_map_for_words(words: list[str]) -> dict[str, list[str]]:
    """Per-sentence word -> [pos] map, the shape the cascade consumes
    (analog of corenlp_pos_tags; reference main_ner.py:36-40)."""
    out: dict[str, list[str]] = {}
    for w in words:
        tag = POS_GAZETTEER.get(w)
        if tag is not None and w not in out:
            out[w] = [tag]
    return out
