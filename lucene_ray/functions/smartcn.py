"""Chinese word segmentation (smartcn-lite) — a dictionary-driven Viterbi
segmenter with the reference's tokenizer/filter shape
(analysis/smartcn/src/java/.../cn/smart/HMMChineseTokenizer.java,
SmartChineseAnalyzer.java:123-134, hhmm/HHMMSegmenter.java) over a
REDUCED public dictionary:

* the reference segments with a hidden-Markov bigram model over its
  bundled ~200k-entry lexicon (hhmm/WordDictionary.java, binary data).
  This lite build runs the same lattice shape with summed word costs over
  a small built-in lexicon of very common Chinese words (public-knowledge
  core vocabulary) — a matched word beats any per-character split, longer
  matches beat shorter chains, and out-of-vocabulary Han characters come
  out as SINGLE-character tokens, which is exactly the reference's OOV
  behavior (SegTokenFilter emits unrecognized Hanzi one per token).
  Segmentation of in-lexicon text matches the reference; OOV compounds
  split per-char where the full dictionary would have joined them —
  documented divergence.
* Basic-Latin runs group into one token and are LOWERCASED by the
  tokenizer itself (SegTokenFilter lowercases Basic Latin — the analyzer
  chain therefore has no LowerCaseFilter, SmartChineseAnalyzer.java:126);
  full-width Latin/digits fold to halfwidth first (Utility.java's
  full-width normalization).
* digit runs group into one token.
* punctuation becomes single tokens and is dropped by the analyzer's
  default stop set, which is exactly the punctuation list
  (cn/smart/stopwords.txt) — this tokenizer discards them directly when
  ``discard_punctuation`` (the equivalent end state).

The analyzer chain (kind="smart_chinese") is HMMChineseTokenizer →
PorterStemFilter (yes — the reference Porter-stems the Latin tokens,
SmartChineseAnalyzer.java:129) → StopFilter(punctuation)."""

from __future__ import annotations

__all__ = ["ChineseTokenizer", "DEFAULT_ZH_LEXICON"]

# cost model shared with ja/ko — see functions/lattice.py
from lucene_ray.functions.lattice import (KNOWN_COST as _KNOWN_COST,
                                          UNK_CHAR_COST as _UNK_CHAR_COST,
                                          UNK_GROUP_BASE as _UNK_GROUP_BASE,
                                          UNK_GROUP_PER_CHAR
                                          as _UNK_GROUP_PER_CHAR,
                                          viterbi_segment)

_KNOWN_PER_CHAR = -5   # longer lexicon match beats a chain of shorter ones

# very common Chinese words — function words, pronouns, numbers/dates,
# frequent nouns/verbs (core-vocabulary public knowledge); extendable per
# instance via ``lexicon=``
DEFAULT_ZH_LEXICON = frozenset((
    # function words / pronouns
    "我们", "你们", "他们", "她们", "它们", "自己", "大家", "什么",
    "怎么", "这个", "那个", "这些", "那些", "这里", "那里", "哪里",
    "如果", "因为", "所以", "但是", "可是", "虽然", "然后", "还是",
    "或者", "而且", "并且", "不过", "已经", "正在", "可以", "可能",
    "应该", "必须", "需要", "没有", "不是", "就是", "都是", "也是",
    "不能", "不会", "不要", "非常", "十分", "比较", "特别", "一些",
    "一个", "一样", "一起", "一直", "一定", "一般", "每个", "任何",
    "所有", "其他", "其中", "对于", "关于", "通过", "根据", "由于",
    "为了", "除了", "之后", "之前", "之间", "以后", "以前", "以及",
    "以上", "以下", "时候", "现在", "今天", "明天", "昨天", "今年",
    "去年", "明年", "上午", "下午", "晚上", "时间", "地方", "问题",
    # frequent nouns / verbs
    "中国", "北京", "上海", "美国", "日本", "世界", "国家", "政府",
    "公司", "企业", "市场", "经济", "社会", "文化", "历史", "教育",
    "学校", "学生", "老师", "大学", "学习", "工作", "生活", "发展",
    "研究", "科学", "技术", "信息", "系统", "计算", "电脑", "网络",
    "软件", "数据", "使用", "开始", "进行", "觉得", "认为", "知道",
    "喜欢", "希望", "表示", "发现", "出现", "成为", "得到", "看到",
    "朋友", "东西", "事情", "孩子", "女人", "男人", "先生", "小姐",
))


def _char_class(c: str) -> str:
    o = ord(c)
    if (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0x20000 <= o <= 0x2FA1F or 0xF900 <= o <= 0xFAFF):
        return "han"
    if c.isalpha():
        return "alpha"
    if c.isdigit():
        return "digit"
    if c.isspace():
        return "space"
    return "punct"


_GROUPING = {"alpha", "digit", "space", "punct"}


def _width_fold(text: str) -> str:
    """Full-width ASCII → halfwidth (Utility.java's normalization; only
    the full-width block, not general NFKC)."""
    if all(not (0xFF01 <= ord(c) <= 0xFF5E) and ord(c) != 0x3000
           for c in text):
        return text
    return "".join(
        chr(ord(c) - 0xFEE0) if 0xFF01 <= ord(c) <= 0xFF5E
        else (" " if ord(c) == 0x3000 else c)
        for c in text)


class ChineseTokenizer:
    """→ [(surface, start, end)] — Latin runs lowercased, punctuation and
    whitespace dropped when ``discard_punctuation``. Offsets index the
    ORIGINAL text (width folding is 1:1)."""

    def __init__(self, lexicon=None, discard_punctuation: bool = True):
        self.lexicon = frozenset(
            DEFAULT_ZH_LEXICON if lexicon is None else lexicon)
        self.discard_punctuation = discard_punctuation
        self._max_known = max((len(s) for s in self.lexicon), default=0)

    def tokenize(self, text: str) -> list[tuple[str, int, int]]:
        text = _width_fold(text)
        n = len(text)
        if n == 0:
            return []
        classes = [_char_class(c) for c in text]

        def arcs_at(i):
            for ln in range(min(self._max_known, n - i), 0, -1):
                if text[i:i + ln] in self.lexicon:
                    yield ln, _KNOWN_COST + _KNOWN_PER_CHAR * ln, "known", None
            cls = classes[i]
            if cls in _GROUPING:
                j = i + 1
                while j < n and classes[j] == cls:
                    j += 1
                ln = j - i
                yield ln, _UNK_GROUP_BASE + _UNK_GROUP_PER_CHAR * ln, cls, None
            yield 1, _UNK_CHAR_COST, "char:" + cls, None

        out: list[tuple[str, int, int]] = []
        for i, j, kind, _payload in viterbi_segment(n, arcs_at):
            cls = kind[5:] if kind.startswith("char:") else kind
            if cls in ("punct", "space") and self.discard_punctuation:
                continue
            surf = text[i:j]
            if cls == "alpha":
                surf = surf.lower()
            out.append((surf, i, j))
        return out

    def tokenize_surfaces(self, text: str) -> list[str]:
        return [s for s, _a, _b in self.tokenize(text)]
