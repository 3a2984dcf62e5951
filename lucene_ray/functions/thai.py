"""Thai tokenizer (thai-lite) — the ThaiAnalyzer surface
(analysis/common/src/java/.../th/ThaiAnalyzer.java:93-100: ThaiTokenizer →
LowerCaseFilter → DecimalDigitFilter → StopFilter) with a reduced
segmenter. The reference's ThaiTokenizer delegates to an ICU
DictionaryBasedBreakIterator over a bundled Thai lexicon; this lite build
runs the shared Viterbi lattice (functions/lattice.py) instead:

* known words — a built-in lexicon (default: the analyzer's own stopword
  list, which is exactly the high-frequency function-word vocabulary the
  dictionary segmenter needs to split; extendable per instance) match
  ANYWHERE inside a Thai run, longer matches preferred;
* unknown Thai — variable-length spans within a run (cost grows with
  length), so known words split off and the CONTENT chunks between them
  come out as single tokens. With the full ICU dictionary those chunks
  would segment further — documented divergence: function words and
  known-lexicon words segment identically, out-of-lexicon compounds stay
  joined;
* Latin-alpha and digit runs group into one token; punctuation/space
  dropped.

The stop list below is the reference's th/stopwords.txt verbatim (115
entries; attribution header in that file)."""

from __future__ import annotations

from lucene_ray.functions.lattice import (KNOWN_COST as _KNOWN_COST,
                                          UNK_CHAR_COST as _UNK_CHAR_COST,
                                          UNK_GROUP_BASE as _UNK_GROUP_BASE,
                                          UNK_GROUP_PER_CHAR
                                          as _UNK_GROUP_PER_CHAR,
                                          viterbi_segment)

__all__ = ["ThaiTokenizer", "THAI_STOP_WORDS"]

_KNOWN_PER_CHAR = -5   # longer lexicon match beats a chain of shorter ones
_MAX_UNK_SPAN = 24     # unknown-arc cap per position (runs are unspaced)
# Thai unknown-arc base is SMALL (unlike ja/ko): runs are unspaced, so a
# known word in the middle must be worth paying one extra arc —
# base + known_cost < per_char * len(word) for the 2-char function words
# (300 + 85 < 400). Splitting into two unknowns with nothing gained still
# loses (any base > 0).
_TH_UNK_BASE = 300

# th/stopwords.txt verbatim
THAI_STOP_WORDS = frozenset((
    "ไว้", "ไม่", "ไป", "ได้", "ให้", "ใน", "โดย",
    "แห่ง", "แล้ว", "และ", "แรก", "แบบ", "แต่", "เอง",
    "เห็น", "เลย", "เริ่ม", "เรา", "เมื่อ", "เพื่อ", "เพราะ",
    "เป็นการ", "เป็น", "เปิดเผย", "เปิด", "เนื่องจาก", "เดียวกัน", "เดียว",
    "เช่น", "เฉพาะ", "เคย", "เข้า", "เขา", "อีก", "อาจ",
    "อะไร", "ออก", "อย่าง", "อยู่", "อยาก", "หาก", "หลาย",
    "หลังจาก", "หลัง", "หรือ", "หนึ่ง", "ส่วน", "ส่ง", "สุด",
    "สําหรับ", "ว่า", "วัน", "ลง", "ร่วม", "ราย", "รับ",
    "ระหว่าง", "รวม", "ยัง", "มี", "มาก", "มา", "พร้อม",
    "พบ", "ผ่าน", "ผล", "บาง", "น่า", "นี้", "นํา",
    "นั้น", "นัก", "นอกจาก", "ทุก", "ที่สุด", "ที่", "ทําให้",
    "ทํา", "ทาง", "ทั้งนี้", "ทั้ง", "ถ้า", "ถูก", "ถึง",
    "ต้อง", "ต่างๆ", "ต่าง", "ต่อ", "ตาม", "ตั้งแต่", "ตั้ง",
    "ด้าน", "ด้วย", "ดัง", "ซึ่ง", "ช่วง", "จึง", "จาก",
    "จัด", "จะ", "คือ", "ความ", "ครั้ง", "คง", "ขึ้น",
    "ของ", "ขอ", "ขณะ", "ก่อน", "ก็", "การ", "กับ",
    "กัน", "กว่า", "กล่าว",))


def _char_class(c: str) -> str:
    o = ord(c)
    if 0x0E00 <= o <= 0x0E7F:
        return "thai"
    if c.isalpha():
        return "alpha"
    if c.isdigit():
        return "digit"
    if c.isspace():
        return "space"
    return "punct"


_GROUPING = {"alpha", "digit", "space", "punct"}


class ThaiTokenizer:
    """→ [(surface, start, end)]; Latin runs keep case (LowerCaseFilter is
    the analyzer's job, like the reference chain)."""

    def __init__(self, lexicon=None, discard_punctuation: bool = True):
        self.lexicon = frozenset(
            THAI_STOP_WORDS if lexicon is None else lexicon)
        self.discard_punctuation = discard_punctuation
        self._max_known = max((len(s) for s in self.lexicon), default=0)

    def tokenize(self, text: str) -> list[tuple[str, int, int]]:
        n = len(text)
        if n == 0:
            return []
        classes = [_char_class(c) for c in text]
        run_end = [0] * n
        j = n
        for i in range(n - 1, -1, -1):
            if i == n - 1 or classes[i] != classes[i + 1]:
                j = i + 1
            run_end[i] = j

        def arcs_at(i):
            cls = classes[i]
            if cls == "thai":
                for ln in range(min(self._max_known, n - i), 0, -1):
                    if text[i:i + ln] in self.lexicon:
                        yield (ln, _KNOWN_COST + _KNOWN_PER_CHAR * ln,
                               "known", None)
                # variable-length unknown spans inside the run: lexicon
                # words split off anywhere, content chunks stay joined
                stop = min(run_end[i], i + _MAX_UNK_SPAN)
                for j2 in range(i + 1, stop + 1):
                    ln = j2 - i
                    yield (ln, _TH_UNK_BASE + _UNK_GROUP_PER_CHAR * ln,
                           "thai", None)
            elif cls in _GROUPING:
                ln = run_end[i] - i
                yield ln, _UNK_GROUP_BASE + _UNK_GROUP_PER_CHAR * ln, cls, None
            yield 1, _UNK_CHAR_COST, "char:" + cls, None

        out: list[tuple[str, int, int]] = []
        for i, j2, kind, _payload in viterbi_segment(n, arcs_at):
            cls = kind[5:] if kind.startswith("char:") else kind
            if cls in ("punct", "space") and self.discard_punctuation:
                continue
            out.append((text[i:j2], i, j2))
        return out

    def tokenize_surfaces(self, text: str) -> list[str]:
        return [s for s, _a, _b in self.tokenize(text)]
