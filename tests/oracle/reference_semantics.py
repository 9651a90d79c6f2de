"""Label oracle: independent re-implementation of the reference semantics.

Mirrors the reference's *staged* architecture (regex stage → dictionary-NER
stage → toxicity stage, precedence by span overlap on raw-text offsets —
/root/reference/tests/unit/test_pipeline_integration.py:49-143) rather than
the engine's fused single pass, and re-implements every algorithm
separately from pii_filter_spark.core.detect. It shares only the
*configuration* (pattern strings, dictionaries, thresholds) with the
engine, because the configuration IS the semantics under test; the code
paths are disjoint, so byte-equality/F1 agreement between engine and oracle
is a real two-implementation check, not a tautology.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Tuple

from pii_filter_spark.core import langid as _langid
from pii_filter_spark.core import perplexity as _ppl
from pii_filter_spark.core import quality as _q
from pii_filter_spark.core.ner_dictionary import GRAMMARS, FALSE_POSITIVES
from pii_filter_spark.core.patterns import (
    DEFAULT_PRIORITY,
    PII_PATTERNS,
    PORTUGUESE_STOP_WORDS,
    TYPE_PRIORITY,
)
from pii_filter_spark.core.toxicity import TOXIC_TYPE, _PATTERN as _TOXIC_RE


class Hit:
    __slots__ = ("type", "value", "start", "end")

    def __init__(self, type_, value, start, end):
        self.type = type_
        self.value = value
        self.start = start
        self.end = end

    def overlaps(self, other: "Hit") -> bool:
        return self.start < other.end and self.end > other.start


# --- stage 1: regex ---------------------------------------------------------

def _oracle_validate(pii_type: str, value: str) -> bool:
    digits = re.sub(r"\D", "", value)
    if pii_type == "CPF":
        return len(digits) == 11 and len(set(digits)) > 1
    if pii_type == "EMAIL":
        at = value.count("@")
        if at != 1:
            return False
        local, _, domain = value.partition("@")
        return bool(local) and bool(domain) and ".." not in value
    if pii_type == "CEP":
        return len(digits) == 8
    if pii_type == "TELEFONE":
        return 10 <= len(digits) <= 13
    return True  # RG and unknown types


def regex_stage(text: str) -> List[Hit]:
    hits: List[Hit] = []
    for ptype, pattern in PII_PATTERNS.items():
        for m in pattern.finditer(text):
            if _oracle_validate(ptype, m.group(0)):
                hits.append(Hit(ptype, m.group(0), m.start(), m.end()))
    # reference overlap handling: anchor-window grouping, min priority wins
    hits.sort(key=lambda h: h.start)
    resolved: List[Hit] = []
    idx = 0
    while idx < len(hits):
        group = [hits[idx]]
        anchor_end = hits[idx].end
        nxt = idx + 1
        while nxt < len(hits) and hits[nxt].start < anchor_end:
            group.append(hits[nxt])
            nxt += 1
        best = group[0]
        for h in group[1:]:
            if TYPE_PRIORITY.get(h.type, DEFAULT_PRIORITY) < TYPE_PRIORITY.get(
                best.type, DEFAULT_PRIORITY
            ):
                best = h
        resolved.append(best)
        idx = nxt
    return resolved


# --- stage 2: dictionary NER -------------------------------------------------

_SUFFIX_OK = (" ii", " iii", " iv", " v", " jr", " sr", " filho", " neto")


def _oracle_guards(value: str) -> bool:
    v = value.strip()
    if len(v) < 3 or v.isdigit() or v.lower() in FALSE_POSITIVES:
        return False
    if ":" in v or "[" in v or "]" in v or "_" in v:
        return False
    if v.isupper() and len(v) > 4:
        return False
    has_digit = any("0" <= ch <= "9" for ch in v)
    if has_digit and not v.lower().rstrip().endswith(_SUFFIX_OK):
        return False
    return True


def ner_stage(text: str) -> List[Hit]:
    cands: List[Hit] = []
    for etype, pattern in GRAMMARS:
        for m in pattern.finditer(text):
            raw = m.group(0)
            trimmed = raw.strip()
            if not trimmed or not _oracle_guards(trimmed):
                continue
            lead = len(raw) - len(raw.lstrip())
            s = m.start() + lead
            cands.append(Hit(etype, trimmed, s, s + len(trimmed)))
    # longest-match: sort (start asc, length desc), greedy non-overlap
    cands.sort(key=lambda h: (h.start, h.start - h.end))
    out: List[Hit] = []
    cursor = -1
    for h in cands:
        if h.start >= cursor:
            out.append(h)
            cursor = h.end
    return out


# --- stage 3: toxicity --------------------------------------------------------

def toxic_stage(text: str) -> List[Hit]:
    return [Hit(TOXIC_TYPE, m.group(0), m.start(), m.end())
            for m in _TOXIC_RE.finditer(text)]


# --- precedence + substitution (reference integration-test semantics) --------

def detect(text: str) -> List[Hit]:
    rx = regex_stage(text)
    ner = [h for h in ner_stage(text) if not any(h.overlaps(r) for r in rx)]
    prio = rx + ner
    tox = [h for h in toxic_stage(text) if not any(h.overlaps(p) for p in prio)]
    final = prio + tox
    final.sort(key=lambda h: h.start)
    return final


def scrub(text: Optional[str]) -> Tuple[str, List[Dict]]:
    if not text:
        return text or "", []
    hits = detect(text)
    counts: Dict[str, int] = {}
    mappings: List[Dict] = []
    pieces: List[str] = []
    cursor = 0
    for h in hits:
        counts[h.type] = counts.get(h.type, 0) + 1
        ph = f"[{h.type}_{counts[h.type]}]"
        mappings.append({
            "placeholder": ph,
            "original_value": h.value,
            "type": h.type,
            "span_start": h.start,
            "span_end": h.end,
        })
        pieces.append(text[cursor:h.start])
        pieces.append(ph)
        cursor = h.end
    pieces.append(text[cursor:])
    return "".join(pieces), mappings


# --- quality rules (independent implementation of core/quality.py) -----------

_STOPS = set(PORTUGUESE_STOP_WORDS)


def quality_drop_reasons(text: Optional[str]) -> List[str]:
    if text is None or text.strip() == "":
        return ["empty"]
    words = text.split()
    n = len(words)
    reasons: List[str] = []
    if n < _q.MIN_WORDS:
        reasons.append("too_short")
    if n > _q.MAX_WORDS:
        reasons.append("too_long")
    mean_len = sum(map(len, words)) / n
    if mean_len < _q.MIN_MEAN_WORD_LEN or mean_len > _q.MAX_MEAN_WORD_LEN:
        reasons.append("word_length")
    symbols = text.count("#") + text.count("…") + text.count("...")
    if symbols / n > _q.MAX_SYMBOL_RATIO:
        reasons.append("symbol_ratio")
    alpha = sum(1 for w in words if re.search(r"[^\W\d_]", w, re.UNICODE))
    if alpha / n < _q.MIN_ALPHA_TOKEN_RATIO:
        reasons.append("alpha_ratio")
    if "lorem ipsum" in text.lower():
        reasons.append("lorem_ipsum")
    if "{" in text:
        reasons.append("brace")
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    if lines:
        if 1.0 - len(set(lines)) / len(lines) > _q.MAX_REPEATED_LINE_RATIO:
            reasons.append("repeated_lines")
        bullets = sum(1 for l in lines if l[:1] in {"-", "*", "•", "‣", "▪"})
        if bullets / len(lines) > _q.MAX_BULLET_LINE_RATIO:
            reasons.append("bullet_lines")
        ell = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
        if ell / len(lines) > _q.MAX_ELLIPSIS_LINE_RATIO:
            reasons.append("ellipsis_lines")
    if n >= _q.MIN_STOPWORD_WORDS:
        if not any(w.lower().strip(".,;:!?") in _STOPS for w in words):
            reasons.append("stopword")
    if _langid.detect_language(text) != _q.TARGET_LANG:
        reasons.append("lang")
    if _ppl.perplexity(text) > _ppl.PPL_THRESHOLD:
        reasons.append("perplexity")
    return reasons


def label_row(caption: Optional[str]) -> Dict:
    """Full oracle label for one caption (FIXTURES.md B1 schema)."""
    reasons = quality_drop_reasons(caption)
    scrubbed, mappings = scrub(caption)
    return {
        "keep": len(reasons) == 0,
        "drop_reasons": reasons,
        "scrubbed_caption": scrubbed,
        "pii_masked": mappings,
    }
