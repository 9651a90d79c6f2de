"""Character-trigram language-model perplexity scoring [north-rule addition].

Stands in for the KenLM n-gram perplexity stage named by the north rule
(no kenlm wheel in this container). Same mathematical object at small scale: a
backoff-free add-k-smoothed character trigram LM trained deterministically
at import time on the embedded Portuguese seed corpus, scoring
ppl(text) = exp(-mean log P(c_i | c_{i-2} c_{i-1})). High-perplexity
captions (keyboard mash, wrong alphabet, symbol soup) are dropped by the
quality stage; the threshold is calibrated on fixtures and frozen here.

The trained table is a plain dict built once per Python worker at module
import (shipped via --py-files) — the moral equivalent of broadcasting a
KenLM binary to executors.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import List

from .langid import _SEED_CORPORA

_K = 0.1  # add-k smoothing
_BOS = "\x02"

# Train on Portuguese seed text (the pipeline's target language).
_TRAIN = _SEED_CORPORA["pt"]

# Frozen drop threshold: calibrated so clean Portuguese captions score
# far below and non-linguistic noise far above (see tests/test_quality.py).
PPL_THRESHOLD = 31.0


# Like the langid stage, the LM scores LETTERS: digits and punctuation are
# stripped so a caption dense with CPF/phone/CEP numbers is not penalized
# for containing trigrams the (digit-free) training corpus never saw.
# Symbol-only junk then normalizes to "" -> ppl 0.0; the symbol_ratio /
# alpha_ratio quality rules own that failure mode instead.
_NON_LETTER = re.compile(r"[^\w\s]|[\d_]")


def _normalize(text: str) -> str:
    return " ".join(_NON_LETTER.sub(" ", text.lower()).split())


def _train():
    text = _BOS + _BOS + _normalize(_TRAIN)
    tri = Counter()
    bi = Counter()
    charset = set(text)
    for i in range(2, len(text)):
        ctx = text[i - 2 : i]
        tri[(ctx, text[i])] += 1
        bi[ctx] += 1
    return tri, bi, len(charset) + 1


_TRI, _BI, _V = _train()


def log_prob_char(ctx: str, ch: str) -> float:
    num = _TRI.get((ctx, ch), 0) + _K
    den = _BI.get(ctx, 0) + _K * _V
    return math.log(num / den)


def perplexity(text: str) -> float:
    """Char-trigram perplexity; +inf-ish high for empty input is avoided by
    returning the threshold sentinel (empty text is handled by the 'empty'
    quality rule, not the perplexity rule)."""
    if not text or not text.strip():
        return 0.0
    t = _BOS + _BOS + _normalize(text)
    total = 0.0
    n = 0
    for i in range(2, len(t)):
        total += log_prob_char(t[i - 2 : i], t[i])
        n += 1
    if n == 0:
        return 0.0
    return math.exp(-total / n)


def perplexity_batch(texts) -> List[float]:
    return [perplexity(t) if isinstance(t, str) else 0.0 for t in texts]
