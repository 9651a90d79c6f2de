"""Inverse transform: restore original values into scrubbed text.

Parity with the reference restoration stack
(/root/reference/src/services/restoration_service.py:43-165 and
regex_service.py:204-231): placeholder→original replacement processed in
reverse span order, duplicate-label cleanup, and a leftover-placeholder
integrity check. Because our placeholders are unique per row ("[TYPE_n]"
numbered per type) replacement order cannot nest, but we keep the reverse
ordering for behavioural parity.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from .patterns import PLACEHOLDER_RE

# reference restoration_service.py:93-106
_DUP_LABELS = ("matrícula", "conta", "agência", "cpf", "rg")
_DUP_PATTERNS = [
    re.compile(rf"(\b{label}\b)\s+\1", re.IGNORECASE) for label in _DUP_LABELS
]


def restore_text(scrubbed: str, mappings: List[Dict[str, Any]]) -> str:
    """Replace every placeholder with its original value."""
    if not scrubbed or not mappings:
        return scrubbed or ""
    out = scrubbed
    for mp in sorted(mappings, key=lambda m: m.get("span_start", 0), reverse=True):
        ph = mp["placeholder"]
        if ph in out:
            out = out.replace(ph, mp["original_value"])
    return out


def cleanup_duplicate_labels(text: str) -> str:
    for pat in _DUP_PATTERNS:
        text = pat.sub(r"\1", text)
    return text


def has_residual_placeholders(text: str) -> bool:
    """True if any "[TYPE_n]" placeholder survives (integrity failure)."""
    return bool(PLACEHOLDER_RE.search(text or ""))
