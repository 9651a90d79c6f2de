"""Canonical-form normalization of detected PII values.

Parity with the reference normalizer (/root/reference/src/utils/normalizers.py:6-31):
document numbers and phones collapse to digits, e-mail lowercases,
CEP reformats to XXXXX-XXX, everything else passes through.
"""

from __future__ import annotations

from .validators import digits_only

_DIGIT_TYPES = frozenset({"CPF", "CNPJ", "RG", "PIS", "TELEFONE"})


def normalize_pii_value(pii_type: str, value: str) -> str:
    if pii_type in _DIGIT_TYPES:
        return digits_only(value)
    if pii_type == "EMAIL":
        return value.lower()
    if pii_type == "CEP":
        d = digits_only(value)
        return f"{d[:5]}-{d[5:]}"
    return value
