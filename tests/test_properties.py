"""Property-based tests (hypothesis) over the frozen core semantics.

These run pure-Python (no Spark session) so hypothesis can explore
thousands of inputs cheaply; the Spark stages are thin vectorized wrappers
around exactly these functions (asserted elsewhere), so properties proven
here transfer to the distributed plan.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pii_filter_spark.core.detect import scrub_text
from pii_filter_spark.core.quality import drop_reasons
from pii_filter_spark.core.restore import restore_text
from tests.oracle import reference_semantics as oracle

# text alphabet: portuguese letters, digits, pii punctuation, whitespace
_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "áéíóúâêôãõçÁÉÂÃ0123456789 .-@()/:\n,;")
    ),
    max_size=400,
)

_PII_SNIPPETS = st.sampled_from(
    [
        "CPF 529.982.247-25",            # valid checksum
        "CPF 123.456.789-01",            # plausible, invalid checksum
        "CPF 111.111.111-11",            # implausible — must NOT mask
        "email joao.silva@empresa.com.br",
        "telefone (11) 98765-4321",
        "CEP 01310-100",
        "RG 12.345.678-9",
    ]
)


@st.composite
def _pii_text(draw):
    prefix = draw(_TEXT)
    snippet = draw(_PII_SNIPPETS)
    suffix = draw(_TEXT)
    return f"{prefix} {snippet} {suffix}"


@settings(max_examples=300, deadline=None)
@given(_pii_text())
def test_scrub_restore_roundtrip(text):
    scrubbed, mappings = scrub_text(text)
    assert restore_text(scrubbed, mappings) == text


@settings(max_examples=300, deadline=None)
@given(_pii_text())
def test_scrub_matches_reference_oracle(text):
    """Engine scrub == independent reference-semantics reimplementation."""
    got_text, got_maps = scrub_text(text)
    exp_text, exp_maps = oracle.scrub(text)
    assert got_text == exp_text
    assert [
        (m["placeholder"], m["original_value"], m["type"]) for m in got_maps
    ] == [(m["placeholder"], m["original_value"], m["type"]) for m in exp_maps]


@settings(max_examples=200, deadline=None)
@given(_pii_text())
def test_scrub_preserves_placeholders_on_rescrub(text):
    """Scrubbing an already-scrubbed text must not destroy placeholders
    (the reference's placeholder-avoidance contract, F7)."""
    scrubbed, mappings = scrub_text(text)
    again, more = scrub_text(scrubbed)
    for m in mappings:
        assert m["placeholder"] in again
    for m in more:  # any new finds must not be placeholder fragments
        assert "[" not in m["original_value"] and "]" not in m["original_value"]


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_quality_rules_match_oracle(text):
    assert drop_reasons(text) == oracle.quality_drop_reasons(text)


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), _TEXT))
def test_drop_reasons_deterministic_and_ordered(text):
    from pii_filter_spark.core.quality import RULE_ORDER

    r1 = drop_reasons(text, "pt", 1.0)
    r2 = drop_reasons(text, "pt", 1.0)
    assert r1 == r2
    order = {name: i for i, name in enumerate(RULE_ORDER)}
    assert all(order[a] < order[b] for a, b in zip(r1, r1[1:]))


# --- NOME fast-path equivalence under adversarial inputs --------------------

_CAP_WORDS = st.sampled_from(
    ["Maria", "Bruno", "Silva", "Souza", "Empresa", "Rua", "Anamaria",
     "Anastácia", "Mariana", "X", "São", "D'Ávila", "Vila-Nova", "MARIA",
     "Ana"]
)
_FILLERS = st.sampled_from(
    ["da", "de", "dos", "e", "o", "contrato", "em", "para", "123",
     "maria", "ana.", ",", ".", "-", "  ", "\n"]
)


@st.composite
def _cap_text(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    parts = []
    for _ in range(n):
        parts.append(draw(st.one_of(_CAP_WORDS, _FILLERS)))
    return " ".join(parts)


@settings(max_examples=500, deadline=None)
@given(_cap_text())
def test_nome_fast_path_property(text):
    from pii_filter_spark.core.ner_dictionary import GRAMMARS, _find_names_fast

    pat = next(p for t, p in GRAMMARS if t == "NOME_COMPLETO")
    slow = [(m.start(), m.end()) for m in pat.finditer(text)]
    assert _find_names_fast(text) == slow, text
