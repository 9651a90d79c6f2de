"""Engine-vs-oracle agreement on detection/scrub semantics + golden cases.

The engine (pii_filter_spark.core.detect, fused single pass) and the oracle
(tests.oracle.reference_semantics, staged like the reference) are disjoint
implementations; byte-equality here is the two-implementation correctness
check demanded by FIXTURES.md B3.
"""

import pytest

from pii_filter_spark.core.detect import scrub_text
from pii_filter_spark.core.restore import (
    cleanup_duplicate_labels,
    has_residual_placeholders,
    restore_text,
)
from pii_filter_spark.sources.synth import gen_pandas
from tests.oracle import reference_semantics as oracle

GOLDEN = [
    # (caption, expected scrubbed)
    (
        "Funcionário João da Silva, CPF 123.456.789-01, mora na Rua das Flores.",
        "Funcionário [NOME_COMPLETO_1], CPF [CPF_1], mora na [LOCAL_1].",
    ),
    (
        "Contato: maria.souza@empresa.com.br ou (11) 98765-4321.",
        "Contato: [EMAIL_1] ou [TELEFONE_1].",
    ),
    # all-same-digit CPF is implausible -> NOT masked (validators.py:21-26)
    (
        "Cartaz com CPF 111.111.111-11 de exemplo para treino demonstrativo.",
        "Cartaz com CPF 111.111.111-11 de exemplo para treino demonstrativo.",
    ),
    # left-to-right per-type numbering across two CPFs
    (
        "CPFs 123.456.789-01 e 987.654.321-09 constam no arquivo.",
        "CPFs [CPF_1] e [CPF_2] constam no arquivo.",
    ),
    # toxic word scrub
    (
        "seu idiota, o relatório está atrasado",
        "seu [TOXICO_1], o relatório está atrasado",
    ),
    # FP bait must not mask: "Bom dia", "RH", bare "CPF" word
    (
        "Bom dia RH, seguem os documentos sem CPF anexado.",
        "Bom dia RH, seguem os documentos sem CPF anexado.",
    ),
    # bare 11 digits: CPF and TELEFONE patterns overlap; CPF priority wins
    (
        "Documento registrado sob numeração 12345678901 ontem.",
        "Documento registrado sob numeração [CPF_1] ontem.",
    ),
]


@pytest.mark.parametrize("caption,expected", GOLDEN)
def test_golden_scrub(caption, expected):
    scrubbed, _ = scrub_text(caption)
    assert scrubbed == expected


@pytest.mark.parametrize("caption,expected", GOLDEN)
def test_oracle_agrees_on_golden(caption, expected):
    scrubbed, _ = oracle.scrub(caption)
    assert scrubbed == expected


def test_engine_matches_oracle_on_corpus():
    captions = gen_pandas(500, seed=7).caption.tolist()
    mismatches = 0
    for c in captions:
        got_text, got_maps = scrub_text(c)
        exp_text, exp_maps = oracle.scrub(c)
        if got_text != exp_text or got_maps != exp_maps:
            mismatches += 1
    assert mismatches == 0


def test_mapping_spans_are_original_offsets():
    caption = "CPF 123.456.789-01 e email a@b.com citados."
    _, maps = scrub_text(caption)
    for m in maps:
        assert caption[m["span_start"]:m["span_end"]] == m["original_value"]


def test_roundtrip_restore_identity():
    captions = gen_pandas(300, seed=11).caption.tolist()
    for c in captions:
        scrubbed, maps = scrub_text(c)
        restored = restore_text(scrubbed, maps)
        assert restored == c
        assert not has_residual_placeholders(restored)


def test_cleanup_duplicate_labels():
    assert cleanup_duplicate_labels("o CPF cpf 123") == "o CPF 123"
    assert cleanup_duplicate_labels("conta   conta 55") == "conta 55"
    assert cleanup_duplicate_labels("matrícula diferente") == "matrícula diferente"


def test_nome_fast_path_equals_alternation_regex():
    """_find_names_fast must produce exactly the spans of the original
    ~400-way NOME alternation pattern, on real reference texts and on the
    synthetic caption corpus."""
    import json
    import os

    from pii_filter_spark.core.ner_dictionary import (
        GRAMMARS,
        _find_names_fast,
    )
    from pii_filter_spark.sources.synth import gen_pandas

    nome_pats = [p for t, p in GRAMMARS if t == "NOME_COMPLETO"]
    assert len(nome_pats) == 1
    pat = nome_pats[0]

    texts = list(gen_pandas(300, seed=77)["caption"])
    if os.path.exists("/root/reference/dataset.json"):
        texts += [
            c["prompt_text"] for c in json.load(open("/root/reference/dataset.json"))
        ]
    checked = 0
    for text in texts:
        slow = [(m.start(), m.end()) for m in pat.finditer(text)]
        fast = _find_names_fast(text)
        assert fast == slow, (text, fast, slow)
        checked += len(slow)
    assert checked > 300  # the corpora really exercise the name grammar


def test_trigger_gates_are_necessary_conditions():
    """Whenever the CARGO/LOCAL trigger gate skips a pattern group, the
    skipped patterns must genuinely have no matches in that text."""
    import json
    import os

    from pii_filter_spark.core.ner_dictionary import (
        GRAMMARS,
        _CARGO_TRIGGERS,
        _LOCAL_TRIGGERS,
        _WORD_SPLIT_RE,
    )
    from pii_filter_spark.sources.synth import gen_pandas

    texts = list(gen_pandas(300, seed=55)["caption"])
    if os.path.exists("/root/reference/dataset.json"):
        texts += [
            c["prompt_text"] for c in json.load(open("/root/reference/dataset.json"))
        ]
    skipped_checked = 0
    for text in texts:
        words = frozenset(w.lower() for w in _WORD_SPLIT_RE.findall(text))
        skips = []
        if words.isdisjoint(_CARGO_TRIGGERS):
            skips.append("CARGO")
        if words.isdisjoint(_LOCAL_TRIGGERS):
            skips.append("LOCAL")
        for ent_type, pattern in GRAMMARS:
            if ent_type in skips:
                assert not pattern.search(text), (ent_type, text)
                skipped_checked += 1
    assert skipped_checked > 100  # the gate actually fires on these corpora
