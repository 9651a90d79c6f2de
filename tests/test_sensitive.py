"""Sensitive-topic stage (reference F10: 19-category LLM stage, made
deterministic in core/sensitive.py) — unit semantics + precedence."""

import json
import os

import pytest

from pii_filter_spark.core.detect import detect_all, scrub_text
from pii_filter_spark.core.sensitive import (
    SENSITIVE_CATEGORIES,
    find_sensitive,
)

DATASET = "/root/reference/dataset.json"


def test_categories_match_reference_constant():
    # parity with /root/reference/src/core/constants.py:29-49
    assert len(SENSITIVE_CATEGORIES) == 19
    assert SENSITIVE_CATEGORIES[0] == "CONDICAO_DE_SAUDE"
    assert SENSITIVE_CATEGORIES[-1] == "CONTA_BANCARIA"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Salário de R$ 12.345,00 mensais.", [("SALARIO", "R$ 12.345,00")]),
        ("IP da máquina: 10.0.20.15.", [("IP_ADDRESS", "10.0.20.15")]),
        ("Agência 1234, Conta 56789-0.",
         [("AGENCIA_BANCARIA", "1234"), ("CONTA_BANCARIA", "56789-0")]),
        ("matrícula antiga 5050-P", [("MATRICULA", "5050-P")]),
        ("usuário de rede r.silva", [("USUARIO_REDE", "r.silva")]),
        ("nascido em 15/05/1985", [("DATA_NASCIMENTO", "15/05/1985")]),
        # adjacent same-category hits merge into one fragment, mirroring
        # the reference LLM's whole-fragment extraction (dataset.json
        # labels "diagnosticada com Burnout grave…" as ONE span)
        ("diagnosticada com Burnout",
         [("CONDICAO_DE_SAUDE", "diagnosticada com Burnout")]),
        ("dores na lombar (CID M54.5)", [("CONDICAO_DE_SAUDE", "CID M54.5")]),
        ("há uma suspensão anterior por uso indevido de recursos",
         [("HISTORICO_DISCIPLINAR",
           "suspensão anterior por uso indevido de recursos")]),
        ("processo de divórcio litigioso",
         [("PROBLEMA_PESSOAL_FAMILIAR", "processo de divórcio litigioso")]),
        ("do departamento de Inovação Digital",
         [("DEPARTAMENTO", "Inovação Digital")]),
        ("texto sem nada de especial aqui", []),
    ],
)
def test_find_sensitive_cases(text, expected):
    got = [(d["type"], d["value"]) for d in find_sensitive(text)]
    assert got == expected


def test_spans_are_original_offsets():
    t = "A conta 99887-1 do colaborador."
    (d,) = find_sensitive(t)
    assert t[d["start"]:d["end"]] == d["value"] == "99887-1"


def test_precedence_regex_beats_sensitive():
    # an amount inside an EMAIL local part can't happen, so use IP vs CEP-free
    # text: the CPF is regex-stage; the sensitive amount elsewhere survives.
    t = "CPF 123.456.789-01 e salário de R$ 9.000,00."
    dets = detect_all(t)
    types = [d["type"] for d in dets]
    assert types == ["CPF", "SALARIO"]
    scrubbed, maps = scrub_text(t)
    assert scrubbed == "CPF [CPF_1] e salário de [SALARIO_1]."


def test_sensitive_dropped_on_overlap_with_ner():
    # "Banco do Brasil, Agência 1234": ORG (NER) and AGENCIA don't overlap,
    # but craft an overlap: MATRICULA value inside an ORG span can't occur;
    # instead verify the drop rule directly with a CARGO overlap.
    t = "A Diretora Comercial recebeu salário de R$ 5.000,00."
    dets = detect_all(t)
    # CARGO from NER survives; SALARIO from sensitive stage survives
    # (no overlap) — and no sensitive detection may overlap any other.
    spans = [(d["start"], d["end"]) for d in dets]
    for i, (s1, e1) in enumerate(spans):
        for s2, e2 in spans[i + 1:]:
            assert not (s1 < e2 and e1 > s2), dets


def test_scrub_numbering_left_to_right_per_category():
    t = "Conta 11111-1 primeiro, depois conta 22222-2."
    scrubbed, maps = scrub_text(t)
    assert scrubbed == "Conta [CONTA_BANCARIA_1] primeiro, depois conta [CONTA_BANCARIA_2]."
    assert [m["placeholder"] for m in maps] == [
        "[CONTA_BANCARIA_1]", "[CONTA_BANCARIA_2]"
    ]


@pytest.mark.skipif(not os.path.exists(DATASET), reason="reference dataset absent")
def test_sensitive_stage_f1_on_reference_dataset():
    """Ablation vs the reference's own labels for the 13 deterministic
    sensitive categories (the other 6 — CARGO, ENDERECO_*, NOME_BANCO —
    are owned by the NER stage). Round-3 measured P=0.961 R=0.986
    F1=0.973 (round 2: 0.899) after fragment merging + the
    SALARIO/INF_FIN anchor separation; the reference's own full LLM
    pipeline claims ~0.60 (README.md:140). Pinned with a safety margin."""
    SENS = {
        "CONDICAO_DE_SAUDE", "INFORMACAO_FINANCEIRA_DETALHADA",
        "HISTORICO_DISCIPLINAR", "PROBLEMA_PESSOAL_FAMILIAR",
        "USUARIO_REDE", "IP_ADDRESS", "REGISTRO_PONTO", "DEPARTAMENTO",
        "MATRICULA", "SALARIO", "AGENCIA_BANCARIA", "DATA_NASCIMENTO",
        "CONTA_BANCARIA",
    }
    cases = json.load(open(DATASET))
    TP = FP = FN = 0
    for case in cases:
        text = case["prompt_text"]
        golden = [
            (g["pii_type"], g["span"][0], g["span"][1])
            for g in case["ground_truth"]
            if g["pii_type"] in SENS
        ]
        det = [
            (h["type"], h["start"], h["end"])
            for h in detect_all(text)
            if h["type"] in SENS
        ]
        for t, s, e in golden:
            hit = None
            for i, d in enumerate(det):
                if d[0] == t and d[1] < e and d[2] > s:
                    hit = i
                    break
            if hit is None:
                FN += 1
            else:
                TP += 1
                det.pop(hit)
        FP += len(det)
    precision = TP / (TP + FP)
    recall = TP / (TP + FN)
    f1 = 2 * precision * recall / (precision + recall)
    assert TP + FN > 1200  # the filtered oracle really is ~1239 spans
    assert precision >= 0.95, (TP, FP, FN)
    assert recall >= 0.97, (TP, FP, FN)
    assert f1 >= 0.96, (TP, FP, FN, f1)
