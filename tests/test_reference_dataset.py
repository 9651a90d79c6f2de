"""Parity against the reference's OWN golden dataset.

/root/reference/dataset.json: 500 annotated cases, 4,560 PII spans. The
reference's regex-stage ablation (tests/unit/test_regex_service.py:48-149)
filters the oracle to the regex-covered types and scores greedy
span-overlap P/R/F1 (test_utils.py:59-145). Reproducing that measurement
with OUR detector against THEIR labels is the strongest parity evidence
available in this sandbox — and clears the BASELINE F1≥0.99 bar on real
reference data (measured 0.994: TP=1076 FP=8 FN=5; the FNs are
checksum-implausible CPFs our validator — like theirs — refuses, plus
out-of-pattern phone forms).

No Spark needed: the Spark scrub stage is a vectorized wrapper over
exactly these core functions (parity asserted in test_spark_stages.py).
"""

import json
import os

import pytest

from pii_filter_spark.core.detect import (
    find_regex_matches,
    resolve_regex_overlaps,
    validate_pii,
)
from pii_filter_spark.operators.evaluation import greedy_span_match

DATASET = "/root/reference/dataset.json"
REGEX_TYPES = {"CPF", "RG", "EMAIL", "TELEFONE", "CEP"}


@pytest.mark.skipif(not os.path.exists(DATASET), reason="reference dataset absent")
def test_regex_stage_f1_on_reference_dataset():
    cases = json.load(open(DATASET))
    assert len(cases) == 500
    TP = FP = FN = 0
    for case in cases:
        text = case["prompt_text"]
        golden = [
            (g["pii_type"], g["span"][0], g["span"][1])
            for g in case["ground_truth"]
            if g["pii_type"] in REGEX_TYPES
        ]
        hits = [
            h for h in find_regex_matches(text) if validate_pii(h["type"], h["value"])
        ]
        hits = resolve_regex_overlaps(hits)
        dets = [(h["type"], h["start"], h["end"]) for h in hits]
        tp, fp, fn = greedy_span_match(dets, golden)
        TP, FP, FN = TP + tp, FP + fp, FN + fn

    precision = TP / (TP + FP)
    recall = TP / (TP + FN)
    f1 = 2 * precision * recall / (precision + recall)
    assert TP + FN > 1000  # the filtered oracle really is ~1081 spans
    assert precision >= 0.99, (TP, FP, FN)
    assert recall >= 0.99, (TP, FP, FN)
    assert f1 >= 0.99, (TP, FP, FN, f1)


@pytest.mark.skipif(not os.path.exists(DATASET), reason="reference dataset absent")
def test_dictionary_ner_f1_on_reference_dataset():
    """Dictionary-backed NER stage vs the reference's own labels for the
    3 evaluable entity types. The reference's README claims ~0.60 F1 for
    its full statistical pipeline (README.md:140); the deterministic
    dictionary stage measured 0.91 on the same data in round 1 and 0.976
    after the round-2 recall work (given-name/brand-org/cargo vocabulary
    + single-token CARGO context guard) — pinned at a safety margin so
    vocabulary regressions fail loudly."""
    from pii_filter_spark.core.detect import detect_all

    NER_TYPES = {"NOME_COMPLETO", "CARGO", "ORGANIZACAO"}
    cases = json.load(open(DATASET))
    TP = FP = FN = 0
    for case in cases:
        text = case["prompt_text"]
        golden = [
            (g["pii_type"], g["span"][0], g["span"][1])
            for g in case["ground_truth"]
            if g["pii_type"] in NER_TYPES
        ]
        dets = [
            (h["type"], h["start"], h["end"])
            for h in detect_all(text)
            if h["type"] in NER_TYPES
        ]
        tp, fp, fn = greedy_span_match(dets, golden)
        TP, FP, FN = TP + tp, FP + fp, FN + fn
    precision = TP / (TP + FP)
    recall = TP / (TP + FN)
    f1 = 2 * precision * recall / (precision + recall)
    assert precision >= 0.95, (TP, FP, FN)
    assert recall >= 0.97, (TP, FP, FN)
    assert f1 >= 0.96, (TP, FP, FN, f1)


@pytest.mark.skipif(not os.path.exists(DATASET), reason="reference dataset absent")
def test_ner_with_addresses_f1_on_reference_dataset():
    """Address-inclusive protocol: the reference maps spaCy LOC → LOCAL
    while its golden labels use ENDERECO_{LOGRADOURO,CIDADE,BAIRRO};
    relabel those to LOCAL and score all 4 NER types. Measured 0.914
    round 1, 0.948 round 2 (remaining tail: the golden set nests
    ENDERECO_BAIRRO spans INSIDE logradouro spans — 1:1 matching of
    nested golden spans needs overlapping detections, which the
    longest-match scrub semantics forbid by design)."""
    from pii_filter_spark.core.detect import detect_all

    ADDR = {"ENDERECO_LOGRADOURO", "ENDERECO_CIDADE", "ENDERECO_BAIRRO"}
    TYPES = {"NOME_COMPLETO", "CARGO", "ORGANIZACAO", "LOCAL"}
    cases = json.load(open(DATASET))
    TP = FP = FN = 0
    for case in cases:
        text = case["prompt_text"]
        golden = []
        for g in case["ground_truth"]:
            t = "LOCAL" if g["pii_type"] in ADDR else g["pii_type"]
            if t in TYPES:
                golden.append((t, g["span"][0], g["span"][1]))
        dets = [
            (h["type"], h["start"], h["end"])
            for h in detect_all(text)
            if h["type"] in TYPES
        ]
        tp, fp, fn = greedy_span_match(dets, golden)
        TP, FP, FN = TP + tp, FP + fp, FN + fn
    precision = TP / (TP + FP)
    recall = TP / (TP + FN)
    f1 = 2 * precision * recall / (precision + recall)
    assert precision >= 0.93, (TP, FP, FN)
    assert f1 >= 0.93, (TP, FP, FN, f1)
