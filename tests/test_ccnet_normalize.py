"""CCNet dedup-key normalization (Wenzek et al. 2020 §4.1)."""

from pii_filter_spark.operators.ccnet_normalize import (
    ACCENT_DST,
    ACCENT_SRC,
    PUNCT_DST,
    PUNCT_SRC,
    ccnet_normalize,
    normalize_digest,
    normalize_text,
)

CASES = [
    ("Página 3 de 12", "pagina 0 de 00"),
    ("“Olá, Mundo”…", '"ola, mundo"...'),
    ("naïve — CAFÉ", "naive - cafe"),
    ("A​BC", "abc"),
    ("  tabs\tand\nnewlines  ", "tabs and newlines"),
    ("", ""),
    (None, ""),
    ("ÀÉÎÕÜ ñ Ç ß", "aeiou n c ß"),  # ß untouched: not in the frozen table
    ("It’s 42°—really?", "it's 00°-really?"),
]


def test_frozen_tables_aligned():
    assert len(ACCENT_SRC) == len(ACCENT_DST)
    assert len(PUNCT_SRC) == len(PUNCT_DST)
    assert len(set(ACCENT_SRC)) == len(ACCENT_SRC)
    assert len(set(PUNCT_SRC)) == len(PUNCT_SRC)


def test_twin_cases():
    for raw, want in CASES:
        assert normalize_text(raw) == want, raw


def test_boilerplate_counters_collide():
    # The CCNet motivation: page counters differing only by digits get
    # the SAME dedup key, while genuinely different text does not.
    assert normalize_digest("Page 3 of 12") == normalize_digest("Page 7 of 98")
    assert normalize_digest("“quoted”") == normalize_digest('"quoted"')
    assert normalize_digest("alpha") != normalize_digest("beta")


def test_spark_matches_twin(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["norm_text"], r["norm_digest"])
           for r in ccnet_normalize(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == (want, normalize_digest(raw)), raw
