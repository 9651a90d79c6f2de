"""Line-level cleaning (operators/line_clean.py): each rule, the doc
drop threshold, NULL/empty handling, and Spark/twin parity."""

from pii_filter_spark.operators.line_clean import (
    _line_removed_py,
    line_clean,
    line_clean_rows,
)


def test_rules_pure():
    assert _line_removed_py("1234 likes")
    assert _line_removed_py("7 view")
    assert _line_removed_py("42 17, 99%")
    assert _line_removed_py("HOME ABOUT CONTACT US")
    assert _line_removed_py("leia mais")          # 2-word fragment
    assert not _line_removed_py("Leia mais.")     # terminal punctuation
    assert not _line_removed_py("a normal sentence with several words")
    assert not _line_removed_py("HOME about contact")  # mixed case kept
    assert not _line_removed_py("version 2 of 3 was released today")


def test_doc_drop_threshold():
    # junk is ~58% of chars -> doc dropped
    rows = line_clean_rows([(1, "short body here\n1234 likes\nHOME ABOUT US")])
    d, nl, nr, frac, keep, clean = rows[0]
    assert (nl, nr) == (3, 2)
    assert not keep and clean == "short body here"
    # big clean body -> junk below 5% -> doc kept
    body = "palavras " * 40 + "fim."
    rows = line_clean_rows([(2, body + "\n42")])
    assert rows[0][4] is True or rows[0][4]


def test_spark_matches_twin(spark):
    from pii_filter_spark.oracle_support import _round_like_spark

    docs = [
        (1, "corpo normal com muitas palavras uteis aqui mesmo."),
        (2, "short body\n1234 likes\nHOME ABOUT CONTACT US"),
        (3, ""),
        (4, None),
        (5, "linha um boa e longa o bastante\n99 views\nleia mais\nfim da pagina util."),
    ]
    got = {
        r.doc_id: (
            r.n_lines, r.n_removed, r.removed_frac, r.doc_keep, r.text_clean
        )
        for r in line_clean(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    want = {
        d: (nl, nr, _round_like_spark(frac), keep, clean)
        for d, nl, nr, frac, keep, clean in line_clean_rows(
            [(d, t) for d, t in docs]
        )
    }
    assert got == want
