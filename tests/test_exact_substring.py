"""Unit tests for exact-substring dedup (Lee et al. 2022 §4,
operators/exact_substring.py): global first-occurrence keep, overlap
union, short-doc passthrough, intra-doc repeats, and Spark/twin parity
on adversarial whitespace.
"""

import pytest

from pii_filter_spark.operators.exact_substring import (
    exact_substring_dedup,
    exact_substring_dedup_rows,
)


def _collect(df):
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in df.collect()
    }


def test_first_occurrence_survives_globally(spark):
    tail = "a b c d e"
    rows = [(1, "uniq1 " + tail), (2, "uniq2 " + tail), (3, "uniq3 " + tail)]
    out = _collect(
        exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), span_tokens=5
        )
    )
    assert out[1] == (6, 0, "uniq1 a b c d e")
    assert out[2] == (6, 5, "uniq2")
    assert out[3] == (6, 5, "uniq3")


def test_short_docs_pass_through(spark):
    rows = [(1, ""), (2, "   "), (3, "only four tokens here")]
    out = _collect(
        exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), span_tokens=5
        )
    )
    assert out[1] == (0, 0, "")
    assert out[2] == (0, 0, "")
    assert out[3] == (4, 0, "only four tokens here")


def test_overlapping_removals_union(spark):
    # doc 2 repeats doc 1's tokens 0..5: spans (0..4) and (1..5) are both
    # duplicates; their union removes all six tokens.
    rows = [(1, "p q r s t u"), (2, "p q r s t u own tail")]
    out = _collect(
        exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), span_tokens=5
        )
    )
    assert out[1] == (6, 0, "p q r s t u")
    assert out[2] == (8, 6, "own tail")


def test_intra_document_repeat_removed(spark):
    rows = [(1, "x y z w v mid x y z w v")]
    out = _collect(
        exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), span_tokens=5
        )
    )
    assert out[1] == (11, 5, "x y z w v mid")


def test_span_tokens_validation(spark):
    df = None  # never reached
    with pytest.raises(ValueError):
        exact_substring_dedup(df, span_tokens=1)


def test_spark_matches_python_twin_on_messy_whitespace(spark):
    rows = [
        (1, "  alpha\tbeta\n gamma delta epsilon zeta  "),
        (2, "alpha beta gamma delta epsilon zeta extra"),
        (3, "unrelated words entirely different content here"),
        (4, None),
        (5, "alpha beta gamma delta epsilon"),  # exactly span length
    ]
    span = 5
    got = _collect(
        exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), span_tokens=span
        )
    )
    want = {
        d: (n, r, t)
        for d, n, r, t in exact_substring_dedup_rows(rows, span)
    }
    assert got == want
    # the normalized doc-1 span dominates doc 2's prefix and doc 5
    assert got[2][1] == 6
    assert got[5] == (5, 5, "")
