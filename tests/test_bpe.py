"""Byte-level BPE tokenizer (core/bpe.py): frozen-vocab determinism,
no-OOV byte coverage, merge compression, and Spark pandas-UDF parity."""

from pii_filter_spark.core.bpe import (
    MAX_MERGES,
    bpe_token_count,
    bpe_token_counts_batch,
    merge_ranks,
)


def test_merge_table_is_frozen_and_deterministic():
    r1 = merge_ranks()
    assert 0 < len(r1) <= MAX_MERGES
    # retraining from the seed reproduces the identical table
    from pii_filter_spark.core.bpe import _SEED_CORPUS, _train_merges

    r2 = {p: i for i, p in enumerate(_train_merges(_SEED_CORPUS, MAX_MERGES))}
    assert r1 == r2


def test_no_oov_any_unicode_encodes():
    for s in ["καλημέρα", "快速管道", "emoji \U0001f600 ok", "a\x00b", "ñé"]:
        n = bpe_token_count(s)
        assert n >= 1
        # never more tokens than UTF-8 bytes (byte-level base vocab)
        assert n <= len(s.encode("utf-8")) + s.count(" ")


def test_common_words_compress_below_bytes():
    # seed-frequent analytics words must merge well below their byte count
    s = "the table scan filter query value stream window"
    assert bpe_token_count(s) < len(s.encode("utf-8")) / 2


def test_empty_and_null_handling():
    assert bpe_token_count("") == 0
    assert bpe_token_counts_batch(["a b", None, ""]) == [
        bpe_token_count("a b"),
        0,
        0,
    ]


def test_count_is_additive_over_pretokens():
    # pre-tokens are independent: count(a+b) with a space boundary equals
    # count(a) + count(" b") — the packing prefix sum relies on per-doc
    # counts being stable regardless of batch composition
    a, b = "scan filter", "window group"
    assert bpe_token_count(a + " " + b) == bpe_token_count(
        a
    ) + bpe_token_count(" " + b)


def test_spark_udf_matches_pure_function(spark):
    rows = [
        (1, "the quick data pipeline reads every table"),
        (2, "快速的数据管道"),
        (3, None),
        (4, "  "),
        (5, "xyzzy 12345 !!!"),
    ]
    from pii_filter_spark.operators.textstats import bpe_exact_counts

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_exact_counts(df).collect()}
    want = {d: bpe_token_count(t or "") for d, t in rows}
    assert got == want
