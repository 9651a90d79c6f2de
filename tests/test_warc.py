"""WARC/WET container (sources/warc.py + operators/warc_ingest.py):
record framing, gzip-member layout, HTTP envelope stripping, malformed
tolerance, and the Spark explode stage."""

import pytest

from pii_filter_spark.sources.warc import (
    build_record,
    build_warc,
    extract_text_records,
    gunzip_members,
    http_response_block,
    iter_warc_records,
)

RECS = [
    ("conversion", "https://a.example/1", "plain wet text".encode(), "r1"),
    ("response", "https://a.example/2",
     http_response_block("<html>body &amp; soul</html>".encode()), "r2"),
    ("conversion", "https://a.example/3", "unicode café 快速".encode(), "r3"),
]


def test_roundtrip_plain():
    got = extract_text_records(build_warc(RECS))
    assert got == [
        ("conversion", "https://a.example/1", "plain wet text"),
        ("response", "https://a.example/2", "<html>body &amp; soul</html>"),
        ("conversion", "https://a.example/3", "unicode café 快速"),
    ]


def test_roundtrip_gzip_members():
    blob = build_warc(RECS, gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    assert extract_text_records(blob) == extract_text_records(build_warc(RECS))
    # members concatenate: decompressing yields the plain archive
    assert gunzip_members(blob) == build_warc(RECS)


def test_non_text_record_types_skipped():
    recs = [("warcinfo", "", b"software: test", "w1")] + RECS[:1]
    got = extract_text_records(build_warc(recs))
    assert len(got) == 1 and got[0][0] == "conversion"


def test_content_length_framing_survives_crlf_in_body():
    body = b"line1\r\n\r\nline2"  # contains the separator sequence
    blob = build_warc([("conversion", "u", body, "r")] + [RECS[0]])
    got = extract_text_records(blob)
    assert got[0][2] == "line1\r\n\r\nline2"
    assert len(got) == 2


def test_truncated_and_garbage_tails_do_not_raise():
    blob = build_warc(RECS)
    for bad in (blob[:-20], blob[: len(blob) // 2], blob + b"garbage",
                b"not a warc at all", b""):
        recs = extract_text_records(bad)
        assert isinstance(recs, list)
    # a clean prefix still yields its complete records
    first = build_record(*RECS[0][:1], RECS[0][1], RECS[0][2], RECS[0][3])
    assert len(extract_text_records(first + b"WARC/1.0\r\nbroken")) == 1


def test_header_parse_case_insensitive():
    rec = (b"WARC/1.0\r\nWarc-Type: conversion\r\n"
           b"WARC-TARGET-URI: u\r\ncontent-length: 2\r\n\r\nhi\r\n\r\n")
    assert extract_text_records(rec) == [("conversion", "u", "hi")]


def test_spark_stage_explodes_archives(spark):
    from pii_filter_spark.operators.warc_ingest import parse_warc_archives

    df = spark.createDataFrame(
        [("a0", build_warc(RECS)), ("a1", build_warc(RECS, gzip_members=True))],
        "archive_id string, data binary",
    )
    rows = sorted(
        (r["archive_id"], r["rec_idx"], r["warc_type"], r["url"], r["text"])
        for r in parse_warc_archives(df).collect()
    )
    assert len(rows) == 6
    assert rows[0] == ("a0", 0, "conversion", "https://a.example/1",
                       "plain wet text")
    assert [r[1] for r in rows[:3]] == [0, 1, 2]


def test_gunzip_members_tolerates_trailing_garbage():
    from pii_filter_spark.sources.warc import _gzip_member, gunzip_members

    good = _gzip_member(b"record one") + _gzip_member(b"record two")
    # non-gzip trailing bytes end the scan instead of raising zlib.error
    assert gunzip_members(good + b"\x00garbage\xff") == b"record onerecord two"
    assert gunzip_members(b"not gzip at all") == b""
