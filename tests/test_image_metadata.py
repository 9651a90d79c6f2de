"""PNG metadata extraction / PII scrub / strip — images/metadata.py and
operators/image_metadata.py."""

import struct
import zlib

import numpy as np
import pytest

from pii_filter_spark.images import decode_image
from pii_filter_spark.images.metadata import (
    add_text_chunk,
    count_ancillary,
    extract_text_metadata,
    strip_ancillary,
)
from pii_filter_spark.images.png_codec import _chunk, encode_png
from pii_filter_spark.operators.image_metadata import (
    inject_fixture_metadata,
    scrub_image_metadata,
    scrub_row,
)
from pii_filter_spark.sources.synth import build_input_table


def _png():
    rng = np.random.default_rng(7)
    return encode_png(rng.integers(0, 256, (16, 20, 3), dtype=np.uint8))


def _with_chunk_before_iend(data, tag, payload):
    iend = _chunk(b"IEND", b"")
    return data[: -len(iend)] + _chunk(tag, payload) + iend


def test_text_chunk_roundtrip_and_strip():
    data = add_text_chunk(_png(), "Author", "Maria, maria@example.com")
    fields = extract_text_metadata(data)
    assert fields == [("Author", "Maria, maria@example.com")]
    clean = strip_ancillary(data)
    assert extract_text_metadata(clean) == []
    assert count_ancillary(clean) == 0
    # pixel invariance: lossless container rewrite
    assert np.array_equal(decode_image(data), decode_image(clean))


def test_ztxt_itxt_exif_time_parsing():
    data = _png()
    data = _with_chunk_before_iend(
        data, b"zTXt", b"Comment\x00\x00" + zlib.compress(b"fone (11) 98765-4321")
    )
    data = _with_chunk_before_iend(
        data, b"iTXt", b"XML:com.adobe.xmp\x00\x00\x00pt\x00\x00<x>gps 1,2</x>"
    )
    data = _with_chunk_before_iend(
        data, b"eXIf", b"\x00\x01GPSLatitude 12.34\x00\xffbin"
    )
    data = _with_chunk_before_iend(
        data, b"tIME", struct.pack(">HBBBBB", 2024, 5, 6, 7, 8, 9)
    )
    fields = dict(extract_text_metadata(data))
    assert fields["Comment"] == "fone (11) 98765-4321"
    assert fields["XML:com.adobe.xmp"] == "<x>gps 1,2</x>"
    assert "GPSLatitude 12.34" in fields["exif"]
    assert fields["time"] == "2024-05-06 07:08:09"
    assert count_ancillary(data) == 4
    assert extract_text_metadata(strip_ancillary(data)) == []


def test_scrub_row_counts_pii_and_toxic():
    data = add_text_chunk(
        _png(), "Comment", "dono CPF 529.982.247-25, esse palhaço"
    )
    png, chunks, fields, pii, toxic, removed, md5 = scrub_row(data)
    assert (png, chunks, fields, pii, toxic) == (True, 1, 1, 1, 1)
    assert removed == len(data) - len(strip_ancillary(data)) > 0
    # non-PNG passthrough: untouched, zero counts
    row = scrub_row(b"JQD1 not a png")
    assert row[0] is False and row[5] == 0


def test_fixture_injection_non_png_passthrough():
    raw = b"\x00\x01\x02"
    assert inject_fixture_metadata(raw, 0) == raw
    with pytest.raises(ValueError):
        add_text_chunk(raw, "k", "v")


def test_operator_matches_pure_recompute(spark):
    from pii_filter_spark.sources.synth import gen_row

    df = build_input_table(spark, 40, seed=42, num_partitions=4)
    got = {
        r["image_id"]: tuple(r)[1:]
        for r in scrub_image_metadata(df).collect()
    }
    for i in range(40):
        r = gen_row(42, i)
        assert got[r["image_id"]] == scrub_row(bytes(r["bytes"]))
