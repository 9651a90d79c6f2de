"""JPEG EXIF/COM metadata walker (images/jpeg_metadata.py): marker
walking, TIFF IFD parsing (both endiannesses), GPS detection, lossless
strip (pixel bit-identity through the real codec), fixture injection,
and the Spark stage."""

import struct

import numpy as np
import pytest

from pii_filter_spark.images.jpeg_codec import decode_jpeg, encode_jpeg
from pii_filter_spark.images.jpeg_metadata import (
    add_comment,
    build_exif_app1,
    count_meta_segments,
    extract_jpeg_text_metadata,
    has_gps,
    is_jpeg,
    iter_segments,
    strip_jpeg_metadata,
)


@pytest.fixture(scope="module")
def jpeg_bytes():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    return encode_jpeg(img, quality=70)


def _with_meta(jpeg_bytes):
    app1 = build_exif_app1(
        {"Artist": "Maria Souza maria@ex.com", "Software": "fw 9.1"},
        gps=(-23.5505, -46.6333),
    )
    return add_comment(jpeg_bytes[:2] + app1 + jpeg_bytes[2:], "tel 1234")


def test_extracts_exif_ascii_tags_and_com(jpeg_bytes):
    fields = dict(extract_jpeg_text_metadata(_with_meta(jpeg_bytes)))
    assert fields["Artist"] == "Maria Souza maria@ex.com"
    assert fields["Software"] == "fw 9.1"
    assert fields["COM"] == "tel 1234"


def test_gps_subifd_detected(jpeg_bytes):
    assert has_gps(_with_meta(jpeg_bytes))
    assert not has_gps(jpeg_bytes)
    no_gps = jpeg_bytes[:2] + build_exif_app1({"Make": "ACME"}) + jpeg_bytes[2:]
    assert not has_gps(no_gps)


def test_strip_is_lossless_and_exact(jpeg_bytes):
    meta = _with_meta(jpeg_bytes)
    clean = strip_jpeg_metadata(meta)
    # the strip reproduces the original encoder output byte-for-byte
    assert clean == jpeg_bytes
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(jpeg_bytes))
    assert extract_jpeg_text_metadata(clean) == []
    assert count_meta_segments(meta) == 2
    assert count_meta_segments(clean) == 0


def test_big_endian_tiff_parses():
    # hand-built MM (big-endian) EXIF: one Artist tag, inline-4 "Bob\0"
    tiff = (
        b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0x013B, 2, 4) + b"Bob\x00"
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    data = b"\xff\xd8" + app1 + b"\xff\xd9"
    assert extract_jpeg_text_metadata(data) == [("Artist", "Bob")]
    assert not has_gps(data)


def test_malformed_inputs_never_raise(jpeg_bytes):
    meta = _with_meta(jpeg_bytes)
    for bad in (b"", b"\xff", meta[:3], meta[:17], meta[:40],
                b"\x89PNG not a jpeg", meta[:100] + b"\xff"):
        extract_jpeg_text_metadata(bad)
        has_gps(bad)
        out = strip_jpeg_metadata(bad)
        if not is_jpeg(bad):
            assert out == bad


def test_segment_walk_stops_at_sos(jpeg_bytes):
    markers = [m for m, _, _ in iter_segments(jpeg_bytes)]
    assert markers[-1] == 0xDA
    assert 0xDA not in markers[:-1]


def test_fixture_injection_variants_scrub_to_same_clean_file(jpeg_bytes):
    from pii_filter_spark.operators.image_metadata import (
        inject_jpeg_fixture_metadata,
        scrub_jpeg_row,
    )

    md5s = set()
    for i in range(5):
        row = scrub_jpeg_row(inject_jpeg_fixture_metadata(jpeg_bytes, i))
        md5s.add(row[-1])
    assert len(md5s) == 1  # every variant strips back to the same file
    gps_row = scrub_jpeg_row(inject_jpeg_fixture_metadata(jpeg_bytes, 0))
    assert gps_row[5] is True and gps_row[3] >= 1  # GPS + PII in Artist
    cpf_row = scrub_jpeg_row(inject_jpeg_fixture_metadata(jpeg_bytes, 1))
    assert cpf_row[3] >= 1 and cpf_row[4] >= 1  # CPF pii + toxic word


def test_spark_stage_matches_pure_rows(spark, jpeg_bytes):
    from pii_filter_spark.operators.image_metadata import (
        inject_jpeg_fixture_metadata,
        scrub_jpeg_metadata,
        scrub_jpeg_row,
    )

    rows = [(f"img{i}", inject_jpeg_fixture_metadata(jpeg_bytes, i))
            for i in range(10)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: tuple(r)[1:]
           for r in scrub_jpeg_metadata(df).collect()}
    for img_id, data in rows:
        assert got[img_id] == scrub_jpeg_row(bytes(data))
