"""JPEG metadata walker: EXIF/COM extraction, GPS detection, and a
lossless metadata strip — the "TIFF/EXIF segment walker" seam that
images/metadata.py (PNG chunks) documents for the JPEG container.

Formats are all public specs: the JPEG marker-segment layout (ITU T.81
Annex B), the TIFF 6.0 IFD structure, and the EXIF 2.3 tag ids. Camera
JPEGs routinely carry PII here — Artist/Copyright names, serials in
Software/Model, timestamps, and most critically a GPS sub-IFD with the
capture location.

The strip rewrites the file keeping every decode-bearing segment
(DQT/SOF/DHT/DRI/SOS and the entropy-coded scan) byte-for-byte and
dropping only APP1 (EXIF+XMP), APP13 (IPTC) and COM — so decoded pixels
are bit-identical BY CONSTRUCTION (the north rule's PSNR invariant
holds at infinity); tests verify by decoding both through the real
codec. All functions are pure bytes->facts/bytes and tolerant of
malformed input (truncation degrades to "no metadata", never raises),
so the Spark mapInPandas stage and the DuckDB fixture oracle share them
verbatim.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
COM = 0xFE
APP0 = 0xE0
APP1 = 0xE1
APP13 = 0xED

# markers with no length field (ITU T.81 B.1.1.3)
_STANDALONE = {0x01} | set(range(0xD0, 0xDA))  # TEM, RSTn, SOI, EOI

# segments dropped by the scrub: EXIF/XMP, IPTC, free-text comments
STRIP_MARKERS = frozenset({APP1, APP13, COM})

# EXIF IFD0 ASCII tags worth extracting (EXIF 2.3 / TIFF 6.0)
_TIFF_ASCII_TAGS = {
    0x010E: "ImageDescription",
    0x010F: "Make",
    0x0110: "Model",
    0x0131: "Software",
    0x0132: "DateTime",
    0x013B: "Artist",
    0x8298: "Copyright",
}
GPS_IFD_TAG = 0x8825

_T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 2, 3, 4, 5


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"\xff\xd8"


def iter_segments(data: bytes) -> Iterator[Tuple[int, int, int]]:
    """(marker, start, end) for each header segment from just past SOI
    up to and INCLUDING the SOS header; data[sos_end:] is the
    entropy-coded tail. Stops silently on malformed structure."""
    n = len(data)
    i = 2
    while i + 1 < n:
        if data[i] != 0xFF:
            return
        m = data[i + 1]
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if m in _STANDALONE:
            yield (m, i, i + 2)
            i += 2
            continue
        if i + 4 > n:
            return
        length = struct.unpack(">H", data[i + 2 : i + 4])[0]
        end = i + 2 + length
        if length < 2 or end > n:
            return
        yield (m, i, end)
        if m == SOS:
            return
        i = end


def _tiff_u16(b: bytes, off: int, le: bool) -> int:
    return struct.unpack("<H" if le else ">H", b[off : off + 2])[0]


def _tiff_u32(b: bytes, off: int, le: bool) -> int:
    return struct.unpack("<I" if le else ">I", b[off : off + 4])[0]


def _parse_ifd(
    tiff: bytes, ifd_off: int, le: bool
) -> List[Tuple[int, int, int, int]]:
    """IFD entries as (tag, type, count, value_or_offset_field_pos);
    bounds-checked, [] on malformed."""
    if ifd_off + 2 > len(tiff):
        return []
    n = _tiff_u16(tiff, ifd_off, le)
    out = []
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(tiff):
            break
        out.append(
            (
                _tiff_u16(tiff, e, le),
                _tiff_u16(tiff, e + 2, le),
                _tiff_u32(tiff, e + 4, le),
                e + 8,
            )
        )
    return out


def _ascii_value(tiff: bytes, count: int, vpos: int, le: bool) -> Optional[str]:
    if count <= 4:
        raw = tiff[vpos : vpos + count]
    else:
        off = _tiff_u32(tiff, vpos, le)
        if off + count > len(tiff):
            return None
        raw = tiff[off : off + count]
    return raw.split(b"\0", 1)[0].decode("latin-1", "replace")


def _exif_tiff(data: bytes) -> Optional[Tuple[bytes, bool]]:
    """(tiff_body, little_endian) of the first EXIF APP1, else None."""
    for m, s, e in iter_segments(data):
        if m != APP1:
            continue
        payload = data[s + 4 : e]
        if not payload.startswith(b"Exif\x00\x00"):
            continue  # XMP APP1 etc.
        tiff = payload[6:]
        if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
            return None
        return tiff, tiff[:2] == b"II"
    return None


def extract_jpeg_text_metadata(data: bytes) -> List[Tuple[str, str]]:
    """(field, text) pairs: COM segment bodies plus the EXIF IFD0 ASCII
    tags. Deterministic order: COM segments in file order, then tags in
    ascending id."""
    if not is_jpeg(data):
        return []
    out: List[Tuple[str, str]] = []
    for m, s, e in iter_segments(data):
        if m == COM and e - s > 4:
            out.append(("COM", data[s + 4 : e].decode("latin-1", "replace")))
    tf = _exif_tiff(data)
    if tf is not None:
        tiff, le = tf
        ifd0 = _tiff_u32(tiff, 4, le)
        for tag, typ, count, vpos in _parse_ifd(tiff, ifd0, le):
            name = _TIFF_ASCII_TAGS.get(tag)
            if name is None or typ != _T_ASCII or count == 0:
                continue
            val = _ascii_value(tiff, count, vpos, le)
            if val:
                out.append((name, val))
    return out


def has_gps(data: bytes) -> bool:
    """True iff the EXIF IFD0 carries a GPSInfo sub-IFD pointer — the
    location-PII signal the scrub must catch."""
    tf = _exif_tiff(data)
    if tf is None:
        return False
    tiff, le = tf
    ifd0 = _tiff_u32(tiff, 4, le)
    return any(tag == GPS_IFD_TAG for tag, _, _, _ in _parse_ifd(tiff, ifd0, le))


def count_meta_segments(data: bytes) -> int:
    """How many strip-eligible segments (APP1/APP13/COM) the file has."""
    if not is_jpeg(data):
        return 0
    return sum(1 for m, _, _ in iter_segments(data) if m in STRIP_MARKERS)


def strip_jpeg_metadata(data: bytes) -> bytes:
    """The file with APP1/APP13/COM removed and EVERYTHING else — markers,
    tables, scan bytes — byte-identical. Non-JPEG input passes through."""
    if not is_jpeg(data):
        return data
    parts = [b"\xff\xd8"]
    tail_from = 2
    for m, s, e in iter_segments(data):
        tail_from = e
        if m in STRIP_MARKERS:
            continue
        parts.append(data[s:e])
    parts.append(data[tail_from:])
    return b"".join(parts)


def add_comment(data: bytes, text: str) -> bytes:
    """Insert a COM segment right after SOI (fixture injection)."""
    if not is_jpeg(data):
        return data
    body = text.encode("latin-1", "replace")
    seg = b"\xff\xfe" + struct.pack(">H", len(body) + 2) + body
    return data[:2] + seg + data[2:]


def build_exif_app1(
    fields: dict,
    gps: Optional[Tuple[float, float]] = None,
) -> bytes:
    """A well-formed EXIF APP1 segment (little-endian TIFF) carrying the
    given {tag-name: ascii} fields and, optionally, a GPS sub-IFD with
    the (lat, lon) in the standard deg/min/sec rational triples. Used by
    fixtures/tests to plant realistic camera metadata into the repo's
    real JPEGs."""
    name2tag = {v: k for k, v in _TIFF_ASCII_TAGS.items()}
    entries: List[Tuple[int, int, int, bytes]] = []  # tag, type, count, raw
    for name, val in fields.items():
        raw = str(val).encode("latin-1", "replace") + b"\x00"
        entries.append((name2tag[name], _T_ASCII, len(raw), raw))
    entries.sort()
    n = len(entries) + (1 if gps is not None else 0)
    ifd0_size = 2 + 12 * n + 4
    base = 8 + ifd0_size  # first free offset in the TIFF body
    data_area = bytearray()
    body = bytearray()
    body += b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    body += struct.pack("<H", n)

    def entry(tag: int, typ: int, count: int, raw: bytes) -> bytes:
        e = struct.pack("<HHI", tag, typ, count)
        if len(raw) <= 4:
            return e + raw.ljust(4, b"\x00")
        off = base + len(data_area)
        data_area.extend(raw)
        return e + struct.pack("<I", off)

    rows = [(t, entry(t, ty, c, r)) for t, ty, c, r in entries]
    if gps is not None:
        gps_off = base + len(data_area)
        rows.append(
            (GPS_IFD_TAG, struct.pack("<HHII", GPS_IFD_TAG, _T_LONG, 1, gps_off))
        )
    # TIFF 6.0 requires ascending NUMERIC tag order (the little-endian
    # byte spelling doesn't sort the same way)
    body += b"".join(packed for _, packed in sorted(rows))
    body += struct.pack("<I", 0)
    body += bytes(data_area)
    if gps is not None:
        body += _gps_ifd(gps, gps_off)
    payload = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def _dms(v: float) -> bytes:
    av = abs(v)
    d = int(av)
    m = int((av - d) * 60)
    s = round(((av - d) * 60 - m) * 60 * 100)
    return struct.pack("<6I", d, 1, m, 1, s, 100)


def _gps_ifd(gps: Tuple[float, float], gps_off: int) -> bytes:
    lat, lon = gps
    ifd_size = 2 + 12 * 4 + 4
    lat_off = gps_off + ifd_size
    lon_off = lat_off + 24
    out = bytearray()
    out += struct.pack("<H", 4)
    out += struct.pack("<HHI", 1, _T_ASCII, 2)  # GPSLatitudeRef
    out += (b"N" if lat >= 0 else b"S") + b"\x00\x00\x00"
    out += struct.pack("<HHII", 2, _T_RATIONAL, 3, lat_off)
    out += struct.pack("<HHI", 3, _T_ASCII, 2)  # GPSLongitudeRef
    out += (b"E" if lon >= 0 else b"W") + b"\x00\x00\x00"
    out += struct.pack("<HHII", 4, _T_RATIONAL, 3, lon_off)
    out += struct.pack("<I", 0)
    out += _dms(lat) + _dms(lon)
    return bytes(out)
