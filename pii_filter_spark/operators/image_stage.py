"""Multimodal (image) column operators: verify, features, resize, sampling.

The image `bytes` column is opaque binary with typed metadata (w, h, fmt).
Decode-touching work runs in mapInPandas batches so each task streams
Arrow record batches instead of materializing whole partitions (rows are
MB-scale; session config caps maxRecordsPerBatch accordingly). Decoders:
real PNG + deterministic lossy codec (images/); true JPEG/video paths are
sandbox-stubbed (images/codecs.py raises NotImplementedError) while the
Spark plumbing — schemas, batch iteration, column pruning — is real.

verify_images is the per-row invariant stage (FIXTURES.md B3): decoded
pixels must exist, match the (w, h) metadata, and PSNR vs a reference
decode must clear 40 dB for lossy formats (infinite for lossless).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..images import decode_image, psnr
from ..images.codecs import encode_image
from ..sources.synth import LOSSY_QUALITY

VERIFY_SCHEMA = (
    "image_id string, decode_ok boolean, dims_ok boolean, "
    "px_mean double, reencode_psnr double"
)

FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "std_gray double, thumb array<int>"
)


def verify_images(df: DataFrame, thumb: int = 0) -> DataFrame:
    """Decode every image; emit per-row verification facts.

    reencode_psnr: decode → re-encode with the same codec → decode again,
    PSNR between the two decodes. Lossless formats give +inf (reported as
    NaN-safe large sentinel 999.0); lossy formats must stay >= 40 dB.
    """

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                ok = dims = False
                mean = q = float("nan")
                try:
                    px = decode_image(bytes(rec.bytes))
                    ok = True
                    dims = px.shape[0] == rec.h and px.shape[1] == rec.w
                    mean = float(px.mean())
                    second = decode_image(
                        encode_image(px, rec.fmt, quality=LOSSY_QUALITY)
                    )
                    p = psnr(px, second)
                    q = 999.0 if math.isinf(p) else p
                except (ValueError, NotImplementedError):
                    pass
                rows.append((rec.image_id, ok, dims, mean, q))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "decode_ok", "dims_ok", "px_mean", "reencode_psnr"],
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _verify, schema=VERIFY_SCHEMA
    )


def image_features(df: DataFrame, thumb_size: int = 8) -> DataFrame:
    """Deterministic feature extraction: channel means, gray std, and a
    nearest-neighbor thumbnail (flattened gray thumb_size x thumb_size).
    This is the feature/resize plumbing a real CLIP/embedding stage would
    occupy; the features themselves are deterministic stand-ins."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    px = decode_image(bytes(rec.bytes)).astype(np.float64)
                except (ValueError, NotImplementedError):
                    rows.append((rec.image_id, None, None, None, None, None))
                    continue
                gray = px.mean(axis=2)
                h, w = gray.shape
                yi = np.linspace(0, h - 1, thumb_size).round().astype(int)
                xi = np.linspace(0, w - 1, thumb_size).round().astype(int)
                tb = gray[np.ix_(yi, xi)].round().astype(int).ravel().tolist()
                rows.append(
                    (
                        rec.image_id,
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        float(gray.std()),
                        tb,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "mean_r", "mean_g", "mean_b", "std_gray", "thumb"],
            )

    return df.select("image_id", "bytes").mapInPandas(_feat, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "video_id string, frame_idx int, frame_w int, frame_h int, "
    "frame_gray_mean double, frame_bytes binary"
)


def _default_video_decoder(data: bytes, w: int, h: int):
    """Real MJPEG AVI when the container says so (video/avi.py); the
    deterministic stub otherwise (legacy fixtures / opaque bytes)."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from ..video.avi import decode_avi_mjpeg

        _, frames = decode_avi_mjpeg(data)
        return enumerate(frames)
    return _fake_video_decoder(data, w, h)


def _fake_video_decoder(data: bytes, w: int, h: int):
    """SANDBOX decode stub (no video codec in this container): yields a
    deterministic pseudo-frame sequence derived from the byte content —
    frame count = len(data) // 1024 + 1, pixels seeded by (digest, idx).
    A production deployment injects a PyAV/ffmpeg-backed decoder with the
    same signature: (bytes, w, h) -> iterator of (idx, HxWx3 uint8)."""
    import hashlib

    digest = hashlib.blake2b(data, digest_size=8).digest()
    seed = int.from_bytes(digest, "little")
    n_frames = len(data) // 1024 + 1
    for idx in range(n_frames):
        rng = np.random.default_rng((seed + idx) % (2**63))
        yield idx, rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def sample_video_frames(
    df: DataFrame, every_n: int = 30, decoder=None
) -> DataFrame:
    """Every-Nth-frame sampling over an opaque video `bytes` column.

    The Spark plumbing is real — mapInPandas fan-out (one input row →
    many frame rows), Arrow-batched, column-pruned to (image_id, bytes,
    w, h) — and the codec is REAL for MJPEG AVI input (video/avi.py);
    other bytes hit the documented injectable stub. Frames are
    re-encoded as PNG bytes so the output column is storable/chainable
    into image operators.
    """
    decode = decoder or _default_video_decoder

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    frames = decode(bytes(rec.bytes), rec.w, rec.h)
                except NotImplementedError:
                    continue
                for idx, px in frames:
                    if idx % every_n:
                        continue
                    rows.append(
                        (
                            rec.image_id,
                            idx,
                            px.shape[1],
                            px.shape[0],
                            float(px.mean()),
                            encode_image(px, "png"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "frame_w", "frame_h",
                    "frame_gray_mean", "frame_bytes",
                ],
            )

    return df.select("image_id", "bytes", "w", "h").mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )


def compute_phash(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(id, pixel_phash) — DCT pHash computed FROM decoded pixel content
    (images/phash.py), one mapInPandas pass; the MB-scale bytes column
    never shuffles. Decode failures yield NULL. Feeding these hashes to
    dedup.hamming_near_pairs turns phash near-dup into CONTENT near-dup
    (robust to re-encodes — see q_pixel_phash_pairs)."""
    from ..images.phash import phash64

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    ph = phash64(decode_image(bytes(getattr(rec, bytes_col))))
                except (ValueError, NotImplementedError):
                    ph = None
                rows.append((getattr(rec, id_col), ph))
            yield pd.DataFrame(rows, columns=[id_col, "pixel_phash"])

    return df.select(id_col, bytes_col).mapInPandas(
        _hash, schema=f"{id_col} string, pixel_phash long"
    )


def reencode_variants(
    df: DataFrame,
    quality: int,
    id_suffix: str = "_re",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Lossy re-encodes of each image (decode -> jpeg at `quality`) with
    suffixed ids — the deterministic stand-in for the re-crawled /
    re-hosted copies a web corpus contains."""

    def _re(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    px = decode_image(bytes(getattr(rec, bytes_col)))
                    data = encode_image(px, "jpeg", quality=quality)
                    rows.append((getattr(rec, id_col) + id_suffix, data))
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(rows, columns=[id_col, bytes_col])

    return df.select(id_col, bytes_col).mapInPandas(
        _re, schema=f"{id_col} string, {bytes_col} binary"
    )


def resize_export_row(
    data: bytes, buckets: tuple, quality: int
) -> tuple:
    """Pure per-image export resize: decode -> pick the aspect bucket
    minimizing |log(w/h) - log(bw/bh)| in integer micro-log units
    (EXACTLY export_prep's Catalyst argmin, ties to the lowest index) ->
    exact area-average resample to (bh, bw) -> re-encode through the
    real baseline-JPEG codec. Returns (bucket_w, bucket_h, out_len,
    out_md5, out_bytes). Shared by the Spark stage and the fixture
    oracle."""
    import hashlib

    from ..images.jpeg_codec import encode_jpeg
    from ..images.phash import area_resize_rgb
    from .export_prep import _log_aspect_micro

    if not buckets:
        raise ValueError("buckets must be non-empty")
    px = decode_image(bytes(data))
    h, w = px.shape[0], px.shape[1]
    la = _log_aspect_micro(float(w), float(h))
    best = min(
        range(len(buckets)),
        key=lambda i: (abs(la - _log_aspect_micro(*map(float, buckets[i]))), i),
    )
    bw, bh = buckets[best]
    out = area_resize_rgb(px, bh, bw)
    jb = encode_jpeg(out, quality=quality)
    return bw, bh, len(jb), hashlib.md5(jb).hexdigest(), jb


def resize_to_buckets(
    df: DataFrame,
    buckets: tuple,
    quality: int = LOSSY_QUALITY,
    with_bytes: bool = False,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Training-export resize: every image decoded, area-resampled to its
    SDXL-style aspect bucket, re-encoded as baseline JPEG — ONE
    mapInPandas pass, bytes never shuffle. with_bytes=True emits the
    re-encoded bytes for a writeback job; default emits scalar facts
    (len + md5) so the driver query stays cheap to hash-check."""
    if not buckets:
        # misconfiguration must fail fast here — inside the task it
        # would be swallowed by the per-row quarantine below
        raise ValueError("buckets must be non-empty")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    bw, bh, n, md5, jb = resize_export_row(
                        rec[1], buckets, quality
                    )
                except (ValueError, NotImplementedError):
                    # quarantine undecodable rows (null facts) instead
                    # of failing the whole export task deterministically
                    bw = bh = n = md5 = jb = None
                row = [rec[0], bw, bh, n, md5]
                if with_bytes:
                    row.append(jb)
                rows.append(tuple(row))
            cols = [id_col, "bucket_w", "bucket_h", "out_len", "out_md5"]
            if with_bytes:
                cols.append("out_bytes")
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        f"{id_col} string, bucket_w int, bucket_h int, "
        "out_len long, out_md5 string"
    )
    if with_bytes:
        schema += ", out_bytes binary"
    return df.select(id_col, bytes_col).mapInPandas(_resize, schema=schema)


def video_middle_frame_phash(
    df: DataFrame, id_col: str = "video_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(id, n_frames, mid_phash): perceptual hash of each clip's MIDDLE
    frame — the cheap video near-dup key (a re-encoded/re-hosted copy of
    a clip keeps its middle frame perceptually identical). One Arrow
    pass: decode MJPEG AVI (video/avi.py), pHash the frame
    (images/phash.py); bytes never shuffle. Feeds the shared banded
    hamming operator, completing near-dup coverage across text, image,
    audio and video with ONE pairing implementation."""
    from ..images.phash import phash64
    from ..video.avi import decode_avi_mjpeg

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    _, frames = decode_avi_mjpeg(bytes(rec[1]))
                    if not frames:
                        raise ValueError("zero-frame clip")
                    mid = frames[len(frames) // 2]
                    rows.append((rec[0], len(frames), phash64(mid)))
                except (ValueError, NotImplementedError):
                    # quarantine, same semantics as compute_phash: the
                    # null hash drops out of the near-dup pairing
                    rows.append((rec[0], None, None))
            yield pd.DataFrame(
                rows, columns=["video_id", "n_frames", "mid_phash"]
            )

    return df.select(id_col, bytes_col).mapInPandas(
        _fp, schema="video_id string, n_frames int, mid_phash long"
    )
