"""Deterministic blockwise-DCT lossy codec (the sandbox's "jpeg" slot).

JPEG-shaped loss model — 8x8 block DCT per channel, quantization by a
scaled luminance-style table, zlib entropy coding — but fully deterministic
and dependency-free. Container magic "JQD1". At the default quality the
round-trip PSNR comfortably exceeds the 40 dB per-row invariant the
pipeline must verify for lossy formats.

This is the clearly-marked stand-in for real libjpeg decode (no Pillow in
the container); see images/__init__.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"JQD1"

# JPEG Annex K luminance quantization table (public spec constants).
_QBASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0, :] = np.sqrt(1.0 / n)
    return mat


_DCT = _dct_matrix()
_IDCT = _DCT.T


def _qtable(quality: int) -> np.ndarray:
    # libjpeg-style quality scaling
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    tbl = np.floor((_QBASE * scale + 50) / 100)
    return np.clip(tbl, 1, 255)


def _pad_to_block(px: np.ndarray) -> np.ndarray:
    h, w = px.shape
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(px, ((0, ph), (0, pw)), mode="edge")


def _blockify(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return blocks.transpose(0, 2, 1, 3).reshape(h, w)


def encode_lossy(pixels: np.ndarray, quality: int = 90) -> bytes:
    """RGB uint8 (h, w, 3) -> deterministic lossy container bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected uint8 array of shape (h, w, 3)")
    h, w = pixels.shape[:2]
    q = _qtable(quality)
    coeffs = []
    for c in range(3):
        ch = _pad_to_block(pixels[:, :, c].astype(np.float64) - 128.0)
        blocks = _blockify(ch)
        dct = np.einsum("ij,abjk,kl->abil", _DCT, blocks, _IDCT.T)
        quant = np.round(dct / q).astype(np.int16)
        coeffs.append(quant)
    payload = zlib.compress(np.stack(coeffs).tobytes(), 6)
    return MAGIC + struct.pack(">HHB", w, h, max(1, min(100, quality))) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    if not data.startswith(MAGIC):
        raise ValueError("not a JQD1 stream")
    w, h, quality = struct.unpack(">HHB", data[4:9])
    q = _qtable(quality)
    ph, pw = h + ((-h) % 8), w + ((-w) % 8)
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.int16)
    coeffs = raw.reshape(3, ph // 8, pw // 8, 8, 8).astype(np.float64)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for c in range(3):
        dq = coeffs[c] * q
        blocks = np.einsum("ij,abjk,kl->abil", _IDCT, dq, _DCT.T)
        ch = _unblockify(blocks, ph, pw)[:h, :w] + 128.0
        out[:, :, c] = np.clip(np.round(ch), 0, 255).astype(np.uint8)
    return out
