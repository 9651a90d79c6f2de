"""Format dispatch + PSNR for the binary image column."""

from __future__ import annotations

import io
import math

import numpy as np

from .lossy_codec import MAGIC as _LOSSY_MAGIC
from .lossy_codec import decode_lossy, encode_lossy
from .png_codec import decode_png, encode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8\xff"

try:  # real JPEG support only if an imaging library happens to exist
    from PIL import Image as _PILImage  # pragma: no cover
except ImportError:  # expected in this sandbox
    _PILImage = None


def encode_image(pixels: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    """Encode RGB uint8 pixels. fmt: "png" (lossless) | "jpeg" (lossy slot)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        if _PILImage is not None:  # pragma: no cover
            buf = io.BytesIO()
            _PILImage.fromarray(pixels).save(buf, format="JPEG", quality=quality)
            return buf.getvalue()
        return encode_lossy(pixels, quality)
    raise ValueError(f"unsupported format: {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode by magic bytes -> RGB uint8 (h, w, 3)."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data.startswith(_LOSSY_MAGIC):
        return decode_lossy(data)
    if data.startswith(_JPEG_SIG):
        if _PILImage is not None:  # pragma: no cover
            return np.asarray(_PILImage.open(io.BytesIO(data)).convert("RGB"))
        # SANDBOX STUB: no libjpeg available in this container.
        raise NotImplementedError(
            "real JPEG decode requires Pillow/libjpeg (absent in sandbox); "
            "lossy fixtures use the deterministic JQD1 codec instead"
        )
    raise ValueError("unrecognized image container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return math.inf
    return 10.0 * math.log10(255.0 * 255.0 / mse)
