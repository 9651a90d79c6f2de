"""Image sharpness / information-content quality filter (LAION shape).

Web-scale image curation drops frames that carry no learnable visual
signal even when the caption is fine: blurred thumbnails and upscaled
placeholders (low variance-of-Laplacian) and solid-color / banner fills
(low grayscale entropy). LAION-5B and DataComp both apply image-side
keep rules of this family alongside the CLIP-score gate; the classic
blur statistic is the variance of the Laplacian (Pech-Pacheco et al.
2000 — `images/sharpness.py` implements the published arithmetic in
pure numpy, no cv2).

Execution shape — the same one every pixel-touching operator in this
repo uses: ONE mapInPandas pass directly off the scan (`bytes` never
shuffles), per-batch vectorized numpy, a codegen keep predicate on the
two scalar metrics. At 10^12 rows this is a map-only stage fused into
the scan; undecodable rows surface as keep=false with null metrics
(quarantine semantics, same as verify_images).

Thresholds are STUB-CALIBRATED to the deterministic synthetic corpus
(documented in README's seam table): gradient+noise synth images
measure lap_var >= ~97 while their box-blurred twins measure <= ~2, so
LAPVAR_MIN=25 splits them with wide margin; flat placeholder fills
measure entropy ~0 bits vs >= ~7 for real content, so ENTROPY_MIN=3.
Production calibration against real photographs (cv2 folklore uses
lap_var ~100) is a threshold swap, not a code change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..images import decode_image
from ..images.sharpness import gray_entropy, laplacian_var

LAPVAR_MIN = 25.0
ENTROPY_MIN = 3.0

_SCHEMA = "image_id string, lap_var double, entropy double"


def sharpness_row(data: bytes):
    """(lap_var, entropy) for one image's bytes — the pure twin."""
    px = decode_image(data)
    return laplacian_var(px), gray_entropy(px)


def blur_variants(
    df: DataFrame,
    id_suffix: str = "~blur",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    k: int = 7,
) -> DataFrame:
    """Box-blurred LOSSLESS (PNG) twins with suffixed ids — the
    deterministic stand-in for the blurred thumbnails and bad upscales a
    web corpus contains (PNG so the blurred pixels, and therefore the
    metrics, are exact in any engine)."""
    from ..images.codecs import encode_image
    from ..images.sharpness import box_blur

    def _re(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    px = decode_image(bytes(getattr(rec, bytes_col)))
                    rows.append((
                        getattr(rec, id_col) + id_suffix,
                        encode_image(box_blur(px, k), "png"),
                    ))
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(rows, columns=[id_col, bytes_col])

    return df.select(id_col, bytes_col).mapInPandas(
        _re, schema=f"{id_col} string, {bytes_col} binary"
    )


def flat_placeholder_rows():
    """Four deterministic solid-fill PNGs — the placeholder/banner case
    the entropy rule exists for (entropy ~0 bits)."""
    import numpy as np

    from ..images.codecs import encode_image

    return [
        (f"flat_{v:03d}", encode_image(np.full((64, 64, 3), v, np.uint8), "png"))
        for v in (40, 90, 160, 220)
    ]


def image_sharpness(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    lapvar_min: float = LAPVAR_MIN,
    entropy_min: float = ENTROPY_MIN,
) -> DataFrame:
    """(image_id, lap_var, entropy, keep): one decode pass, keep is a
    codegen predicate over the two metrics."""

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    lv, ent = sharpness_row(bytes(getattr(rec, bytes_col)))
                except (ValueError, NotImplementedError):
                    lv = ent = None
                rows.append((getattr(rec, id_col), lv, ent))
            yield pd.DataFrame(rows, columns=["image_id", "lap_var", "entropy"])

    scored = df.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(_score, schema=_SCHEMA)
    return scored.select(
        "image_id",
        "lap_var",
        "entropy",
        (
            F.col("lap_var").isNotNull()
            & (F.col("lap_var") >= lapvar_min)
            & (F.col("entropy") >= entropy_min)
        ).alias("keep"),
    )
