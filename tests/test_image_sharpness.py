"""Blur / placeholder image quality filter (variance-of-Laplacian + entropy)."""

import numpy as np

from pii_filter_spark.images import decode_image
from pii_filter_spark.images.codecs import encode_image
from pii_filter_spark.images.sharpness import (
    box_blur,
    gray_entropy,
    laplacian_var,
)
from pii_filter_spark.operators.image_sharpness import (
    ENTROPY_MIN,
    LAPVAR_MIN,
    blur_variants,
    flat_placeholder_rows,
    image_sharpness,
    sharpness_row,
)
from pii_filter_spark.sources.synth import build_input_table, gen_row


def test_laplacian_var_known_values():
    flat = np.full((8, 8), 100.0)
    assert laplacian_var(flat) == 0.0
    # single bright pixel at the interior center of a 5x5: response is
    # -4 at the pixel, +1 at its 4 neighbours, 0 elsewhere (9 interior).
    img = np.zeros((5, 5))
    img[2, 2] = 1.0
    lap = laplacian_var(img)
    vals = np.array([-4.0, 1, 1, 1, 1, 0, 0, 0, 0])
    assert abs(lap - vals.var()) < 1e-12
    assert laplacian_var(np.zeros((2, 2))) == 0.0  # no interior


def test_entropy_extremes():
    assert abs(gray_entropy(np.full((16, 16, 3), 77, np.uint8))) < 1e-12
    # all 256 gray values equally often -> exactly 8 bits
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert abs(gray_entropy(np.stack([g] * 3, axis=2)) - 8.0) < 1e-12


def test_box_blur_reduces_laplacian_and_preserves_mean():
    r = gen_row(42, 3)
    px = decode_image(bytes(r["bytes"]))
    b = box_blur(px)
    assert laplacian_var(b) < laplacian_var(px) / 10
    assert abs(float(b.mean()) - float(px.mean())) < 2.0
    assert b.shape == px.shape and b.dtype == np.uint8


def test_metric_separation_on_synth_corpus():
    for i in range(12):
        px = decode_image(bytes(gen_row(42, i)["bytes"]))
        lv, ent = sharpness_row(encode_image(px, "png"))
        assert lv >= LAPVAR_MIN and ent >= ENTROPY_MIN
        blv, bent = sharpness_row(encode_image(box_blur(px), "png"))
        assert blv < LAPVAR_MIN  # blurred twin must be dropped
    for _, data in flat_placeholder_rows():
        lv, ent = sharpness_row(data)
        assert ent < ENTROPY_MIN  # placeholder dropped by entropy


def test_operator_keep_flags(spark):
    imgs = (
        build_input_table(spark, 24, seed=42, num_partitions=4)
        .select("image_id", "bytes")
        .localCheckpoint()
    )
    blurred = blur_variants(imgs.limit(6))
    flats = spark.createDataFrame(
        flat_placeholder_rows(), "image_id string, bytes binary"
    )
    out = image_sharpness(imgs.unionByName(blurred).unionByName(flats)).collect()
    by_id = {r["image_id"]: r for r in out}
    assert len(by_id) == 24 + 6 + 4
    for iid, r in by_id.items():
        if iid.endswith("~blur") or iid.startswith("flat_"):
            assert not r["keep"], iid
        else:
            assert r["keep"], iid
    # Spark-vs-twin metric equality is covered by the oracle gate at sf0.01.
