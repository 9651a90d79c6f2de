"""RIFF/AVI MJPEG codec (video/avi.py): structure, roundtrip fidelity,
fps metadata, malformed rejection, and the video-stage dispatch."""

import struct

import numpy as np
import pytest

from pii_filter_spark.video.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    synth_clip,
)


def test_container_structure_is_real_avi():
    data = encode_avi_mjpeg(synth_clip(1), fps=12)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    for marker in (b"hdrl", b"avih", b"strh", b"strf", b"movi", b"idx1",
                   b"MJPG", b"00dc"):
        assert marker in data, marker
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # frame payloads are REAL JPEGs
    i = data.index(b"00dc")
    assert data[i + 8:i + 11] == b"\xff\xd8\xff"


def test_roundtrip_counts_dims_fps_fidelity():
    frames = synth_clip(5)
    fps, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=10, quality=90))
    assert fps == 10.0 and len(out) == len(frames)
    for a, b in zip(frames, out):
        assert b.shape == a.shape
        assert float(np.abs(a.astype(int) - b.astype(int)).mean()) < 4.0


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], fps=10)


def test_video_stage_dispatch(spark):
    from pii_filter_spark.operators.image_stage import sample_video_frames

    clips = [
        (f"v{i}", encode_avi_mjpeg(synth_clip(i), fps=10),
         synth_clip(i)[0].shape[1], synth_clip(i)[0].shape[0])
        for i in range(3)
    ]
    df = spark.createDataFrame(
        clips, "image_id string, bytes binary, w int, h int"
    )
    rows = sample_video_frames(df, every_n=1).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    for i in range(3):
        frames = synth_clip(i)
        got = sorted(by_vid[f"v{i}"], key=lambda r: r.frame_idx)
        assert len(got) == len(frames)
        assert (got[0].frame_w, got[0].frame_h) == (
            frames[0].shape[1], frames[0].shape[0]
        )
    # non-RIFF bytes keep the legacy stub contract (still yields frames)
    legacy = spark.createDataFrame(
        [("x", b"opaque", 8, 8)], "image_id string, bytes binary, w int, h int"
    )
    assert sample_video_frames(legacy, every_n=1).count() >= 1
