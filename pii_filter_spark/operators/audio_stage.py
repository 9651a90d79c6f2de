"""Audio-column operators: opaque `bytes` + typed metadata, like images.

The default decoder handles REAL RIFF/WAVE PCM (audio/wav.py — 8/16-bit,
any channel count, mono downmix); bytes without the RIFF magic fall back
to the deterministic stub so legacy fixtures keep decoding. A production
deployment injects a soundfile/ffmpeg-backed decoder
`(bytes) -> (sample_rate, float32 mono ndarray)` for compressed
containers. Everything Spark-side — mapInPandas batching, column
pruning, output schema — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURE_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, duration_s double, "
    "rms double, zero_crossing_rate double, peak double"
)


def _default_audio_decoder(data: bytes):
    """Real WAV when the container says so; deterministic stub otherwise."""
    if data[:4] == b"RIFF":
        from ..audio.wav import decode_wav

        return decode_wav(data)
    return _fake_audio_decoder(data)


def _fake_audio_decoder(data: bytes):
    """Deterministic pseudo-PCM derived from the byte content."""
    digest = hashlib.blake2b(data, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little") % (2**63))
    sr = 16_000
    n = max(1, len(data)) * 4  # 4 "samples" per input byte
    pcm = rng.standard_normal(n).astype(np.float32) * 0.1
    return sr, pcm


def audio_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    decoder=None,
) -> DataFrame:
    """Per-row acoustic features: duration, RMS, zero-crossing rate, peak."""
    decode = decoder or _default_audio_decoder

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    sr, pcm = decode(bytes(getattr(rec, bytes_col)))
                except NotImplementedError:
                    rows.append((getattr(rec, id_col), None, None, None,
                                 None, None, None))
                    continue
                n = len(pcm)
                zc = float(np.mean(np.abs(np.diff(np.signbit(pcm))))) if n > 1 else 0.0
                rows.append(
                    (
                        getattr(rec, id_col),
                        int(sr),
                        int(n),
                        float(n / sr),
                        float(np.sqrt(np.mean(pcm**2))) if n else 0.0,
                        zc,
                        float(np.abs(pcm).max()) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_crossing_rate", "peak",
                ],
            )

    return df.select(id_col, bytes_col).mapInPandas(
        _feat, schema=AUDIO_FEATURE_SCHEMA
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    decoder=None,
) -> DataFrame:
    """(id, fp64): 64-bit Haitsma-Kalker fingerprint per clip
    (audio/fingerprint.py) — decode + fingerprint in ONE Arrow pass,
    bytes never shuffle. Feeds dedup.hamming_near_pairs (chunks=8 for
    exact recall to hamming<=7), extending near-dup detection to the
    audio modality with the same banded operator text simhash and image
    pHash use."""
    from ..audio.fingerprint import audio_fp64

    dec = decoder or _default_audio_decoder

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in zip(pdf[id_col], pdf[bytes_col]):
                sr, samples = dec(bytes(rec[1]))
                rows.append((rec[0], audio_fp64(samples, sr)))
            yield pd.DataFrame(rows, columns=["audio_id", "fp64"])

    return df.select(id_col, bytes_col).mapInPandas(
        _fp, schema="audio_id string, fp64 long"
    )
