"""Audio fingerprinting — the Haitsma & Kalker (2002) "robust audio
fingerprint" shape, sized to one 64-bit word so the banded hamming
near-dup operator (operators/dedup.hamming_near_pairs) covers the
audio modality with zero new pairing code.

Per clip: 9 equal time frames → magnitude spectrum per frame (numpy
rfft) → 9 log-spaced band energies in the 300..3000 Hz speech/music
core → the H&K sign bits of the time-and-frequency energy DIFFERENCE
grid: bit(n,m) = [ (E(n,m)-E(n,m+1)) - (E(n-1,m)-E(n-1,m+1)) > 0 ]
for 8 frame pairs x 8 band pairs = 64 bits. Differences of energies
make the code invariant to overall gain and smooth spectral tilt —
re-encoded / volume-adjusted copies land within a few bits, unrelated
clips ~32 bits apart (random).

Pure per-row numpy shared verbatim by the Spark Arrow stage and the
DuckDB fixture oracle; the rfft input length depends only on the row's
own sample count, so results are partition-invariant.
"""

from __future__ import annotations

import numpy as np

_FRAMES = 9
_BANDS = 9  # energies; bits use 8 adjacent-band differences
_F_LO = 300.0
_F_HI = 3000.0


def audio_fp64(samples: np.ndarray, sample_rate: int) -> int:
    """Signed 64-bit fingerprint of a mono float signal."""
    x = np.asarray(samples, dtype=np.float64).ravel()
    if len(x) < _FRAMES * 2:
        x = np.pad(x, (0, _FRAMES * 2 - len(x)))
    frame_len = len(x) // _FRAMES
    hi = min(_F_HI, 0.45 * sample_rate)
    edges = np.geomspace(_F_LO, hi, _BANDS + 1)
    energies = np.empty((_FRAMES, _BANDS), dtype=np.float64)
    for n in range(_FRAMES):
        seg = x[n * frame_len : (n + 1) * frame_len]
        mag = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / sample_rate)
        for m in range(_BANDS):
            sel = (freqs >= edges[m]) & (freqs < edges[m + 1])
            energies[n, m] = float(np.square(mag[sel]).sum())
    band_diff = energies[:, :-1] - energies[:, 1:]       # (frames, 8)
    grid = band_diff[1:, :] - band_diff[:-1, :]          # (8, 8)
    bits = (grid > 0).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v
