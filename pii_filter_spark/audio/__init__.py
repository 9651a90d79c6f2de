"""Audio container support (real RIFF/WAVE PCM codec; public spec)."""

from .wav import decode_wav, encode_wav, synth_tone  # noqa: F401
