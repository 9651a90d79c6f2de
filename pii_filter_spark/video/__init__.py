"""Video container support (real RIFF/AVI MJPEG codec; public spec)."""

from .avi import decode_avi_mjpeg, encode_avi_mjpeg, synth_clip  # noqa: F401
