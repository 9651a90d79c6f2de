"""Table IO seam + deterministic synthetic input generation."""
