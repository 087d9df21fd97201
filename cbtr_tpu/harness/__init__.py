"""Drivers, accuracy harness and visual debug dumpers (layer L5)."""
from .measure import measure_approximation, preprocess  # noqa: F401
