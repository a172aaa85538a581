"""Approximate-nearest-neighbor search over embedding columns."""
