"""Downloadable benchmark dataset loaders (cached under ~/.cornac_tpu)."""
