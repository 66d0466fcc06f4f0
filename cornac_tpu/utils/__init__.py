from .common import (
    clip,
    estimate_batches,
    excepts,
    get_rng,
    intersects,
    normalize,
    safe_indexing,
    scale,
    sigmoid,
    validate_format,
)
from .download import cache

__all__ = [
    "cache",
    "clip",
    "estimate_batches",
    "excepts",
    "get_rng",
    "intersects",
    "normalize",
    "safe_indexing",
    "scale",
    "sigmoid",
    "validate_format",
]
