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
from .fast_dot import fast_dot

__all__ = [
    "cache",
    "clip",
    "estimate_batches",
    "excepts",
    "fast_dot",
    "get_rng",
    "intersects",
    "normalize",
    "safe_indexing",
    "scale",
    "sigmoid",
    "validate_format",
]
