"""Gowalla check-in sessions.

Download-and-cache loaders (capability parity with reference
``cornac/datasets/gowalla.py``). Files are cached under the framework cache
dir (see :mod:`cornac_tpu.utils.download`).
"""

from ..data import Reader
from ..utils import cache, validate_format


def load_checkins(fmt="USITJson", reader=None):
    """Load check-in sessions."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/gowalla/check-ins.zip",
        unzip=True,
        relative_path="gowalla/check-ins.txt",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep="\t")
