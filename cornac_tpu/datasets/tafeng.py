"""Ta Feng grocery baskets.

Download-and-cache loaders (capability parity with reference
``cornac/datasets/tafeng.py``). Files are cached under the framework cache
dir (see :mod:`cornac_tpu.utils.download`).
"""

from ..data import Reader
from ..utils import cache, validate_format


def load_basket(fmt="UBITJson", reader=None):
    """Load basket data."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/tafeng/basket.zip",
        unzip=True,
        relative_path="tafeng/basket.txt",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep="\t")
