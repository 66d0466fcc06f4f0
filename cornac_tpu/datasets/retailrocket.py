"""RetailRocket sessions (train/val/test).

Download-and-cache loaders (capability parity with reference
``cornac/datasets/retailrocket.py``). Files are cached under the framework cache
dir (see :mod:`cornac_tpu.utils.download`).
"""

from ..data import Reader
from ..utils import cache, validate_format


def load_train(fmt="USIT", reader=None):
    """Load the train split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/retailrocket/train.zip",
        unzip=True,
        relative_path="retailrocket/train.csv",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep=",")


def load_val(fmt="USIT", reader=None):
    """Load the val split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/retailrocket/val.zip",
        unzip=True,
        relative_path="retailrocket/val.csv",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep=",")


def load_test(fmt="USIT", reader=None):
    """Load the test split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/retailrocket/test.zip",
        unzip=True,
        relative_path="retailrocket/test.csv",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep=",")
