"""YooChoose click/buy sessions (RecSys'15 challenge).

Download-and-cache loaders (capability parity with reference
``cornac/datasets/yoochoose.py``). Files are cached under the framework cache
dir (see :mod:`cornac_tpu.utils.download`).
"""

from ..data import Reader
from ..utils import cache, validate_format


def load_buy(fmt="SITJson", reader=None):
    """Load the buy split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/yoochoose/buy.zip",
        unzip=True,
        relative_path="yoochoose/buy.txt",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep="\t")


def load_click(fmt="SITJson", reader=None):
    """Load the click split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/yoochoose/click.zip",
        unzip=True,
        relative_path="yoochoose/click.txt",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep="\t")


def load_test(fmt="SITJson", reader=None):
    """Load the test split."""
    fpath = cache(
        url="https://static.preferred.ai/cornac/datasets/yoochoose/test.zip",
        unzip=True,
        relative_path="yoochoose/test.txt",
    )
    reader = Reader() if reader is None else reader
    return reader.read(fpath, fmt=fmt, sep="\t")
