"""Amazon review corpora (by category; McAuley et al.).

Download-and-cache loaders (capability parity with reference
``cornac/datasets/amazon_review.py``). Files are cached under the framework cache
dir (see :mod:`cornac_tpu.utils.download`).
"""

from ..data import Reader
from ..utils import cache, validate_format

import gzip
import json
import os

_BASE_URL = "https://snap.stanford.edu/data/amazon/productGraph/categoryFiles"


def _category_stem(category, version):
    stem = category.strip().replace(" ", "_")
    if version != "2014":
        raise ValueError("only the 2014 version is supported")
    return stem


def load_feedback(category, version="2014", fmt="UIRT", reader=None):
    """Load (user, item, rating, timestamp) for an Amazon category (5-core)."""
    stem = _category_stem(category, version)
    gz_path = cache(
        url=f"{_BASE_URL}/reviews_{stem}_5.json.gz",
        relative_path=f"amazon_review/{category}_{version}.json.gz",
    )
    csv_path = gz_path + ".csv"
    if not os.path.exists(csv_path):
        with gzip.open(gz_path, "rt", encoding="utf-8") as fin, open(
            csv_path, "w", encoding="utf-8"
        ) as fout:
            for line in fin:
                d = json.loads(line)
                fout.write(
                    f"{d['reviewerID']},{d['asin']},{d['overall']},{d['unixReviewTime']}\n"
                )
    reader = Reader() if reader is None else reader
    return reader.read(csv_path, fmt=fmt, sep=",")


def load_review(category, version="2014", reader=None):
    """Load (user, item, review text) for an Amazon category (5-core)."""
    stem = _category_stem(category, version)
    gz_path = cache(
        url=f"{_BASE_URL}/reviews_{stem}_5.json.gz",
        relative_path=f"amazon_review/{category}_{version}.json.gz",
    )
    out = []
    with gzip.open(gz_path, "rt", encoding="utf-8") as fin:
        for line in fin:
            d = json.loads(line)
            out.append((d["reviewerID"], d["asin"], d.get("reviewText", "")))
    return out
