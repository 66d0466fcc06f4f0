"""Download-and-cache helper for benchmark datasets.

Capability parity with reference ``cornac/utils/download.py:50-165``: fetch a
URL into a local cache directory (``~/.cornac_tpu`` by default, override with
``CORNAC_TPU_CACHE``), optionally extract zip/tar archives with a
path-traversal guard, and return the cached path. Network access may be
unavailable in sandboxed environments; callers get a clear error rather than
a hang.
"""

import os
import shutil
import tarfile
import zipfile
from urllib.request import urlretrieve


def get_cache_dir():
    cache_dir = os.environ.get(
        "CORNAC_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cornac_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return cache_dir


def get_cache_path(relative_path, cache_dir=None):
    """Absolute path a cached data file would live at (reference
    ``utils/download.py:110-125``). Returns ``(cache_path, cache_dir)``
    and creates the parent directory."""
    if cache_dir is None:
        cache_dir = get_cache_dir()
    if not os.access(cache_dir, os.W_OK):
        cache_dir = os.path.join("/tmp", ".cornac_tpu")
    cache_path = os.path.join(cache_dir, relative_path)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    return cache_path, cache_dir


def _is_within_directory(directory, target):
    abs_directory = os.path.abspath(directory)
    abs_target = os.path.abspath(target)
    return os.path.commonpath([abs_directory]) == os.path.commonpath(
        [abs_directory, abs_target]
    )


def _safe_extract_tar(tar, path):
    for member in tar.getmembers():
        member_path = os.path.join(path, member.name)
        if not _is_within_directory(path, member_path):
            raise RuntimeError("Attempted path traversal in tar file")
    tar.extractall(path)


def _safe_extract_zip(zf, path):
    for name in zf.namelist():
        member_path = os.path.join(path, name)
        if not _is_within_directory(path, member_path):
            raise RuntimeError("Attempted path traversal in zip file")
    zf.extractall(path)


def _extract_archive(fpath, extract_dir):
    if zipfile.is_zipfile(fpath):
        with zipfile.ZipFile(fpath, "r") as zf:
            _safe_extract_zip(zf, extract_dir)
    elif tarfile.is_tarfile(fpath):
        with tarfile.open(fpath, "r") as tar:
            _safe_extract_tar(tar, extract_dir)
    else:
        raise ValueError("Unknown archive format: {}".format(fpath))


def cache(url, unzip=False, relative_path=None, cache_dir=None):
    """Download ``url`` into the cache (if not present) and return local path.

    Parameters
    ----------
    url: str
        Remote file URL.
    unzip: bool, default: False
        If True, extract the downloaded archive next to it.
    relative_path: str, optional
        Path (relative to the cache dir) of the file of interest after
        download/extraction. Defaults to the URL basename.
    cache_dir: str, optional
        Override the cache directory.
    """
    if cache_dir is None:
        cache_dir = get_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)

    if relative_path is None:
        relative_path = url.split("/")[-1]
    cached_fpath = os.path.join(cache_dir, relative_path)
    if os.path.exists(cached_fpath):
        return cached_fpath

    download_fpath = os.path.join(cache_dir, url.split("/")[-1])
    if not os.path.exists(download_fpath):
        print("Downloading {} ...".format(url))
        try:
            tmp_fpath = download_fpath + ".part"
            urlretrieve(url, tmp_fpath)
            shutil.move(tmp_fpath, download_fpath)
        except Exception as e:  # noqa: BLE001 - surface any network failure
            raise RuntimeError(
                "Failed to download {} (network may be unavailable in this "
                "environment): {}".format(url, e)
            ) from e

    if unzip:
        _extract_archive(download_fpath, cache_dir)

    if not os.path.exists(cached_fpath):
        raise RuntimeError(
            "Expected file {} not found after download/extraction".format(cached_fpath)
        )
    return cached_fpath
