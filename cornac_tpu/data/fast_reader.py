"""Native-accelerated parsing for delimited rating files.

``parse_table(text_bytes, sep, n_cols)`` tokenizes the whole file in one
C++ pass (``cornac_tpu/native/fast_io.cpp``) and exposes columns either as
decoded strings (for raw user/item ids, which must stay exact for the ID
maps) or as float arrays parsed natively. Falls back to ``None`` when the
native library is unavailable; the Reader then uses its pure-Python path.
The outputs are byte-for-byte identical to ``line.split(sep)`` +
``float(...)`` on well-formed files; any malformed row aborts the fast
path so the Python parser can apply its own error handling.
"""

import ctypes

import numpy as np

from ..native import load_library


class ParsedTable:
    def __init__(self, buf, offsets, lengths, n_rows, n_cols, lib):
        self._buf = buf
        self._offsets = offsets
        self._lengths = lengths
        self.n_rows = n_rows
        self.n_cols = n_cols
        self._lib = lib
        # ASCII files (the overwhelmingly common case): decode the whole
        # buffer once so column extraction is str slicing, not per-field
        # bytes.decode — byte offsets == str offsets only for ASCII
        self._text = buf.decode("ascii") if buf.isascii() else None

    def string_column(self, col, encoding="utf-8"):
        """Python strings of one column (needed for raw-ID dict keys)."""
        offs = self._offsets[:, col].tolist()
        lens = self._lengths[:, col].tolist()
        if self._text is not None:
            s = self._text
            return [s[o : o + l] for o, l in zip(offs, lens)]
        buf = self._buf
        return [
            buf[o : o + l].decode(encoding) for o, l in zip(offs, lens)
        ]

    def float_column(self, col):
        """One column parsed as float64 natively; None if unparsable."""
        out = np.empty(self.n_rows, np.float64)
        rc = self._lib.parse_double_column(
            self._buf,
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.n_rows,
            self.n_cols,
            col,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out if rc == 0 else None


def parse_table(text_bytes, sep, n_cols):
    """Tokenize a whole delimited file natively.

    Returns a :class:`ParsedTable` or None (library unavailable / a row
    with the wrong field count — the caller falls back to Python).
    """
    lib = load_library()
    if lib is None:
        return None
    n = len(text_bytes)
    # upper bound on rows = line count
    max_rows = text_bytes.count(b"\n") + 1
    offsets = np.empty((max_rows, n_cols), np.int64)
    lengths = np.empty((max_rows, n_cols), np.int32)
    n_rows = lib.tokenize_table(
        text_bytes,
        n,
        sep.encode()[0:1],
        n_cols,
        max_rows,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n_rows < 0:
        return None
    return ParsedTable(
        text_bytes, offsets[:n_rows], lengths[:n_rows], int(n_rows),
        n_cols, lib,
    )
