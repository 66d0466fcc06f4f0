"""Build-on-first-use loader for the native fast_io library.

Compiles ``fast_io.cpp`` with the system ``g++`` into the package
directory the first time it is requested (cached thereafter; rebuilt when
the source is newer than the object). Returns None when compilation is
impossible so callers can fall back to pure Python.
"""

import ctypes
import os
import subprocess
import sysconfig
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False
_EXT = None
_EXT_TRIED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_io.cpp")
_SO = os.path.join(_DIR, "_fast_io.so")
_EXT_SRC = os.path.join(_DIR, "fast_io_ext.cpp")
_EXT_SO = os.path.join(_DIR, "_fast_io_ext.so")


def _compile():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
    ]
    subprocess.run(
        cmd, check=True, capture_output=True, timeout=120
    )


def load_library():
    """ctypes handle to the fast_io library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_SO)
            lib.tokenize_table.restype = ctypes.c_int64
            lib.tokenize_table.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char,
                ctypes.c_int32, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.parse_double_column.restype = ctypes.c_int64
            lib.parse_double_column.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def load_extension():
    """Import the CPython parser extension, or None if unavailable.

    Compiled on first use against this interpreter's headers (extensions on
    Linux do not link libpython); loaded by explicit path so the build
    artifact can live inside the package directory.
    """
    global _EXT, _EXT_TRIED
    with _LOCK:
        if _EXT is not None or _EXT_TRIED:
            return _EXT
        _EXT_TRIED = True
        try:
            if not os.path.exists(_EXT_SO) or (
                os.path.getmtime(_EXT_SO) < os.path.getmtime(_EXT_SRC)
            ):
                include = sysconfig.get_paths()["include"]
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-I", include, _EXT_SRC, "-o", _EXT_SO,
                    ],
                    check=True, capture_output=True, timeout=180,
                )
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader(
                "fast_io_ext", _EXT_SO
            )
            spec = importlib.util.spec_from_loader("fast_io_ext", loader)
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
            _EXT = mod
        except Exception:
            _EXT = None
        return _EXT
