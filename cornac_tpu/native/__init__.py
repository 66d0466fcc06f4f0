"""Native (C++) host-side utilities, built on demand with the system g++.

See ``build.py``; consumers must tolerate the library being unavailable
(no compiler, read-only filesystem) and fall back to pure Python.
"""

from .build import load_library  # noqa: F401
