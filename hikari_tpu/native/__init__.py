"""Native runtime components (C++ via ctypes).

The reference outsources its BVH build to a native package (Raycore.jl);
this package holds our native equivalents. Libraries are compiled lazily on
first use with the system g++ and cached next to the sources; every native
entry point has a pure-numpy fallback so the framework degrades gracefully
on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_LIBS: dict[str, ctypes.CDLL | None] = {}


def load_native(name: str, source: str) -> ctypes.CDLL | None:
    """Load (building if needed) lib<name>.so from <source>. Returns None if
    compilation fails — callers fall back to their Python implementation."""
    if name in _LIBS:
        return _LIBS[name]
    lib_path = _DIR / f"lib{name}.so"
    src_path = _DIR / source
    try:
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < src_path.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src_path), "-o", str(lib_path)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(lib_path))
    except Exception:
        lib = None
    _LIBS[name] = lib
    return lib
