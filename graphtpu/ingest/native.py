"""ctypes bindings for the native C++ ingest library (native/graphtpu_io.cpp).

The native layer plays the role of the reference's C++ tooling
(src/main/c/src/tools/converter.cpp + the LAGraph_MMRead text parser):
mmap'd, multi-threaded parsing of .v/.e text files into numpy arrays. If
the shared library has not been built (``make -C native``), callers fall
back to the pandas/numpy parsers transparently.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libgraphtpu_io.so"
_lib: Optional[ctypes.CDLL] = None
_checked = False


def _lib_path() -> Path:
    here = Path(__file__).resolve().parent.parent.parent
    return here / "native" / _LIB_NAME


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    path = os.environ.get("GRAPHTPU_NATIVE_LIB", str(_lib_path()))
    if not Path(path).exists():
        return None
    lib = ctypes.CDLL(path)
    lib.gtio_count_lines.restype = ctypes.c_int64
    lib.gtio_count_lines.argtypes = [ctypes.c_char_p]
    lib.gtio_parse_vertices.restype = ctypes.c_int64
    lib.gtio_parse_vertices.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.gtio_parse_edges.restype = ctypes.c_int64
    lib.gtio_parse_edges.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,  # weighted
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_vertices(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = lib.gtio_count_lines(path.encode())
    if n < 0:
        raise IOError(f"native parser failed to open {path}")
    out = np.empty(n, dtype=np.int64)
    got = lib.gtio_parse_vertices(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
    )
    if got < 0:
        raise ValueError(f"native parser failed on {path}")
    return out[:got]


def parse_edges(path: str, weighted: bool) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    lib = _load()
    assert lib is not None
    n = lib.gtio_count_lines(path.encode())
    if n < 0:
        raise IOError(f"native parser failed to open {path}")
    src = np.empty(n, dtype=np.int64)
    dst = np.empty(n, dtype=np.int64)
    w = np.empty(n if weighted else 0, dtype=np.float64)
    got = lib.gtio_parse_edges(
        path.encode(),
        1 if weighted else 0,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    if got < 0:
        raise ValueError(f"native parser failed on {path}")
    return src[:got], dst[:got], (w[:got] if weighted else None)
