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
        # build-on-first-use for fresh checkouts (the .so is not
        # committed): one `make -C native` (~2 s, g++ baked in). Mirrors
        # the reference's compile-benchmark step (compile-benchmark.sh)
        # happening lazily; set GRAPHTPU_NATIVE_LIB=/dev/null to forbid.
        src = _lib_path().parent / "graphtpu_io.cpp"
        if path == str(_lib_path()) and src.exists():
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", str(_lib_path().parent)],
                    capture_output=True, timeout=120, check=True,
                )
            except Exception:  # noqa: BLE001 — fall back to numpy path
                return None
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
    if hasattr(lib, "gtio_sort_edges"):  # absent in pre-round-5 builds
        lib.gtio_sort_edges.restype = ctypes.c_int64
        lib.gtio_sort_edges.argtypes = [
            ctypes.c_int64,  # m
            ctypes.c_int64,  # n
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,  # has_w
            ctypes.c_int32,  # dedup
        ]
    if hasattr(lib, "gtio_relabel_edges"):
        lib.gtio_relabel_edges.restype = ctypes.c_int64
        lib.gtio_relabel_edges.argtypes = [
            ctypes.c_int64,  # n
            ctypes.POINTER(ctypes.c_int64),  # vids
            ctypes.c_int64,  # m
            ctypes.POINTER(ctypes.c_int64),  # esrc
            ctypes.POINTER(ctypes.c_int64),  # edst
            ctypes.POINTER(ctypes.c_double),  # w (may be null)
            ctypes.c_int32,  # has_w
            ctypes.c_int32,  # directed
            ctypes.POINTER(ctypes.c_int32),  # out_src
            ctypes.POINTER(ctypes.c_int32),  # out_dst
            ctypes.POINTER(ctypes.c_double),  # out_w
            ctypes.c_int64,  # cap
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


def sort_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "gtio_sort_edges")


def sort_edges(src: np.ndarray, dst: np.ndarray, w: Optional[np.ndarray],
               n: int, dedup: bool):
    """Lexsort (src, dst) with optional keep-first dedup via the native
    counting sort (O(m + n), stable — identical semantics to the numpy
    path in core/graph.py). The native call sorts in place, so the
    inputs are always COPIED here (callers pass long-lived Graph
    arrays); returns (src, dst, w) with the post-dedup length. Raises
    ValueError on out-of-range ids."""
    lib = _load()
    assert lib is not None and hasattr(lib, "gtio_sort_edges")
    src = np.array(src, dtype=np.int32, copy=True)
    dst = np.array(dst, dtype=np.int32, copy=True)
    has_w = w is not None
    if has_w:
        w = np.array(w, dtype=np.float64, copy=True)
    wp = (
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if has_w
        else ctypes.POINTER(ctypes.c_double)()
    )
    k = lib.gtio_sort_edges(
        src.shape[0],
        int(n),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        wp,
        1 if has_w else 0,
        1 if dedup else 0,
    )
    if k < 0:
        raise ValueError("edge ids outside [0, n) in native sort")
    return src[:k], dst[:k], (w[:k] if has_w else None)


def relabel_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "gtio_relabel_edges")


def relabel_edges(vertex_ids: np.ndarray, esrc: np.ndarray, edst: np.ndarray,
                  w: Optional[np.ndarray], directed: bool):
    """Fused native relabel pipeline (gtio_relabel_edges): sparse
    original-id edges -> dense-id lexsorted keep-first-deduped COO,
    including undirected doubling — identical semantics (and identical
    error conditions) to Graph.from_original_ids's numpy path. Returns
    (src int32, dst int32, w float64 | None), or None when the native
    path DECLINES (allocation failure, or a vertex id colliding with
    the hash sentinel INT64_MIN) — the caller then uses the numpy
    path, which handles any input."""
    lib = _load()
    assert lib is not None and hasattr(lib, "gtio_relabel_edges")
    vertex_ids = np.ascontiguousarray(vertex_ids, dtype=np.int64)
    esrc = np.ascontiguousarray(esrc, dtype=np.int64)
    edst = np.ascontiguousarray(edst, dtype=np.int64)
    has_w = w is not None
    if has_w:
        w = np.ascontiguousarray(w, dtype=np.float64)
    m = esrc.shape[0]
    cap = m if directed else 2 * m
    out_src = np.empty(cap, dtype=np.int32)
    out_dst = np.empty(cap, dtype=np.int32)
    out_w = np.empty(cap if has_w else 0, dtype=np.float64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    k = lib.gtio_relabel_edges(
        vertex_ids.shape[0],
        vertex_ids.ctypes.data_as(i64p),
        m,
        esrc.ctypes.data_as(i64p),
        edst.ctypes.data_as(i64p),
        w.ctypes.data_as(f64p) if has_w else f64p(),
        1 if has_w else 0,
        1 if directed else 0,
        out_src.ctypes.data_as(i32p),
        out_dst.ctypes.data_as(i32p),
        out_w.ctypes.data_as(f64p),
        cap,
    )
    if k == -4:
        raise ValueError("duplicate vertex ids in vertex file")
    if k == -2:
        raise ValueError("edge references unknown vertex id")
    if k == -3:
        raise ValueError(
            "undirected input lists an edge twice with conflicting weights"
        )
    if k in (-5, -6):
        return None  # declined — numpy fallback
    if k < 0:
        raise ValueError(f"native relabel failed ({k})")
    return out_src[:k], out_dst[:k], (out_w[:k] if has_w else None)
