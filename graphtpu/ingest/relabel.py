"""Edge/vertex list parsing + dense-id relabeling.

Replaces the reference's DuckDB-based ETL (bin/py/relabel.py): .v files
hold one sparse uint64 vertex id per line; .e files hold
``src dst [weight]`` lines. The relabel maps original ids to dense ids in
vertex-file order (relabel.py:37-45 joins edges against vertex rowids) and
keeps the inverse bijection as the mapping array (relabel.py:52-61).

Parsing backends, fastest first: the native C++ parser (ctypes,
native/graphtpu_io.cpp — the analogue of the reference's C++ converter),
then pandas' C csv engine, then numpy. All produce identical arrays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.core.types import ORIGINAL_ID_DTYPE
from graphtpu.utils.logging import get_logger

log = get_logger("ingest")


def _parse_vertices_pandas(path: str) -> np.ndarray:
    import pandas as pd

    df = pd.read_csv(path, header=None, dtype=np.int64, names=["v"])
    return df["v"].to_numpy(dtype=ORIGINAL_ID_DTYPE)


def _parse_edges_pandas(path: str, weighted: bool):
    import pandas as pd

    names = ["src", "dst", "w"] if weighted else ["src", "dst"]
    dtypes = {"src": np.int64, "dst": np.int64}
    if weighted:
        dtypes["w"] = np.float64
    df = pd.read_csv(
        path, sep=r"\s+", header=None, names=names, dtype=dtypes, engine="c"
    )
    src = df["src"].to_numpy(dtype=ORIGINAL_ID_DTYPE)
    dst = df["dst"].to_numpy(dtype=ORIGINAL_ID_DTYPE)
    w = df["w"].to_numpy(dtype=np.float64) if weighted else None
    return src, dst, w


def _parse_vertices_numpy(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=ORIGINAL_ID_DTYPE, ndmin=1)


def _parse_edges_numpy(path: str, weighted: bool):
    # ids parsed as int64 directly — a float64 round-trip silently
    # corrupts ids above 2^53 (types.py promises int64 originals)
    ids = np.loadtxt(path, dtype=ORIGINAL_ID_DTYPE, usecols=(0, 1), ndmin=2)
    if ids.size == 0:
        return (
            np.empty(0, ORIGINAL_ID_DTYPE),
            np.empty(0, ORIGINAL_ID_DTYPE),
            np.empty(0, np.float64) if weighted else None,
        )
    src = np.ascontiguousarray(ids[:, 0])
    dst = np.ascontiguousarray(ids[:, 1])
    w = np.loadtxt(path, dtype=np.float64, usecols=(2,), ndmin=1) if weighted else None
    return src, dst, w


def parse_vertex_file(path: str) -> np.ndarray:
    try:
        from graphtpu.ingest import native

        if native.available():
            return native.parse_vertices(path)
    except Exception as e:  # pragma: no cover - fallback path
        log.debug("native vertex parser unavailable: %s", e)
    try:
        return _parse_vertices_pandas(path)
    except Exception:
        return _parse_vertices_numpy(path)


def parse_edge_file(path: str, weighted: bool):
    try:
        from graphtpu.ingest import native

        if native.available():
            return native.parse_edges(path, weighted)
    except Exception as e:  # pragma: no cover - fallback path
        log.debug("native edge parser unavailable: %s", e)
    try:
        return _parse_edges_pandas(path, weighted)
    except Exception:
        return _parse_edges_numpy(path, weighted)


def relabel(
    vertex_path: str,
    edge_path: str,
    directed: bool,
    weighted: bool,
) -> Graph:
    """Parse .v/.e files and build a dense-id Graph."""
    vertex_path, edge_path = str(vertex_path), str(edge_path)
    if not Path(vertex_path).exists():
        raise FileNotFoundError(vertex_path)
    if not Path(edge_path).exists():
        raise FileNotFoundError(edge_path)
    vids = parse_vertex_file(vertex_path)
    src, dst, w = parse_edge_file(edge_path, weighted)
    log.info(
        "relabel: %d vertices, %d edges (%s, %s)",
        vids.shape[0],
        src.shape[0],
        "directed" if directed else "undirected",
        "weighted" if weighted else "unweighted",
    )
    return Graph.from_original_ids(vids, src, dst, w, directed, weighted)
