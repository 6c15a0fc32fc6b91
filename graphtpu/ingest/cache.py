"""Binary graph cache with a skip-if-exists contract.

The analogue of the reference's two-stage idempotent ingest
(bin/sh/load-graph.sh:50-67: relabel once into graph.vtx/.mtx, convert
once into graph.vtb/.grb, skip each stage when its artifacts exist) and of
the SuiteSparse binary dump format (include/graphio.h binread/binwrite).
Here the cached artifact is a single .npz per graph holding the dense-id
push-ordered COO plus the mapping — everything needed to rebuild a Graph
without re-parsing text.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.utils.logging import get_logger

log = get_logger("cache")

CACHE_VERSION = 2


def cache_path(intermediate_dir: str | os.PathLike, graph_name: str) -> Path:
    return Path(intermediate_dir) / graph_name / "graph.npz"


def save(graph: Graph, intermediate_dir: str | os.PathLike, graph_name: str) -> Path:
    path = cache_path(intermediate_dir, graph_name)
    path.parent.mkdir(parents=True, exist_ok=True)
    # compressed + weights elided for unweighted graphs: the container
    # filesystem reads ~10 MB/s, so cache bytes dominate reload time
    tmp = path.with_name("graph.tmp.npz")
    arrays = dict(
        version=np.int64(CACHE_VERSION),
        n=np.int64(graph.n),
        directed=np.bool_(graph.directed),
        weighted=np.bool_(graph.weighted),
        src=graph.src,
        dst=graph.dst,
        mapping=graph.mapping,
    )
    if graph.weighted:
        arrays["w"] = graph.w
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    meta = {
        "version": CACHE_VERSION,
        "n": graph.n,
        "nnz": graph.nnz,
        "directed": graph.directed,
        "weighted": graph.weighted,
    }
    (path.parent / "graph.json").write_text(json.dumps(meta, indent=2))
    log.info("cached %s -> %s (%d vertices, %d stored edges)", graph_name, path, graph.n, graph.nnz)
    return path


def exists(intermediate_dir: str | os.PathLike, graph_name: str) -> bool:
    return cache_path(intermediate_dir, graph_name).exists()


def load(intermediate_dir: str | os.PathLike, graph_name: str) -> Graph:
    path = cache_path(intermediate_dir, graph_name)
    with np.load(path) as z:
        if int(z["version"]) != CACHE_VERSION:
            raise ValueError(f"{path}: cache version mismatch")
        w = z["w"] if "w" in z.files else None
        g = Graph(
            int(z["n"]),
            z["src"],
            z["dst"],
            w,
            z["mapping"],
            directed=bool(z["directed"]),
            weighted=bool(z["weighted"]),
            _presorted=True,
            _dedup=False,
        )
    # keys derived artifacts (e.g. the LCC oriented-edge cache) — without
    # it those caches silently no-op for cache-loaded graphs
    g.name = graph_name
    log.info("loaded cache %s (%s)", path, g)
    return g


def unload(intermediate_dir: str | os.PathLike, graph_name: str) -> None:
    """Delete-graph hook. Like the reference (bin/sh/unload-graph.sh:32-38,
    where the rm is deliberately commented out), cached artifacts are kept
    so repeat runs are cheap; this only validates the path."""
    path = cache_path(intermediate_dir, graph_name)
    if graph_name not in str(path):  # pragma: no cover - defensive, mirrors unload-graph.sh safety check
        raise ValueError("refusing to unload: path does not contain graph name")
