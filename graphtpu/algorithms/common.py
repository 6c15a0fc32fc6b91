"""Algorithm registry, results, and serialization.

The reference implements each algorithm as a standalone C++ main()
(src/main/c/src/algorithms/{bfs,pr,wcc,sssp,lcc,cdlp}.cpp) with a common
skeleton: parse args -> load matrix + mapping -> emit processing-time
markers around the kernel -> serialize per-vertex results through the
inverse mapping. Here the skeleton is `run_algorithm`, the kernels are
jitted JAX programs, and the serializers replicate each C++ serializer's
exact output format (original-id per line, int64-max for unreachable BFS,
literal "infinity" for SSSP, 16-significant-digit scientific notation for
floats — bfs.cpp:47-64, sssp.cpp:37-47, pr.cpp:27-44).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.core.types import UNREACHABLE
from graphtpu.utils.config import AlgorithmParams, PlatformConfig
from graphtpu.utils.timers import ComputationTimer


@dataclasses.dataclass
class AlgorithmResult:
    """Per-vertex results in dense-id order plus metadata."""

    algorithm: str
    values: np.ndarray            # dense-id order, one value per vertex
    iterations: Optional[int] = None

    def _columns(self, graph: Graph):
        """(ids, values) with the per-algorithm output coercions applied
        array-at-a-time (int64-max unreachable for BFS, bfs.cpp:61)."""
        vals = np.asarray(self.values)
        if self.algorithm == "bfs":
            v = vals.astype(np.int64, copy=False)
            vals = np.where((v < 0) | (v >= UNREACHABLE), UNREACHABLE, v)
        elif self.algorithm in ("wcc", "cdlp"):
            vals = vals.astype(np.uint64, copy=False)
        else:
            vals = vals.astype(np.float64, copy=False)
        return graph.mapping, vals

    def write(self, graph: Graph, path: str) -> None:
        """Serialize `original_id value` per line — vectorized (chunked
        pandas to_csv: datagen-scale outputs in seconds); formats match
        the C++ serializers exactly (%.15e scientific for floats,
        pr.cpp:27-28; literal "infinity" for SSSP, sssp.cpp:45)."""
        import pandas as pd

        ids, vals = self._columns(graph)
        chunk = 1 << 21
        with open(path, "w") as f:
            for a in range(0, graph.n, chunk):
                df = pd.DataFrame(
                    {"id": ids[a : a + chunk], "v": vals[a : a + chunk]},
                    copy=False,
                )
                s = df.to_csv(
                    None, sep=" ", header=False, index=False, float_format="%.15e"
                )
                if self.algorithm == "sssp":
                    # %.15e renders inf as "inf"; the contract is the
                    # literal "infinity" (sssp.cpp:45). The value column is
                    # the only place " inf\n" can appear.
                    s = s.replace(" inf\n", " infinity\n")
                f.write(s)



# Populated by each algorithm module at import: name -> fn(graph, params, cfg)
ALGORITHMS: Dict[str, Callable[[Graph, AlgorithmParams, PlatformConfig], AlgorithmResult]] = {}


def register(name: str):
    def deco(fn):
        ALGORITHMS[name] = fn
        return fn

    return deco


def run_algorithm(
    name: str,
    graph: Graph,
    params: Optional[AlgorithmParams] = None,
    cfg: Optional[PlatformConfig] = None,
) -> AlgorithmResult:
    """Run one algorithm kernel (no timing markers — the harness owns the
    processing-time window, matching how the reference binaries emit the
    markers immediately around the kernel call, bfs.cpp:105-107)."""
    # import side effect: registers all algorithms
    import graphtpu.algorithms.bfs  # noqa: F401
    import graphtpu.algorithms.pr  # noqa: F401
    import graphtpu.algorithms.wcc  # noqa: F401
    import graphtpu.algorithms.sssp  # noqa: F401
    import graphtpu.algorithms.cdlp  # noqa: F401
    import graphtpu.algorithms.lcc  # noqa: F401

    name = name.lower()
    if name not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {name!r}; have {sorted(ALGORITHMS)}")
    params = params or AlgorithmParams()
    cfg = cfg or PlatformConfig()
    if getattr(cfg, "fault_injection", None) == f"hang:{name}":
        # failure-detection test hook (platform.graphtpu.fault-injection):
        # simulate a wedged kernel so timeout/kill paths can be exercised
        import time as _time

        while True:
            _time.sleep(3600)
    with ComputationTimer(f"Processing ({name})"):
        if cfg.num_devices > 1:
            from graphtpu.parallel.dispatch import try_run_distributed

            result = try_run_distributed(name, graph, params, cfg)
            if result is not None:
                return result
        return ALGORITHMS[name](graph, params, cfg)


def float_dtype(cfg: PlatformConfig):
    return np.float64 if cfg.precision == "float64" else np.float32
