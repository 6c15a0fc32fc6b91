"""Platform lifecycle — the in-process analogue of the reference's
8-method Java `Platform` implementation (GraphblasPlatform.java:27-165).

The reference crosses three process boundaries per run (JVM → shell →
native binary); here the whole lifecycle is one process, but the method
surface, the metric contract (Processing starts/ends markers around the
kernel, GraphblasCollector.java:54-95), and the artifact layout
(./intermediate/<graph>/ cache) are preserved.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Dict, Optional

from graphtpu.algorithms.common import AlgorithmResult, run_algorithm
from graphtpu.core.graph import Graph
from graphtpu.harness.collector import Collector
from graphtpu.ingest import cache as cache_mod
from graphtpu.ingest.loader import load_graph_from_spec
from graphtpu.utils.config import GraphSpec, PlatformConfig
from graphtpu.utils.logging import get_logger
from graphtpu.utils.timers import proc_time_end, proc_time_start

log = get_logger("platform")

PLATFORM_NAME = "graphtpu"  # analogue of GraphblasPlatform.java:31


@dataclasses.dataclass
class BenchmarkMetrics:
    """Processing time in seconds (3-decimal ceiling) — the single
    first-class metric, matching GraphblasCollector.java:87-91."""

    processing_time_seconds: float = -1.0
    makespan_seconds: float = -1.0
    iterations: Optional[int] = None


class GraphTpuPlatform:
    """verifySetup / loadGraph / prepare / startup / run / finalize /
    deleteGraph / terminate — the reference Platform lifecycle."""

    def __init__(self, config: Optional[PlatformConfig] = None):
        self.config = config or PlatformConfig()
        self.graphs: Dict[str, Graph] = {}
        self.collector = Collector()
        self._prepared: set = set()

    # -- lifecycle ---------------------------------------------------------

    def verify_setup(self) -> None:
        import jax

        log.info("platform %s: %d device(s): %s", PLATFORM_NAME, len(jax.devices()), jax.devices())

    def load_graph(self, spec: GraphSpec) -> Graph:
        """GraphblasPlatform.loadGraph (GraphblasPlatform.java:40-58):
        one-time per-graph ETL into the intermediate dir, idempotent."""
        g = load_graph_from_spec(spec, intermediate_dir=self.config.intermediate_dir)
        self.graphs[spec.name] = g
        return g

    def delete_graph(self, graph_name: str) -> None:
        """GraphblasPlatform.deleteGraph — keeps cache artifacts like
        unload-graph.sh:32-38. In-memory views (including any sharded
        multi-chip partitions) are released."""
        g = self.graphs.pop(graph_name, None)
        if g is not None:
            from graphtpu.parallel.dispatch import purge_sharded

            purge_sharded(g)
        cache_mod.unload(self.config.intermediate_dir, graph_name)

    def prepare(self, spec: GraphSpec, algorithm: str) -> None:
        """Warm-up: run the algorithm once so XLA compilation (and the
        one-time device transfer of graph views) happens outside the
        processing window. The reference's precompiled C binaries never
        pay a JIT cost between the markers; this keeps the metric
        comparable. Results are discarded; jit caching keyed on shapes
        makes the subsequent timed run compile-free."""
        key = (spec.name, algorithm)
        if key in self._prepared:
            return
        graph = self.graphs.get(spec.name) or self.load_graph(spec)
        run_algorithm(algorithm, graph, spec.params.get(algorithm), self.config)
        self._prepared.add(key)

    def startup(self, log_dir: Optional[str] = None) -> None:
        self.collector.start_logging(log_dir)

    def run(self, spec: GraphSpec, algorithm: str) -> AlgorithmResult:
        """GraphblasPlatform.run (GraphblasPlatform.java:88-141): execute
        one algorithm job, emitting the processing-time markers around the
        kernel like the C++ binaries (bfs.cpp:105-107)."""
        graph = self.graphs.get(spec.name) or self.load_graph(spec)
        params = spec.params.get(algorithm)
        profiler_ctx = None
        if self.config.profile_dir:
            import jax

            profiler_ctx = jax.profiler.trace(self.config.profile_dir)
            profiler_ctx.__enter__()
        try:
            proc_time_start(self.collector.stream)
            result = run_algorithm(algorithm, graph, params, self.config)
            proc_time_end(self.collector.stream)
        finally:
            if profiler_ctx is not None:
                profiler_ctx.__exit__(None, None, None)
        return result

    def finalize(self) -> BenchmarkMetrics:
        """GraphblasPlatform.finalize (GraphblasPlatform.java:144-154)."""
        metrics = BenchmarkMetrics()
        metrics.processing_time_seconds = self.collector.collect_processing_time()
        self.collector.stop_logging()
        return metrics

    def terminate(self) -> None:
        self.collector.stop_logging()
