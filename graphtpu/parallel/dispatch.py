"""Dispatch single-chip algorithm requests to the multi-chip loops.

Wired into run_algorithm when PlatformConfig.num_devices > 1 (the
analogue of the reference's platform.graphblas.num-threads knob routing
work onto more OpenMP threads — here it routes rows onto more chips).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from graphtpu.algorithms.common import AlgorithmResult
from graphtpu.core.graph import Graph
from graphtpu.core.types import INT32_INF, UNREACHABLE
from graphtpu.parallel import ShardedGraph, make_mesh
from graphtpu.parallel import algorithms as dist
from graphtpu.utils.config import AlgorithmParams, PlatformConfig
from graphtpu.utils.logging import get_logger

log = get_logger("dispatch")

_sharded_cache: dict = {}


def purge_sharded(graph: Graph) -> None:
    """Release the sharded views of `graph` (host + device shards).
    Called from GraphTpuPlatform.delete_graph so multi-graph suite runs
    don't accumulate every graph ever benchmarked."""
    for key in [k for k in _sharded_cache if k[0] == id(graph)]:
        del _sharded_cache[key]


def _sharded(graph: Graph, cfg: PlatformConfig, wdtype) -> ShardedGraph:
    key = (id(graph), cfg.num_devices, np.dtype(wdtype).name)
    sg = _sharded_cache.get(key)
    if sg is None:
        mesh = make_mesh(cfg.num_devices)
        sg = ShardedGraph(graph, mesh, wdtype=wdtype)
        if cfg.shard_checkpoints and getattr(graph, "name", None):
            sg.ckpt = (cfg.intermediate_dir, graph.name)
        _sharded_cache[key] = sg
    return sg


def try_run_distributed(
    name: str,
    graph: Graph,
    params: AlgorithmParams,
    cfg: PlatformConfig,
) -> Optional[AlgorithmResult]:
    """Run `name` on a cfg.num_devices mesh; None if no distributed
    implementation exists (caller falls back to single-chip)."""
    wdtype = np.float64 if cfg.precision == "float64" else np.float32

    if name == "pr":
        sg = _sharded(graph, cfg, wdtype)
        ranks = dist.pr_dist(sg, params.damping_factor, params.num_iterations, dtype=wdtype, cfg=cfg)
        return AlgorithmResult("pr", np.asarray(ranks, dtype=np.float64), iterations=params.num_iterations)
    if name == "bfs":
        sg = _sharded(graph, cfg, wdtype)
        levels, it = dist.bfs_dist(sg, graph.dense_source(params.source_vertex), cfg)
        levels = levels.astype(np.int64)
        levels[levels == INT32_INF] = UNREACHABLE
        return AlgorithmResult("bfs", levels, iterations=it)
    if name == "sssp":
        sg = _sharded(graph, cfg, wdtype)
        d, it = dist.sssp_dist(sg, graph.dense_source(params.source_vertex), cfg)
        return AlgorithmResult("sssp", np.asarray(d, dtype=np.float64), iterations=it)
    if name == "wcc":
        sg = _sharded(graph, cfg, wdtype)
        labels, it = dist.wcc_dist(sg, cfg)
        return AlgorithmResult("wcc", graph.mapping[labels], iterations=it)
    if name == "cdlp":
        sg = _sharded(graph, cfg, wdtype)
        labels, it = dist.cdlp_dist(sg, params.max_iterations, cfg)
        return AlgorithmResult("cdlp", graph.mapping[labels], iterations=it)
    if name == "lcc":
        sg = _sharded(graph, cfg, wdtype)
        coeff = dist.lcc_dist(sg, cfg)
        return AlgorithmResult("lcc", coeff)

    log.info("no distributed implementation for %s — using single-chip path", name)
    return None
