"""Single-source shortest paths — iterative min.plus relaxation.

Semantics match the reference (sssp.cpp:60-78: delta-stepping
LAGr_SingleSourceShortestPath over FP64 weights with an explicit zero
diagonal): distances from the source over directed weighted edges;
unreachable vertices serialize as the literal "infinity" (sssp.cpp:45).

TPU design: dense distance vector; each iteration relaxes every edge at
once — new[v] = min(dist[v], min over in-edges (dist[u] + w)) — one
min.plus SpMV (gather + segment-min) under `lax.while_loop` until fixed
point. This is Bellman-Ford, which on TPUs beats bucketed delta-stepping:
the whole edge stream is processed in one vectorized sweep with no
data-dependent bucketing, and the iteration count is bounded by the hop
diameter of the shortest-path tree (small for Graphalytics graphs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.algorithms.common import AlgorithmResult, float_dtype, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


@partial(jax.jit, static_argnames=("n", "impl"))
def _sssp_kernel(edges_src, edges_dst, indptr, edges_w, source, n, impl="scan"):
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.spmv import pull_reduce

    dtype = edges_w.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    dist0 = jnp.full((n,), inf, dtype=dtype).at[source].set(0.0)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        dist, _, it = state
        relaxed = pull_reduce(
            "min", table_gather(dist, edges_src) + edges_w, edges_dst, indptr, n, inf, impl
        )
        new = jnp.minimum(dist, relaxed)
        changed = jnp.any(new < dist)
        return new, changed, it + 1

    dist, _, it = jax.lax.while_loop(cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist, it


@register("sssp")
def sssp(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.source_vertex is None:
        raise ValueError("sssp requires source-vertex")
    dtype = float_dtype(cfg)
    src_dense = graph.dense_source(params.source_vertex)
    coo = graph.device_pull(wdtype=dtype)
    indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
    dist, niter = _sssp_kernel(
        coo.src, coo.dst, indptr, coo.w, jnp.int32(src_dense), graph.n, cfg.spmv_impl
    )
    return AlgorithmResult("sssp", np.asarray(dist, dtype=np.float64), iterations=int(niter))
