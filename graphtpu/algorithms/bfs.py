"""Breadth-first search — level-synchronous frontier propagation.

Semantics match LAGr_BreadthFirstSearch as used by the reference
(bfs.cpp:76-80): levels from the source over out-edges (directed) or all
edges (undirected); unreachable vertices serialize as int64 max
(bfs.cpp:47-64).

TPU design: the frontier is a dense int32 {0,1} mask (dynamic-size
compacted frontiers would break XLA's static shapes — SURVEY.md §7 hard
part c). One iteration is a lor.land SpMV: next[v] = OR over in-edges of
frontier[u], then masked level assignment. The loop is a
`jax.lax.while_loop` whose condition checks frontier emptiness, giving
the same early exit as the reference's sparse frontier.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.core.types import INT32_INF, UNREACHABLE
from graphtpu.algorithms.common import AlgorithmResult, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


@partial(jax.jit, static_argnames=("n", "impl"))
def _bfs_kernel(edges_src, edges_dst, indptr, source, n, impl="scan"):
    """edges sorted by dst (pull orientation). Returns int32 levels with
    INT32_INF for unreachable vertices."""
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.spmv import pull_reduce

    levels0 = jnp.full((n,), INT32_INF, dtype=jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros((n,), dtype=jnp.int32).at[source].set(1)

    def cond(state):
        level, levels, frontier, nonempty = state
        return nonempty & (level < n)

    def body(state):
        level, levels, frontier, _ = state
        reached = pull_reduce(
            "max", table_gather(frontier, edges_src), edges_dst, indptr, n, jnp.int32(0), impl
        )
        new_frontier = jnp.where(levels == INT32_INF, reached, 0)
        levels = jnp.where(new_frontier == 1, level + 1, levels)
        nonempty = jnp.any(new_frontier == 1)
        return level + 1, levels, new_frontier, nonempty

    level, levels, frontier, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), levels0, frontier0, jnp.bool_(True))
    )
    return levels, level


@register("bfs")
def bfs(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.source_vertex is None:
        raise ValueError("bfs requires source-vertex")
    src_dense = graph.dense_source(params.source_vertex)
    coo = graph.device_pull()
    indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
    levels, niter = _bfs_kernel(
        coo.src, coo.dst, indptr, jnp.int32(src_dense), graph.n, cfg.spmv_impl
    )
    levels = np.asarray(levels).astype(np.int64)
    levels[levels == INT32_INF] = UNREACHABLE
    return AlgorithmResult("bfs", levels, iterations=int(niter))
