"""PageRank — the Graphalytics variant with dangling-vertex redistribution.

Semantics match LAGr_PageRankGX as called by the reference (pr.cpp:58-63):
fixed iteration count, damping factor d, importance from in-neighbors
scaled by out-degree, and the rank mass of sink (out-degree-0) vertices
redistributed uniformly each iteration:

    r_{t+1}(v) = (1-d)/n + d * ( sum_{u->v} r_t(u)/outdeg(u)
                                 + sum_{outdeg(u)=0} r_t(u)/n )

TPU design: one plus.second SpMV per iteration over pull-ordered edges
(segment-sum by destination), a psum-style scalar reduction for the
dangling mass, all inside `jax.lax.fori_loop` (exact iteration count —
no convergence check, per the Graphalytics spec).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.algorithms.common import AlgorithmResult, float_dtype, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


@partial(jax.jit, static_argnames=("n", "num_iterations"))
def _pr_slab_kernel(plan, out_deg, damping, n, num_iterations):
    """Slab (padded-ELL) variant: the pull sum is a dense per-bucket gather
    + row-sum (graphtpu/ops/spmv.py) instead of a segment scatter."""
    from graphtpu.core.semiring import PLUS_SECOND
    from graphtpu.ops.spmv import slab_spmv

    dtype = damping.dtype
    inv_n = jnp.asarray(1.0 / n, dtype)
    teleport = (1.0 - damping) * inv_n
    is_dangling = out_deg == 0
    safe_deg = jnp.where(is_dangling, 1, out_deg).astype(dtype)
    inv_deg = jnp.where(is_dangling, 0.0, 1.0 / safe_deg)

    r0 = jnp.full((n,), inv_n, dtype=dtype)

    def body(_, r):
        pulled = slab_spmv(PLUS_SECOND, plan, r * inv_deg, n)
        dangling_mass = jnp.sum(jnp.where(is_dangling, r, 0.0))
        return teleport + damping * (pulled + dangling_mass * inv_n)

    return jax.lax.fori_loop(0, num_iterations, body, r0)


@partial(jax.jit, static_argnames=("n", "num_iterations", "impl"))
def _pr_kernel(edges_src, edges_dst, indptr, out_deg, damping, n, num_iterations, impl="scan"):
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    dtype = damping.dtype
    inv_n = jnp.asarray(1.0 / n, dtype)
    teleport = (1.0 - damping) * inv_n
    is_dangling = out_deg == 0
    # 1/outdeg with danglings mapped to 0 contribution via where
    safe_deg = jnp.where(is_dangling, 1, out_deg).astype(dtype)
    inv_deg = jnp.where(is_dangling, 0.0, 1.0 / safe_deg)

    r0 = jnp.full((n,), inv_n, dtype=dtype)

    def body(_, r):
        contrib = r * inv_deg
        pulled = pull_reduce(
            "sum", table_gather(contrib, edges_src, chunk=EDGE_STREAM_CHUNK), edges_dst, indptr, n, jnp.zeros((), dtype), impl
        )
        dangling_mass = jnp.sum(jnp.where(is_dangling, r, 0.0))
        return teleport + damping * (pulled + dangling_mass * inv_n)

    return jax.lax.fori_loop(0, num_iterations, body, r0)


def _pull_plan_cached(graph: Graph, dtype):
    """Memoize the slab pull plan on the Graph (host-side bucketing + the
    full H2D slab transfer cost tens of seconds at graph scale), so timed
    repetitions after prepare() don't rebuild it — the same contract as
    bfs_adaptive_prep/sssp_adaptive_prep."""
    cache = getattr(graph, "_pull_plan_cache", None)
    if cache is None:
        cache = graph._pull_plan_cache = {}
    key = np.dtype(dtype).name
    plan = cache.get(key)
    if plan is None:
        from graphtpu.ops.spmv import build_pull_plan

        plan = build_pull_plan(graph, wdtype=dtype, with_values=False)
        cache[key] = plan
    return plan


@register("pr")
def pr(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.damping_factor is None or params.num_iterations is None:
        raise ValueError("pr requires damping-factor and num-iterations")
    dtype = float_dtype(cfg)
    out_deg = jnp.asarray(graph.out_degree.astype(np.int32))
    pr_impl = getattr(cfg, "pr_impl", "auto")
    if pr_impl in ("auto", "slab") or cfg.spmv_impl == "slab":
        plan = _pull_plan_cached(graph, dtype)
        ranks = _pr_slab_kernel(
            plan,
            out_deg,
            jnp.asarray(params.damping_factor, dtype),
            graph.n,
            int(params.num_iterations),
        )
    else:
        coo = graph.device_pull(wdtype=dtype)
        indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
        ranks = _pr_kernel(
            coo.src,
            coo.dst,
            indptr,
            out_deg,
            jnp.asarray(params.damping_factor, dtype),
            graph.n,
            int(params.num_iterations),
            cfg.spmv_impl,
        )
    return AlgorithmResult("pr", np.asarray(ranks), iterations=params.num_iterations)
