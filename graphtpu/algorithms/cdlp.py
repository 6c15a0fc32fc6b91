"""Community detection by label propagation (CDLP), Graphalytics semantics.

Semantics follow the vendored CPU oracle LAGraph_cdlp.c exactly:
synchronous updates; per iteration each vertex adopts the *smallest among
the most frequent* labels of its neighbors (LAGraph_cdlp.c:40-45 — the
deterministic tie-break mandated by the Graphalytics spec); for directed
graphs both in- and out-neighbors count, so a bidirectionally-connected
neighbor's label counts twice (LAGraph_cdlp.c:47-50, 276-284); vertices
with no neighbors keep their label; early fixed-point exit before itermax
(LAGraph_cdlp.c:328-332). Labels are dense vertex indices during compute
and are re-mapped to original ids at output (cdlp.cpp:45-49).

TPU design (sort path): the reference CPU code sorts (row, label) pairs
with a parallel merge sort and run-length-scans the result
(LAGraph_cdlp.c:286-323); the CUDA fork replaces the sort with per-row
hash tables (cdlp_kernel.cu:419-512). Hash tables are a poor fit for TPU
(no atomics, scalar probing); instead we keep the sort formulation but
make every stage a vectorized primitive: one two-key `lax.sort` of
(center, label), run-length extents via forward/backward prefix scans,
then two segment reductions (max count per center; min label among
arg-max runs). The (center, neighbor) incidence stream is precomputed
once on the host — for directed graphs it is the concatenation of pull
and push orientations, giving the in+out multiset for free.

The degree-bucketed slab path (graphtpu/ops/minmode.py) — the TPU
analogue of the fork's shared-memory hash kernel — replaces the global
sort with dense per-row all-pairs counting for short rows; it is selected
by PlatformConfig.cdlp_impl when available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.core.types import INT32_INF
from graphtpu.algorithms.common import AlgorithmResult, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


def build_incidence(graph: Graph):
    """(centers, neighbors) sorted by center; directed graphs count both
    directions (in + out multiset union). Memoized on the Graph — the
    O(E) host sort/concat is shared by the single-chip kernels and the
    distributed incidence/degree views (released with the Graph)."""
    cached = getattr(graph, "_incidence_stream", None)
    if cached is not None:
        return cached
    if graph.directed:
        centers = np.concatenate([graph.dst, graph.src])
        neigh = np.concatenate([graph.src, graph.dst])
        perm = np.argsort(centers, kind="stable")
        centers, neigh = centers[perm], neigh[perm]
    else:
        s, d, _ = graph.pull_arrays()
        centers, neigh = d, s
    out = (centers.astype(np.int32), neigh.astype(np.int32))
    graph._incidence_stream = out
    return out


def _run_extents(c_s: jax.Array, l_s: jax.Array):
    """Per-element run length for equal (center, label) runs in a sorted
    stream — the scan-based replacement for the reference's serial
    run-length loop (LAGraph_cdlp.c:300-323)."""
    m = c_s.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (c_s[1:] != c_s[:-1]) | (l_s[1:] != l_s[:-1]),
        ]
    )
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), dtype=bool)])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, -1))
    run_end = -jax.lax.cummax(jnp.where(is_end, -idx, -(m + 1))[::-1])[::-1]
    return run_end - run_start + 1


@partial(jax.jit, static_argnames=("n", "itermax", "skip_checks"))
def _cdlp_sort_kernel(centers, neigh, deg, n, itermax, skip_checks=0):
    """skip_checks: assume not-converged for the first k iterations — the
    reference's optimized_skip_checkequal trick (cdlp_kernel.cu:1254-1271).
    There it saves a device→host flag copy per iteration; here the loop is
    one dispatch so it only skips the equality reduction itself."""
    labels0 = jnp.arange(n, dtype=jnp.int32)
    has_neighbors = deg > 0

    def cond(state):
        _, changed, it = state
        return changed & (it < itermax)

    def body(state):
        labels, _, it = state
        from graphtpu.ops.gather import table_gather

        lab = table_gather(labels, neigh)
        c_s, l_s = jax.lax.sort((centers, lab), num_keys=2)
        counts = _run_extents(c_s, l_s)
        max_count = jax.ops.segment_max(
            counts, c_s, num_segments=n, indices_are_sorted=True
        )
        is_best = counts == table_gather(max_count, c_s)
        best_label = jax.ops.segment_min(
            jnp.where(is_best, l_s, INT32_INF),
            c_s,
            num_segments=n,
            indices_are_sorted=True,
        )
        new = jnp.where(has_neighbors, best_label, labels)
        changed = (it < skip_checks) | jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return labels, it


@register("cdlp")
def cdlp(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.max_iterations is None:
        raise ValueError("cdlp requires max-iterations")
    centers, neigh = build_incidence(graph)
    deg = np.bincount(centers, minlength=graph.n).astype(np.int32)
    if centers.shape[0] == 0:
        # edgeless graph: every vertex keeps its own label (the kernels'
        # length-0 streams would otherwise fail shape checks at trace)
        return AlgorithmResult(
            "cdlp", graph.mapping.copy(), iterations=0
        )

    impl = cfg.cdlp_impl
    if impl in ("auto", "adaptive") and cfg.iteration_timing:
        impl = "adaptive-host"  # per-iteration timing needs host stepping
    if impl in ("auto", "adaptive"):
        # convergence-adaptive: full slab steps while labels churn, then
        # compacted active-set steps, all inside ONE jit dispatch
        # (graphtpu/ops/active.py) — the runtime analogue of the CUDA
        # fork's iteration-indexed kernel switch (cdlp_kernel.cu:1238-1243)
        from graphtpu.ops.active import cdlp_adaptive_device_run

        labels, it = cdlp_adaptive_device_run(
            graph, centers, neigh, deg, int(params.max_iterations), cfg
        )
    elif impl == "adaptive-host":
        from graphtpu.ops.active import cdlp_adaptive_run

        labels, it = cdlp_adaptive_run(
            graph, centers, neigh, deg, int(params.max_iterations), cfg
        )
    elif impl == "slab":
        from graphtpu.ops.minmode import cdlp_slab_run

        labels, it = cdlp_slab_run(
            graph, centers, neigh, deg, int(params.max_iterations), cfg
        )
    elif impl == "sort":
        labels, it = _cdlp_sort_kernel(
            jnp.asarray(centers),
            jnp.asarray(neigh),
            jnp.asarray(deg),
            graph.n,
            int(params.max_iterations),
            int(cfg.skip_convergence_checks),
        )
    else:
        raise ValueError(
            f"unknown cdlp-impl {impl!r}; expected auto|adaptive|adaptive-host|slab|sort"
        )
    communities = graph.mapping[np.asarray(labels)]
    return AlgorithmResult("cdlp", communities, iterations=int(it))
