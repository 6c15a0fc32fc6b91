"""Weakly connected components — min-label propagation on the symmetrized
structure.

Semantics match the reference (wcc.cpp:53-63): directed graphs are
symmetrized via A | A^T first, then components are computed; the output
is one representative id per vertex, where only equivalence-class
consistency matters to the Graphalytics validator (wcc.cpp:27-34 writes
raw matrix indices for the same reason). We output the component's
representative as an original vertex id (min dense id's mapping).

TPU design: labels start as vertex indices; each iteration is a
min.second SpMV (segment-min of neighbor labels) followed by
min-with-self, under `lax.while_loop` until fixed point. To accelerate
convergence on high-diameter graphs, every iteration also performs one
pointer-jumping "shortcut" step (labels = labels[labels]) — a dense
gather, the classic Shiloach-Vishkin hook-and-compress move that LAGraph's
ConnectedComponents also uses internally.
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


@partial(jax.jit, static_argnames=("n", "impl"))
def _wcc_kernel(edges_src, edges_dst, indptr, n, impl="scan"):
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.spmv import pull_reduce

    labels0 = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        labels, _, it = state
        neigh_min = pull_reduce(
            "min", table_gather(labels, edges_src), edges_dst, indptr, n, INT32_INF, impl
        )
        new = jnp.minimum(labels, neigh_min)
        # pointer jumping: representative chains compress to their minimum
        new = jnp.minimum(new, table_gather(new, new))
        new = jnp.minimum(new, table_gather(new, new))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return labels, it


@register("wcc")
def wcc(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    sym = graph.symmetrized()
    coo = sym.device_pull()
    indptr = jnp.asarray(sym.pull_indptr.astype(np.int32))
    labels, niter = _wcc_kernel(coo.src, coo.dst, indptr, sym.n, cfg.spmv_impl)
    comp = graph.mapping[np.asarray(labels)]
    return AlgorithmResult("wcc", comp, iterations=int(niter))
