"""Slab (padded-ELL) semiring SpMV — dense gather + row reduction.

The stock formulation of y = A ⊕.⊗ x on TPU is a gather + sorted
segment reduce over the COO stream (graphtpu/core/spops.py). This module
provides the slab alternative: per degree bucket, a dense [R, W] gather of
x at the slab's neighbor ids, a fused ⊗ with the value slab, and one
row-reduction — all dense VPU work with zero scatter/segment logic, which
XLA tiles and fuses well. Heavy-tail rows fall back to the sorted-segment
path over just their edges.

This is the TPU translation of the reference's GrB_mxm dispatch
(LAGraph calls in src/main/c/src/algorithms/*.cpp) for the iterative
algorithms; selection between "xla" (segment ops) and "slab" is runtime
config (PlatformConfig.spmv_impl), replacing the reference's compile-time
kernel #defines (cdlp_kernel.cu:5-41).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.core.graph import Graph
from graphtpu.core.semiring import Semiring
from graphtpu.ops.slab import SlabPlan, build_slab_plan


def build_pull_plan(
    graph: Graph, wdtype=np.float32, buckets=None, with_values: bool = True
) -> SlabPlan:
    """Slab plan over in-edges: centers = dst (pull order), neigh = src.

    `with_values=False` skips the value slabs (for ⊗ = second semirings,
    halving slab memory)."""
    from graphtpu.ops.slab import DEFAULT_BUCKETS

    s, d, w = graph.pull_arrays()
    centers = d.astype(np.int64)
    neigh = s
    values = w.astype(wdtype) if with_values else None
    deg = np.bincount(centers, minlength=graph.n).astype(np.int64)
    return build_slab_plan(
        centers, neigh, deg, graph.n, buckets or DEFAULT_BUCKETS, values=values
    )


def slab_spmv(
    semiring: Semiring,
    plan: SlabPlan,
    x: jax.Array,
    n: int,
    row_reduce: Optional[Callable] = None,
) -> jax.Array:
    """y[v] = ⊕_{(u,v)} (w_uv ⊗ x[u]) over the slab plan; rows with no
    edges get the monoid identity."""
    dtype = x.dtype
    ident = semiring.add.identity(dtype)
    reduce_fns = {
        "plus": lambda t: jnp.sum(t, axis=1),
        "min": lambda t: jnp.min(t, axis=1),
        "max": lambda t: jnp.max(t, axis=1),
        "lor": lambda t: jnp.max(t, axis=1),
    }
    rfn = row_reduce or reduce_fns[semiring.add.name]

    y = jnp.full((n,), ident, dtype=dtype)
    for bucket in plan.slabs:
        xv = x[jnp.maximum(bucket.slab, 0)]
        w = bucket.values if bucket.values is not None else None
        terms = semiring.mul(w, xv) if w is not None else xv
        terms = jnp.where(bucket.slab >= 0, terms, ident)
        y = y.at[bucket.rows].set(rfn(terms))
    if plan.heavy_rows is not None:
        hx = x[plan.heavy_neigh]
        terms = (
            semiring.mul(plan.heavy_values, hx)
            if plan.heavy_values is not None
            else hx
        )
        hy = semiring.add.segment_reduce(
            terms,
            plan.heavy_centers,
            num_segments=plan.heavy_rows.shape[0],
            indices_are_sorted=True,
        )
        y = y.at[plan.heavy_rows].set(hy)
    return y
