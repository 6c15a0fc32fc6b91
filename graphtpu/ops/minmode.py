"""Degree-bucketed min-mode label selection — the CDLP hot kernel.

The reference's two native formulations of "smallest most-frequent
neighbor label" are a global merge-sort + run-length scan on CPU
(LAGraph_cdlp.c:286-323) and per-row hash tables on GPU
(cdlp_kernel.cu:419-512, shared-mem variant :1031-1140). Neither maps to
TPU: global sorts of the full incidence stream are O(nnz log² nnz) with
poor constants, and hash probing is scalar.

TPU formulation: bucket rows by degree into padded-ELL *slabs* (the TPU
analogue of the CUDA fork's degree-dependent kernel dispatch,
cdlp_kernel.cu:611-677). For a bucket of R rows with width W:

1. gather labels into an [R, W] slab (pads = INT32_INF),
2. `jnp.sort` along axis 1 — XLA lowers to a vectorized bitonic network,
   every row independent, O(W log² W) VPU work instead of O(W²) all-pairs,
3. run-length scan along the row (cummax of run starts — the same trick
   as the global-sort path but row-local),
4. two masked row reductions: max run length, then min label among
   arg-max runs (the spec's smallest-most-frequent tie-break,
   LAGraph_cdlp.c:40-45).

Rows heavier than the largest bucket go through the global sorted-segment
path restricted to just those rows (power-law graphs have few such rows).

Everything is static-shaped; the iteration loop is a `lax.while_loop`
with fixed-point early exit (LAGraph_cdlp.c:328-332).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.core.types import INT32_INF
from graphtpu.ops.slab import DEFAULT_BUCKETS, SlabPlan, build_slab_plan  # noqa: F401


def _slab_minmode(labels: jax.Array, slab: jax.Array) -> jax.Array:
    """Per-row smallest-most-frequent label over a padded slab [R, W]."""
    lab = jnp.where(slab >= 0, labels[jnp.maximum(slab, 0)], INT32_INF)
    s = jnp.sort(lab, axis=1)
    w = s.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    is_start = jnp.concatenate(
        [jnp.ones((s.shape[0], 1), dtype=bool), s[:, 1:] != s[:, :-1]], axis=1
    )
    is_last = jnp.concatenate(
        [s[:, 1:] != s[:, :-1], jnp.ones((s.shape[0], 1), dtype=bool)], axis=1
    )
    run_start = jax.lax.cummax(jnp.where(is_start, col, -1), axis=1)
    run_len = col - run_start + 1
    valid_run = is_last & (s != INT32_INF)
    counts = jnp.where(valid_run, run_len, 0)
    max_count = jnp.max(counts, axis=1, keepdims=True)
    cand = jnp.where(valid_run & (counts == max_count), s, INT32_INF)
    return jnp.min(cand, axis=1)


def _heavy_minmode(labels, heavy_centers, heavy_neigh, num_heavy):
    """Global-sort min-mode restricted to the heavy rows' incidence."""
    from graphtpu.algorithms.cdlp import _run_extents

    lab = labels[heavy_neigh]
    c_s, l_s = jax.lax.sort((heavy_centers, lab), num_keys=2)
    counts = _run_extents(c_s, l_s)
    max_count = jax.ops.segment_max(
        counts, c_s, num_segments=num_heavy, indices_are_sorted=True
    )
    is_best = counts == max_count[c_s]
    return jax.ops.segment_min(
        jnp.where(is_best, l_s, INT32_INF),
        c_s,
        num_segments=num_heavy,
        indices_are_sorted=True,
    )


def cdlp_step(labels: jax.Array, plan: SlabPlan) -> jax.Array:
    """One synchronous CDLP iteration: new labels for every vertex."""
    new = labels
    for bucket in plan.slabs:
        new = new.at[bucket.rows].set(_slab_minmode(labels, bucket.slab))
    if plan.heavy_rows is not None:
        num_heavy = plan.heavy_rows.shape[0]
        new = new.at[plan.heavy_rows].set(
            _heavy_minmode(labels, plan.heavy_centers, plan.heavy_neigh, num_heavy)
        )
    return new


@partial(jax.jit, static_argnames=("itermax",))
def _cdlp_slab_kernel(plan: SlabPlan, labels0, itermax):
    def cond(state):
        _, changed, it = state
        return changed & (it < itermax)

    def body(state):
        labels, _, it = state
        new = cdlp_step(labels, plan)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return labels, it


def cdlp_slab_run(graph, centers, neigh, deg, itermax, cfg):
    """Entry point used by graphtpu/algorithms/cdlp.py. Returns (labels, it)."""
    buckets = tuple(cfg.slab_buckets) if cfg and cfg.slab_buckets else DEFAULT_BUCKETS
    plan = build_slab_plan(centers, neigh, deg.astype(np.int64), graph.n, buckets)
    labels0 = jnp.arange(graph.n, dtype=jnp.int32)
    labels, it = _cdlp_slab_kernel(plan, labels0, int(itermax))
    return labels, it
