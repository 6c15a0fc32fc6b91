"""Degree-bucketed min-mode label selection — the CDLP hot kernel.

The reference's two native formulations of "smallest most-frequent
neighbor label" are a global merge-sort + run-length scan on CPU
(LAGraph_cdlp.c:286-323) and per-row hash tables on GPU
(cdlp_kernel.cu:419-512, shared-mem variant :1031-1140). Neither maps to
TPU: global sorts are expensive and hash probing is scalar.

TPU formulation, shaped by measured v5e primitive costs (gather ~7 ns/el,
scatter ~4.3 ns/el, row-wise bitonic sort ~0.1 ns/el, prefix scans
~1.4 ns/el):

* rows bucketed by degree into padded-ELL slabs (graphtpu/ops/slab.py,
  x2-spaced widths -> <=2x padding) — the TPU analogue of the CUDA fork's
  degree-dependent kernel dispatch (cdlp_kernel.cu:611-677);
* per bucket: one [R, W] label gather (the unavoidable cost), `jnp.sort`
  along the row (vectorized bitonic — near free), run-length scan via
  row-local cummax, two masked row reductions for the
  smallest-most-frequent tie-break (LAGraph_cdlp.c:40-45);
* heavy-tail rows (degree > largest bucket): pair-sort of (center, label)
  + packed-scan segmented reductions (graphtpu/ops/scan_reduce.py idea) —
  no segment ops, no per-edge max-count gather;
* results assembled with one static inverse-permutation gather instead of
  per-bucket scatters (slab.assemble);
* iteration 0 on duplicate-free incidence (undirected graphs): labels are
  the identity, so the mode is simply the minimum neighbor id — computed
  without any gather (the generalization of the CUDA fork's
  cdlp_first_iteration_findmin, cdlp_kernel.cu:76-117).

The iteration loop is a `lax.while_loop` with fixed-point early exit
(LAGraph_cdlp.c:328-332).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.core.types import INT32_INF
from graphtpu.ops.gather import table_gather
from graphtpu.ops.slab import SlabPlan, assemble, build_slab_plan  # noqa: F401

_M31 = (1 << 31) - 1


def _slab_minmode(labels: jax.Array, slab: jax.Array) -> jax.Array:
    """Per-row smallest-most-frequent label over a transposed slab [W, R]."""
    lab = jnp.where(slab >= 0, table_gather(labels, jnp.maximum(slab, 0)), INT32_INF)
    return _rowwise_minmode(lab)


def _rowwise_minmode(lab: jax.Array) -> jax.Array:
    """Min-mode along axis 0 of a [W, R] slab (rows on the lane axis, so
    every step vectorizes across R); INT32_INF entries are padding."""
    s = jnp.sort(lab, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    ones = jnp.ones((1, s.shape[1]), dtype=bool)
    diff = s[1:, :] != s[:-1, :]
    is_start = jnp.concatenate([ones, diff], axis=0)
    is_last = jnp.concatenate([diff, ones], axis=0)
    run_start = jax.lax.cummax(jnp.where(is_start, col, -1), axis=0)
    run_len = col - run_start + 1
    valid_run = is_last & (s != INT32_INF)
    counts = jnp.where(valid_run, run_len, 0)
    max_count = jnp.max(counts, axis=0, keepdims=True)
    cand = jnp.where(valid_run & (counts == max_count), s, INT32_INF)
    return jnp.min(cand, axis=0)


def _bits(v: int) -> int:
    return max(int(v).bit_length(), 1)


def stream_minmode(labels, centers, neigh, indptr, n, identity=False):
    """Min-mode per segment of a center-sorted incidence stream via pair
    sort + packed prefix scans (segment boundaries are static).

    `centers` are ascending local segment ids [m], `neigh` global vertex
    ids [m], `indptr` [H+1] the static segment starts. Returns the winner
    label per segment [H]; empty segments yield junk (callers mask them).
    `identity=True` skips the label gather (labels[neigh] == neigh when
    the labeling is the identity — iteration 0).

    Fast path: when (center, count, ~label) fits one int64 key, a single
    forward cummax selects the (max count, min label) winner per segment
    directly; otherwise fall back to the fwd+bwd max-count pass + winner
    pass. Shared by the heavy-tail rows of the slab plan and the
    convergence-adaptive active-set steps (graphtpu/ops/active.py)."""
    lab = neigh if identity else table_gather(labels, neigh)
    c_s, l_s = jax.lax.sort((centers, lab), num_keys=2)  # c_s == centers
    m = l_s.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)

    seg_start = jnp.zeros((m,), dtype=bool).at[indptr[:-1]].set(True)
    is_start = seg_start | jnp.concatenate(
        [jnp.ones((1,), bool), l_s[1:] != l_s[:-1]]
    )
    is_last = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, -1))
    count = idx - run_start + 1            # run length, valid at is_last

    num_rows = indptr.shape[0] - 1
    ends = jnp.maximum(indptr[1:] - 1, 0)
    c64 = c_s.astype(jnp.int64)

    hb, cb, lb = _bits(num_rows), _bits(m), _bits(n)
    if hb + cb + lb <= 63:
        # one-scan winner: key = center | count | inverted label
        lmask = (1 << lb) - 1
        pk = jnp.where(
            is_last,
            (c64 << (cb + lb))
            | (count.astype(jnp.int64) << lb)
            | (lmask - l_s.astype(jnp.int64)),
            c64 << (cb + lb),
        )
        wins = jax.lax.cummax(pk)
        return (lmask - (table_gather(wins, ends) & lmask)).astype(jnp.int32)

    # fallback: fwd+bwd max-count, then winner pass (96-bit logical key)
    pk = jnp.where(is_last, (c64 << 31) | count.astype(jnp.int64), c64 << 31)
    fwd = jax.lax.cummax(pk)
    h = num_rows
    c_flip = ((h - 1) - c64)[::-1]      # ascending along the reversed stream
    pk_rev = jnp.where(
        is_last[::-1],
        (c_flip << 31) | count.astype(jnp.int64)[::-1],
        c_flip << 31,
    )
    bwd = jax.lax.cummax(pk_rev)[::-1]
    maxc = jnp.maximum(fwd & _M31, bwd & _M31).astype(jnp.int32)

    eligible = is_last & (count == maxc) & (l_s != INT32_INF)
    pkb = jnp.where(
        eligible,
        (c64 << 31) | (_M31 - l_s).astype(jnp.int64),
        c64 << 31,
    )
    wins = jax.lax.cummax(pkb)
    return (_M31 - (table_gather(wins, ends) & _M31)).astype(jnp.int32)


def _heavy_minmode(labels, plan: SlabPlan, n: int):
    """Min-mode over the heavy-tail incidence stream (rows heavier than
    the largest slab bucket)."""
    return stream_minmode(
        labels, plan.heavy_centers, plan.heavy_neigh, plan.heavy_indptr, n
    )


def _iter0_minmode(plan: SlabPlan, labels0: jax.Array) -> jax.Array:
    """Iteration 0 on duplicate-free incidence: every neighbor label is
    distinct, so the min-mode is the minimum neighbor id — no gather."""
    parts = [
        jnp.min(jnp.where(b.slab >= 0, b.slab, INT32_INF), axis=0) for b in plan.slabs
    ]
    heavy = None
    if plan.heavy_rows is not None:
        from graphtpu.ops.scan_reduce import seg_min_scan

        heavy = seg_min_scan(
            plan.heavy_neigh, plan.heavy_centers, plan.heavy_indptr, jnp.int32(INT32_INF)
        )
    rest = labels0[plan.rest_rows] if plan.rest_rows is not None else None
    return assemble(plan, parts, heavy, rest)


def _iter0_mode(plan: SlabPlan, labels0: jax.Array) -> jax.Array:
    """Gather-free iteration 0 for duplicate-BEARING incidence (directed
    graphs: bidirectional edges appear twice, LAGraph_cdlp.c:47-50). The
    identity labeling makes labels[neigh] == neigh, so the full min-mode
    runs directly on the stored slab ids — skipping the label gather
    that dominates a full step. The directed generalization of the
    fork's first-iteration optimization (cdlp_kernel.cu:76-117)."""
    parts = [
        _rowwise_minmode(jnp.where(b.slab >= 0, b.slab, INT32_INF))
        for b in plan.slabs
    ]
    heavy = None
    if plan.heavy_rows is not None:
        heavy = stream_minmode(
            None, plan.heavy_centers, plan.heavy_neigh, plan.heavy_indptr,
            labels0.shape[0], identity=True,
        )
    rest = labels0[plan.rest_rows] if plan.rest_rows is not None else None
    return assemble(plan, parts, heavy, rest)


def cdlp_step(labels: jax.Array, plan: SlabPlan) -> jax.Array:
    """One synchronous CDLP iteration: new labels for every vertex."""
    parts = [_slab_minmode(labels, b.slab) for b in plan.slabs]
    heavy = (
        _heavy_minmode(labels, plan, labels.shape[0])
        if plan.heavy_rows is not None
        else None
    )
    rest = labels[plan.rest_rows] if plan.rest_rows is not None else None
    return assemble(plan, parts, heavy, rest)


@partial(jax.jit, static_argnames=("itermax", "first_iter_min"))
def _cdlp_slab_kernel(plan: SlabPlan, labels0, itermax, first_iter_min=False):
    """Iteration 0 always runs gather-free (labels0 MUST be the identity
    labeling, which CDLP semantics fix): min for duplicate-free
    incidence (`first_iter_min`, undirected simple graphs), full
    min-mode on the stored ids otherwise. Kept outside the loop body: a
    lax.cond in the body would make XLA compile-and-schedule both
    branches every iteration."""
    start = jnp.int32(0)
    labels_init = labels0
    if itermax >= 1:
        labels_init = (
            _iter0_minmode(plan, labels0)
            if first_iter_min
            else _iter0_mode(plan, labels0)
        )
        start = jnp.int32(1)

    def cond(state):
        _, changed, it = state
        return changed & (it < itermax)

    def body(state):
        labels, _, it = state
        new = cdlp_step(labels, plan)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels_init, jnp.bool_(True), start)
    )
    return labels, it


@partial(jax.jit, static_argnames=("first",))
def _cdlp_one_step(plan: SlabPlan, labels, first=False):
    """`first`: "min" (duplicate-free iter0), "mode" (gather-free full
    min-mode iter0 — labels must be the identity), or falsy (full step)."""
    if first == "min":
        new = _iter0_minmode(plan, labels)
    elif first == "mode":
        new = _iter0_mode(plan, labels)
    else:
        new = cdlp_step(labels, plan)
    return new, jnp.any(new != labels)


def memoized_cdlp_plan(graph, centers, neigh, deg, buckets):
    """Slab plan for the CDLP incidence, memoized on the Graph and keyed
    by the bucket policy — suite repetitions and the slab/adaptive
    variants share one host build + device transfer (the LCC wedge plan
    and the distributed plan checkpoints already follow this pattern)."""
    from graphtpu.ops.slab import bucket_policy_key

    key = repr(bucket_policy_key(buckets))
    cached = getattr(graph, "_cdlp_slab_plan", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    plan = build_slab_plan(
        centers, neigh, np.asarray(deg, np.int64), graph.n, buckets
    )
    graph._cdlp_slab_plan = (key, plan)
    return plan


def cdlp_slab_run(graph, centers, neigh, deg, itermax, cfg):
    """Entry point used by graphtpu/algorithms/cdlp.py. Returns (labels, it)."""
    buckets = tuple(cfg.slab_buckets) if cfg and cfg.slab_buckets else None
    plan = memoized_cdlp_plan(graph, centers, neigh, deg, buckets)
    labels0 = jnp.arange(graph.n, dtype=jnp.int32)
    # duplicate-free incidence (undirected simple graphs) admits the
    # gather-free first iteration
    first_iter_min = not graph.directed

    if cfg is not None and cfg.iteration_timing:
        # host-stepped loop with per-iteration device timing — the
        # observability analogue of the reference's CUDA-event queue
        # ([CUDA][TIMER] lines, common/utils.hpp:344-382)
        from graphtpu.utils.timers import IterationTimer

        timer = IterationTimer()
        labels = labels0
        it = 0
        for i in range(int(itermax)):
            timer.start()
            labels, changed = _cdlp_one_step(
                plan, labels,
                ("min" if first_iter_min else "mode") if i == 0 else False,
            )
            changed = bool(changed)  # D2H sync closes the timing window
            timer.stop(f"cdlp iteration {i}", labels)
            it = i + 1
            if not changed:
                break
        return labels, it

    labels, it = _cdlp_slab_kernel(plan, labels0, int(itermax), first_iter_min)
    return labels, it
