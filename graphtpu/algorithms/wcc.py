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
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    labels0 = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        labels, _, it = state
        neigh_min = pull_reduce(
            "min", table_gather(labels, edges_src, chunk=EDGE_STREAM_CHUNK), edges_dst, indptr, n, INT32_INF, impl
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


def _wcc_adaptive_loop(full_step, iter0_step, edges_src, indptr, deg_pad,
                       n, k_cap, e_cap):
    """Shared nested-phase machinery of the adaptive WCC kernels — the
    full-step implementations differ (edge-stream pull_reduce vs
    slab-plan row-min), everything else (capacity gating, device
    compaction, the active min-propagation step, the phase while_loops,
    the full-step counter for executed-volume roofs) is this one copy.

    Active steps do PURE min-propagation (no pointer jumping): jumps can
    change labels far from any frontier, which would force a second
    expansion to find the next active set; without them a label can only
    change through an edge, so the step's own expansion already holds the
    next frontier. The fixed point (min label per component) is
    unchanged — the tail just takes a few more (cheap) iterations.

    `full_step(labels) -> (new, changed_mask)`; `iter0_step() ->
    (new, changed_mask)` is its gather-free first iteration (identity
    labels)."""
    from graphtpu.ops.frontier import (
        compact,
        compact_stream,
        expand,
        frontier_deg_sum,
        mask_status,
    )
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.scan_reduce import seg_min_scan

    deg_n = deg_pad[:-1]
    m_edges = int(edges_src.shape[0])

    def fits(changed_mask):
        cnt, ce = mask_status(changed_mask, deg_n, m_edges)
        return (cnt <= k_cap) & (ce <= e_cap)

    def derive(changed_mask):
        ids, _ = compact(changed_mask, k_cap)
        exp = expand(ids, deg_pad, indptr, edges_src, e_cap)
        nxt_ids, nxt_cnt = compact_stream(exp.neigh, exp.valid, k_cap, n)
        ne = frontier_deg_sum(nxt_ids, deg_pad)
        return nxt_ids, (nxt_cnt <= k_cap) & (ne <= e_cap)

    def gate(step):
        def gated(*args):
            new, changed_mask = step(*args)
            return new, changed_mask, fits(changed_mask), jnp.any(changed_mask)
        return gated

    full_gated = gate(full_step)

    def active_step(labels, act_ids):
        exp = expand(act_ids, deg_pad, indptr, edges_src, e_cap)
        lab_at = jnp.where(
            exp.valid, table_gather(labels, exp.neigh), INT32_INF
        )
        indptr_ext = jnp.concatenate(
            [exp.seg_starts, jnp.full((1,), e_cap, jnp.int32)]
        )
        centers_ext = jnp.where(exp.valid, exp.rows_local, jnp.int32(k_cap))
        mins = seg_min_scan(lab_at, centers_ext, indptr_ext, INT32_INF)[:k_cap]
        valid_row = act_ids < n
        old = table_gather(labels, jnp.where(valid_row, act_ids, 0))
        winners = jnp.minimum(old, mins)
        changed_row = valid_row & (winners < old)
        new = labels.at[jnp.where(changed_row, act_ids, jnp.int32(n))].set(
            jnp.where(changed_row, winners, 0), mode="drop"
        )
        ch_edge = exp.valid & (
            table_gather(changed_row.astype(jnp.int32), exp.rows_local) == 1
        )
        nxt_ids, nxt_cnt = compact_stream(exp.neigh, ch_edge, k_cap, n)
        ne = frontier_deg_sum(nxt_ids, deg_pad)
        ok = (nxt_cnt <= k_cap) & (ne <= e_cap)
        return new, nxt_ids, ok, jnp.any(changed_row)

    def full_phase(state):
        def cond(s):
            _, _, _, ok, changed, it, _ = s
            return changed & (it < n) & (~ok)

        def body(s):
            labels, _, ids, _, _, it, nf = s
            new, mask, fit, ch = full_gated(labels)
            return new, mask, ids, fit, ch, it + 1, nf + 1

        return jax.lax.while_loop(cond, body, state)

    def active_phase(state):
        def cond(s):
            _, _, _, ok, changed, it, _ = s
            return changed & (it < n) & ok

        def body(s):
            labels, mask, ids, _, _, it, nf = s
            new, nids, nok, ch = active_step(labels, ids)
            return new, mask, nids, nok, ch, it + 1, nf

        return jax.lax.while_loop(cond, body, state)

    labels_init, mask0, fit0, ch0 = gate(iter0_step)()
    state = (
        labels_init,
        mask0,
        jnp.full((k_cap,), n, jnp.int32),
        fit0,
        ch0,
        jnp.int32(1),
        jnp.int32(1),  # full-step counter (executed-volume accounting)
    )

    def outer_cond(s):
        _, _, _, _, changed, it, _ = s
        return changed & (it < n)

    def outer_body(s):
        s = full_phase(s)
        labels, mask, _, ok, changed, it, nf = s
        ids, ok2 = derive(mask)
        return active_phase((labels, mask, ids, ok & ok2, changed, it, nf))

    labels, _, _, _, _, it, nf = jax.lax.while_loop(
        outer_cond, outer_body, state
    )
    return labels, it, nf


@partial(jax.jit, static_argnames=("n", "k_cap", "e_cap", "impl"))
def _wcc_adaptive_kernel(edges_src, edges_dst, indptr, deg_pad, n,
                        k_cap, e_cap, impl="scan"):
    """Single-dispatch convergence-adaptive WCC over the raw edge
    stream (structure mirrors _cdlp_adaptive_kernel): full
    min-propagation + pointer-jumping steps while many labels churn,
    compacted active-set steps once the changed rows fit the static
    frontier capacities (the shared machinery in _wcc_adaptive_loop)."""
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    labels0 = jnp.arange(n, dtype=jnp.int32)

    def finish(labels, neigh_min):
        new = jnp.minimum(labels, neigh_min)
        # pointer jumping: representative chains compress to their minimum
        new = jnp.minimum(new, table_gather(new, new))
        new = jnp.minimum(new, table_gather(new, new))
        return new, new != labels

    def full_step(labels):
        neigh_min = pull_reduce(
            "min", table_gather(labels, edges_src, chunk=EDGE_STREAM_CHUNK),
            edges_dst, indptr, n, INT32_INF, impl,
        )
        return finish(labels, neigh_min)

    def iter0_step():
        # gather-free first iteration: labels are the identity, so the
        # label-at-source gather IS edges_src (the CDLP _iter0 move,
        # ops/minmode.py, applied to min-propagation)
        neigh_min = pull_reduce(
            "min", edges_src, edges_dst, indptr, n, INT32_INF, impl
        )
        return finish(labels0, neigh_min)

    return _wcc_adaptive_loop(
        full_step, iter0_step, edges_src, indptr, deg_pad, n, k_cap, e_cap
    )


@partial(jax.jit, static_argnames=("n", "k_cap", "e_cap", "impl"))
def _wcc_slab_adaptive_kernel(plan, edges_src, indptr, deg_pad, n,
                              k_cap, e_cap, impl="scan"):
    """Adaptive WCC with SLAB-PLAN full steps — the round-4 structural
    lever from the per-phase replay (scripts/perf/wcc_phases.py): the
    raw-edge-order label gather runs 2.9 ns/idx and the segment-min scan
    2.2 ns/el, while the degree-bucketed slab plan's reordered gathers
    sustain 2.43 ns/idx (PR) and its row-min is a plain axis reduction
    on the VPU. Full steps ride `slab_spmv(MIN_SECOND, ...)`; iteration
    0 is gather-free (identity labels make the gathered slab the slab's
    own neighbor ids); the loop machinery is _wcc_adaptive_loop."""
    from graphtpu.core.semiring import MIN_SECOND
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.slab import assemble
    from graphtpu.ops.spmv import pull_reduce, slab_spmv

    labels0 = jnp.arange(n, dtype=jnp.int32)

    def finish(labels, neigh_min):
        new = jnp.minimum(labels, neigh_min)
        new = jnp.minimum(new, table_gather(new, new))
        new = jnp.minimum(new, table_gather(new, new))
        return new, new != labels

    def full_step(labels):
        return finish(labels, slab_spmv(MIN_SECOND, plan, labels, n))

    def iter0_step():
        parts = [
            jnp.min(jnp.where(b.slab >= 0, b.slab, INT32_INF), axis=0)
            for b in plan.slabs
        ]
        heavy = None
        if plan.heavy_rows is not None:
            heavy = pull_reduce(
                "min", plan.heavy_neigh, plan.heavy_centers,
                plan.heavy_indptr, plan.heavy_rows.shape[0],
                jnp.int32(INT32_INF), impl,
            )
        rest = None
        if plan.rest_rows is not None:
            rest = jnp.full((plan.rest_rows.shape[0],), INT32_INF, jnp.int32)
        return finish(labels0, assemble(plan, parts, heavy, rest))

    return _wcc_adaptive_loop(
        full_step, iter0_step, edges_src, indptr, deg_pad, n, k_cap, e_cap
    )


def wcc_adaptive_run(graph: Graph, cfg=None, with_stats: bool = False):
    """Entry point for the single-dispatch adaptive WCC. With
    `with_stats`, also returns {"full_steps", "active_steps", "e_cap",
    "k_cap"} for executed-volume roofline accounting (all per-phase
    shapes are static, so phase counts fully determine executed work)."""
    sym = graph.symmetrized()
    prep = getattr(sym, "_wcc_adaptive_prep", None)
    if prep is None:
        coo = sym.device_pull()
        prep = (
            coo,
            jnp.asarray(sym.pull_indptr.astype(np.int32)),
            jnp.asarray(
                np.concatenate([sym.in_degree, [0]]).astype(np.int32)
            ),
        )
        sym._wcc_adaptive_prep = prep
    coo, indptr, deg_pad = prep
    k_cap = int(getattr(cfg, "wcc_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "wcc_frontier_edges", 0) or 1 << 18)
    impl = getattr(cfg, "wcc_impl", "auto") or "auto"
    plan_gathers = None
    if impl in ("auto", "slab"):
        # slab-plan full steps (measured: raw-edge-order gathers run
        # 2.9 ns/idx vs 2.43 through the degree-bucketed plan —
        # wcc_phases.py); plan cached on the symmetrized graph
        plan = getattr(sym, "_wcc_slab_plan", None)
        if plan is None:
            from graphtpu.ops.spmv import build_pull_plan

            plan = build_pull_plan(sym, with_values=False)
            sym._wcc_slab_plan = plan
        labels, niter, nfull = _wcc_slab_adaptive_kernel(
            plan, coo.src, indptr, deg_pad, sym.n, k_cap, e_cap,
            getattr(cfg, "spmv_impl", "scan") or "scan",
        )
        if with_stats:
            from graphtpu.utils.roofline import plan_gather_count

            plan_gathers = plan_gather_count(plan)
    else:
        labels, niter, nfull = _wcc_adaptive_kernel(
            coo.src, coo.dst, indptr, deg_pad, sym.n, k_cap, e_cap,
            getattr(cfg, "spmv_impl", "scan") or "scan",
        )
    # ONE device_get for every scalar: each separate int() costs a full
    # D2H roundtrip (~25 ms through the relay) inside bench timed regions
    if with_stats:
        niter, nfull = (int(v) for v in jax.device_get((niter, nfull)))
        stats = {
            "full_steps": nfull,
            "active_steps": niter - nfull,
            "e_cap": e_cap,
            "k_cap": k_cap,
            "plan_gathers": plan_gathers,  # None on the edge-stream impl
        }
        return labels, niter, stats
    return labels, int(niter)


@register("wcc")
def wcc(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    sym = graph.symmetrized()
    if getattr(cfg, "wcc_impl", "auto") in ("auto", "adaptive", "slab"):
        labels, niter = wcc_adaptive_run(graph, cfg)
    else:
        coo = sym.device_pull()
        indptr = jnp.asarray(sym.pull_indptr.astype(np.int32))
        labels, niter = _wcc_kernel(coo.src, coo.dst, indptr, sym.n, cfg.spmv_impl)
    comp = graph.mapping[np.asarray(labels)]
    return AlgorithmResult("wcc", comp, iterations=int(niter))
