"""Convergence-adaptive CDLP execution — active-set steps once the label
propagation has mostly settled.

Measured on RMAT s20/ef32 (60.7M stored edges, 1× v5e): synchronous
min-mode CDLP effectively converges by iteration 3 — from then on only a
few hundred vertices keep flipping (pendant/isolated-edge 2-cycles whose
labels swap forever, so the exact fixed-point exit of
LAGraph_cdlp.c:328-332 never fires) — yet the static while_loop kernel
pays the full ~360 ms slab step for every remaining iteration up to
itermax.

This driver is the TPU analogue of the CUDA fork's runtime kernel
switching (cdlp_kernel.cu:1238-1243 switches kernels at iteration 4), but
keyed on the measured active fraction instead of the iteration number:

* full-graph slab steps (graphtpu/ops/minmode.py) while many vertices are
  changing;
* once the rows adjacent to a changed vertex cover less than
  `cdlp_active_threshold` of the incidence, compacted active-set steps:
  the host slices the incidence at just the active rows, pads to
  power-of-two shapes (bounding the jit-compile count), and one
  sort+scan stream kernel (stream_minmode) updates only those rows.

Correctness: with synchronous updates a row's label can change at
iteration t+1 only if one of its incidence neighbors changed at t; the
incidence structure is symmetric (both directions are included for
directed graphs, LAGraph_cdlp.c:47-50, so u lists v iff v lists u), hence
the next active set is exactly the union of the changed vertices'
incidence lists. Rows outside it provably keep their label.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.ops.gather import table_gather
from graphtpu.ops.minmode import (
    _cdlp_one_step,
    _iter0_minmode,
    build_slab_plan,
    cdlp_step,
    stream_minmode,
)

# power-of-two padding floors: every tail iteration (hundreds of active
# rows) lands on one (m_pad, h_pad) shape, so the whole adaptive run
# compiles only a handful of _active_step variants.
_M_FLOOR = 1 << 12
_H_FLOOR = 1 << 10

DEFAULT_ACTIVE_THRESHOLD = 0.10


def _pow2_at_least(x: int, floor: int) -> int:
    return max(floor, 1 << max(0, int(x - 1).bit_length()))


@partial(jax.jit, static_argnames=("n",))
def _active_step(labels, rows, centers, neigh, indptr, n):
    """One synchronous CDLP iteration restricted to `rows` (padded with n).

    Returns (new full label vector, per-row changed flags, per-row new
    labels). Padded rows scatter to index n and are dropped.
    """
    winners = stream_minmode(labels, centers, neigh, indptr, n)
    valid = rows < n
    old = table_gather(labels, jnp.where(valid, rows, 0))
    scatter_idx = jnp.where(valid, rows, jnp.int32(n))
    new_labels = labels.at[scatter_idx].set(
        jnp.where(valid, winners, 0), mode="drop"
    )
    changed = valid & (winners != old)
    return new_labels, changed, winners


def _slice_incidence(ids: np.ndarray, deg: np.ndarray, indptr: np.ndarray):
    """Concatenated incidence positions for the given center ids: one
    np.repeat-based expansion, O(total edges of ids)."""
    lens = deg[ids]
    m = int(lens.sum())
    if m == 0:
        return np.empty(0, dtype=np.int64), lens, m
    offs = np.zeros(ids.shape[0], dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    pos = (
        np.arange(m, dtype=np.int64)
        - np.repeat(offs, lens)
        + np.repeat(indptr[ids], lens)
    )
    return pos, lens, m


@partial(
    jax.jit,
    static_argnames=("itermax", "first_iter_min", "tiers"),
)
def _cdlp_adaptive_kernel(
    plan, deg_pad, indptr_pad, neigh_dev, labels0,
    itermax, first_iter_min, tiers,
):
    """Single-dispatch convergence-adaptive CDLP with a TIERED active
    ladder: the whole itermax run is ONE compiled program. Full slab
    steps run while the active set exceeds every tier; otherwise the
    SMALLEST tier whose (rows, edges) budget fits runs a compacted
    active-set step — the BFS push-tier ladder (algorithms/bfs.py)
    applied to label propagation. The round-4 motivation: an active
    step's cost splits into a ~15 ms step floor plus e-linear work
    (scripts/perf/step_floor_bench.py), while a full slab sweep costs
    ~200 ms at s20/ef32 — so a 2^22-edge tier (~64 ms) beats a full
    sweep for the mid-convergence iterations that used to overflow the
    single 2^18 cap, and the 2^18 tier keeps the tail at ~17 ms.

    `tiers` is an ascending tuple of (rows, edges) budgets; the routing
    signal is the EXACT (count, edge-sum) of the next active set, which
    every tier step computes for its successor; full steps route via
    cheap changed-mask statistics and a derive() at the phase boundary
    (the expansion stays OUT of the full-step loop body — fusing it in
    blew the TPU's scoped-vmem budget). All compaction on device
    (graphtpu/ops/frontier.py), zero host-device traffic between
    iterations. Control flow is nested phase loops instead of lax.cond
    in the body: a cond inside while_loop schedules both branches on
    TPU, which would charge the full-step cost to every active
    iteration.
    """
    from graphtpu.ops.frontier import (
        compact,
        compact_stream,
        expand,
        frontier_deg_sum,
    )

    n = labels0.shape[0]
    deg_n = deg_pad[:-1]
    T = len(tiers)
    k_max, e_max = tiers[-1]
    IMAX = jnp.int32(np.iinfo(np.int32).max)
    FULL = T

    def chosen(acnt, ae):
        """Smallest tier whose budgets fit; T (full) if none. acnt of
        -1 (derive pending) routes to full until the boundary derive."""
        c = jnp.int32(FULL)
        for i in range(T - 1, -1, -1):
            k_i, e_i = tiers[i]
            c = jnp.where((acnt >= 0) & (acnt <= k_i) & (ae <= e_i),
                          jnp.int32(i), c)
        return c

    def fits_mask(changed_mask):
        """Cheap changed-mask statistics against the LARGEST tier —
        necessary for any tier to fit; derive() then measures the real
        active set. One fused packed-int64 reduction (mask_status)."""
        from graphtpu.ops.frontier import mask_status

        cnt, ce = mask_status(changed_mask, deg_n, int(neigh_dev.shape[0]))
        return (cnt <= k_max) & (ce <= e_max)

    def derive(changed_mask):
        """Active set = union of the changed vertices' incidence lists,
        at the largest tier's sizes. Callers must have checked
        fits_mask."""
        ids, _ = compact(changed_mask, k_max)
        exp = expand(ids, deg_pad, indptr_pad, neigh_dev, e_max)
        nxt_ids, nxt_cnt = compact_stream(exp.neigh, exp.valid, k_max, n)
        ne = frontier_deg_sum(nxt_ids, deg_pad)
        return nxt_ids, nxt_cnt, ne

    def full_step(labels):
        new = cdlp_step(labels, plan)
        changed_mask = new != labels
        # acnt sentinel: -1 = "fits, derive at the boundary", IMAX = stay
        acnt = jnp.where(fits_mask(changed_mask), jnp.int32(-1), IMAX)
        return new, changed_mask, acnt, jnp.any(changed_mask)

    def make_tier_step(i):
        k_i, e_i = tiers[i]

        def tier_step(s):
            labels, mask, ids, _, _, _, it, nf = s
            ids_i = jax.lax.slice_in_dim(ids, 0, k_i)   # sorted, pad = n
            exp = expand(ids_i, deg_pad, indptr_pad, neigh_dev, e_i)
            centers_ext = jnp.where(exp.valid, exp.rows_local, jnp.int32(k_i))
            indptr_ext = jnp.concatenate(
                [exp.seg_starts, jnp.full((1,), e_i, jnp.int32)]
            )
            winners = stream_minmode(
                labels, centers_ext, exp.neigh, indptr_ext, n
            )[:k_i]
            valid_row = ids_i < n
            old = table_gather(labels, jnp.where(valid_row, ids_i, 0))
            changed_row = valid_row & (winners != old)
            new = labels.at[
                jnp.where(changed_row, ids_i, jnp.int32(n))
            ].set(jnp.where(changed_row, winners, 0), mode="drop")
            # next active set: stream entries whose center row changed —
            # the step's own expansion already holds those neighbors
            ch_edge = exp.valid & (
                table_gather(changed_row.astype(jnp.int32), exp.rows_local)
                == 1
            )
            nxt_ids, nxt_cnt = compact_stream(exp.neigh, ch_edge, k_max, n)
            ne = frontier_deg_sum(nxt_ids, deg_pad)
            return (new, mask, nxt_ids, nxt_cnt, ne,
                    jnp.any(changed_row), it + 1, nf)

        return tier_step

    # state: (labels, mask, ids[k_max], acnt, ae, ch, it, nf)
    def full_phase(state):
        def cond(s):
            _, _, _, acnt, _, ch, it, _ = s
            return ch & (it < itermax) & (acnt == IMAX)

        def body(s):
            labels, _, ids, _, ae, _, it, nf = s
            new, mask, acnt, ch = full_step(labels)
            return new, mask, ids, acnt, ae, ch, it + 1, nf + 1

        return jax.lax.while_loop(cond, body, state)

    def make_tier_phase(i, step):
        def phase(state):
            def cond(s):
                _, _, _, acnt, ae, ch, it, _ = s
                return ch & (it < itermax) & (chosen(acnt, ae) == i)

            return jax.lax.while_loop(cond, step, state)

        return phase

    tier_phases = [make_tier_phase(i, make_tier_step(i)) for i in range(T)]

    if itermax >= 1:
        # iteration 0 is always gather-free (labels0 is the identity):
        # min for duplicate-free incidence, full min-mode on the stored
        # ids otherwise (graphtpu/ops/minmode.py _iter0_mode)
        from graphtpu.ops.minmode import _iter0_mode

        labels_init = (
            _iter0_minmode(plan, labels0)
            if first_iter_min
            else _iter0_mode(plan, labels0)
        )
        mask0 = labels_init != labels0
        acnt0 = jnp.where(fits_mask(mask0), jnp.int32(-1), IMAX)
        state = (
            labels_init, mask0, jnp.full((k_max,), n, jnp.int32),
            acnt0, jnp.int32(0), jnp.any(mask0), jnp.int32(1), jnp.int32(1),
        )
    else:
        state = (
            labels0,
            jnp.zeros((n,), bool),
            jnp.full((k_max,), n, jnp.int32),
            IMAX,
            jnp.int32(0),
            jnp.bool_(True),
            jnp.int32(0),
            jnp.int32(0),
        )

    def outer_cond(s):
        _, _, _, _, _, ch, it, _ = s
        return ch & (it < itermax)

    def outer_body(s):
        s = full_phase(s)
        labels, mask, ids, acnt, ae, ch, it, nf = s
        # phase boundary: expand the changed mask into the active set.
        # Computed unconditionally (an outer-body lax.cond would schedule
        # both branches anyway) but only ADOPTED when a full step just
        # requested it (acnt == -1); tier-step routing keeps its exact
        # counts otherwise. Runs once per phase switch, not per step.
        d_ids, d_cnt, d_ne = derive(mask)
        need = acnt == jnp.int32(-1)
        ids = jnp.where(need, d_ids, ids)
        acnt = jnp.where(need, d_cnt, acnt)
        ae = jnp.where(need, d_ne, ae)
        # forward progress: when the EXACT active set exceeds every tier
        # (mask stats fit but the neighbor union doesn't), route back to
        # full — otherwise no phase's cond holds and the outer loop spins
        acnt = jnp.where(chosen(acnt, ae) == FULL, IMAX, acnt)
        s = (labels, mask, ids, acnt, ae, ch, it, nf)
        for ph in tier_phases:
            s = ph(s)
        return s

    labels, _, _, _, _, _, it, nf = jax.lax.while_loop(
        outer_cond, outer_body, state
    )
    return labels, it, nf


class AdaptivePrep(NamedTuple):
    """Host-built, device-resident state for the adaptive kernel — build
    once per graph (plan construction + transfers dominate a single run's
    wall time on this box's single CPU core), reuse across runs."""

    plan: object
    deg_pad: object       # [n+1] int32 device (deg_pad[n] == 0)
    indptr_pad: object    # [n+1] int32 device
    neigh_dev: object     # [m] int32 device


def prepare_cdlp_adaptive(graph, centers, neigh, deg, cfg=None) -> AdaptivePrep:
    n = graph.n
    deg = np.asarray(deg, dtype=np.int64)
    buckets = tuple(cfg.slab_buckets) if cfg and cfg.slab_buckets else None
    from graphtpu.ops.minmode import memoized_cdlp_plan

    plan = memoized_cdlp_plan(graph, centers, neigh, deg, buckets)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    deg_pad = np.concatenate([deg, [0]]).astype(np.int32)
    return AdaptivePrep(
        plan,
        jnp.asarray(deg_pad),
        jnp.asarray(indptr.astype(np.int32)),
        jnp.asarray(np.asarray(neigh, dtype=np.int32)),
    )


def cdlp_tiers(k_cap: int, e_cap: int, m_inc: int, cfg=None) -> tuple:
    """Active-tier budgets for the tiered CDLP kernel. DEFAULT: the
    single configured (cdlp-frontier-rows/edges) tier — the round-4
    escalating ladder (2^18/2^20/2^22) was MEASURED SLOWER on the
    headline graph (1.11 s vs 0.91 s at s20/ef32): power-law CDLP's
    changed set collapses abruptly after the heavy iterations (it0-it3
    genuinely need full sweeps; it4+ fit the small tier), so there is
    no intermediate regime for the big tiers to win, and the ladder's
    larger boundary derive + tail buffers only add cost. `cdlp-tiers`
    (comma edge budgets) still enables a ladder for graphs with slower
    churn decay; row budgets derive as min(max(k, e/16), 2^18) — rows
    only size the ids/winner/scatter buffers (the BFS ladder's rule).
    m_inc is accepted for ladder validation (budgets beyond m_inc/4
    cost more than the slab sweep they replace and are dropped)."""
    cfg_tiers = getattr(cfg, "cdlp_tiers", "") or ""
    if cfg_tiers:
        edge_tiers = sorted({int(t) for t in str(cfg_tiers).split(",") if t})
        edge_tiers = (
            [e for e in edge_tiers if e <= max(m_inc // 4, edge_tiers[0])]
            or edge_tiers[:1]
        )
    else:
        edge_tiers = [e_cap]
    return tuple(
        (min(max(k_cap, e // 16), 1 << 18), e) for e in edge_tiers
    )


def cdlp_adaptive_device_run(graph, centers, neigh, deg, itermax, cfg=None,
                             prep: AdaptivePrep | None = None,
                             with_stats: bool = False):
    """Entry point for the single-dispatch device-side adaptive kernel.
    With `with_stats`, also returns phase counters for executed-volume
    roofline accounting."""
    if prep is None:
        prep = prepare_cdlp_adaptive(graph, centers, neigh, deg, cfg)
    n = graph.n
    k_cap = int(getattr(cfg, "cdlp_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "cdlp_frontier_edges", 0) or 1 << 18)
    tiers = cdlp_tiers(k_cap, e_cap, int(np.asarray(deg).sum()), cfg)
    labels0 = jnp.arange(n, dtype=jnp.int32)
    labels, it, nf = _cdlp_adaptive_kernel(
        prep.plan,
        prep.deg_pad,
        prep.indptr_pad,
        prep.neigh_dev,
        labels0,
        int(itermax),
        not graph.directed,
        tiers,
    )
    if with_stats:
        # one D2H for both counters (separate int() transfers cost a
        # ~25 ms relay roundtrip each inside bench timed regions)
        it_h, nf_h = (int(v) for v in jax.device_get((it, nf)))
        stats = {
            "full_steps": nf_h,
            "active_steps": it_h - nf_h,
            "e_cap": e_cap,
            "k_cap": k_cap,
        }
        return labels, it_h, stats
    return labels, it


def cdlp_adaptive_run(graph, centers, neigh, deg, itermax, cfg=None):
    """Entry point used by graphtpu/algorithms/cdlp.py. Returns (labels, it)
    with semantics identical to the full slab while_loop kernel
    (graphtpu/ops/minmode.py _cdlp_slab_kernel)."""
    n = graph.n
    itermax = int(itermax)
    deg = np.asarray(deg, dtype=np.int64)
    centers = np.asarray(centers)
    neigh = np.asarray(neigh)
    m_total = int(centers.shape[0])
    indptr_h = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr_h[1:])

    buckets = tuple(cfg.slab_buckets) if cfg and cfg.slab_buckets else None
    from graphtpu.ops.minmode import memoized_cdlp_plan

    plan = memoized_cdlp_plan(graph, centers, neigh, deg, buckets)
    threshold = getattr(cfg, "cdlp_active_threshold", None)
    if threshold is None:  # explicit 0 disables active-set stepping
        threshold = DEFAULT_ACTIVE_THRESHOLD
    thresh_edges = threshold * max(m_total, 1)
    first_iter_min = not graph.directed

    timer = None
    if cfg is not None and getattr(cfg, "iteration_timing", False):
        from graphtpu.utils.timers import IterationTimer

        timer = IterationTimer()

    labels = jnp.arange(n, dtype=jnp.int32)
    prev = np.arange(n, dtype=np.int32)
    act_rows: np.ndarray | None = None  # rows for the next iteration; None = full step
    it = 0
    for i in range(itermax):
        if timer:
            timer.start()
        if act_rows is None:
            labels, _ = _cdlp_one_step(
                plan, labels,
                ("min" if first_iter_min else "mode") if i == 0 else False,
            )
            cur = np.array(labels)  # writable copy (asarray views are read-only)
            changed_ids = np.nonzero(cur != prev)[0]
            prev = cur
        else:
            h = int(act_rows.shape[0])
            pos, lens, m = _slice_incidence(act_rows, deg, indptr_h)
            h_pad = _pow2_at_least(h + 1, _H_FLOOR)
            m_pad = _pow2_at_least(max(m, 1), _M_FLOOR)
            cA = np.full(m_pad, h_pad - 1, dtype=np.int32)
            cA[:m] = np.repeat(np.arange(h, dtype=np.int32), lens)
            nA = np.zeros(m_pad, dtype=np.int32)
            nA[:m] = neigh[pos]
            ip = np.full(h_pad + 1, m, dtype=np.int32)
            np.cumsum(lens, out=ip[1 : h + 1])
            ip[0] = 0
            ip[h_pad] = m_pad  # the fake last row absorbs all pad edges
            rows_pad = np.full(h_pad, n, dtype=np.int32)
            rows_pad[:h] = act_rows
            labels, changed_flags, winners = _active_step(
                labels,
                jnp.asarray(rows_pad),
                jnp.asarray(cA),
                jnp.asarray(nA),
                jnp.asarray(ip),
                n,
            )
            cf = np.asarray(changed_flags)[:h]
            changed_ids = act_rows[cf]
            prev[changed_ids] = np.asarray(winners)[:h][cf]
        it = i + 1
        if timer:
            timer.stop(f"cdlp iteration {i}", labels)
        if changed_ids.size == 0:
            break
        if i == itermax - 1:
            break  # don't plan a next iteration that will never run
        # next active set = union of the changed vertices' incidence lists;
        # gate the O(edges-of-changed) slicing on the cheap upper bound
        cm = int(deg[changed_ids].sum())
        if cm <= thresh_edges:
            cpos, _, _ = _slice_incidence(changed_ids, deg, indptr_h)
            # dedupe via mask scatter: O(edges + n), ~10x cheaper than the
            # sort inside np.unique on this class of sizes
            mask = np.zeros(n, dtype=bool)
            mask[neigh[cpos]] = True
            nxt = np.nonzero(mask)[0]
            if nxt.size and int(deg[nxt].sum()) <= thresh_edges:
                act_rows = nxt
            else:
                act_rows = None
        else:
            act_rows = None
    return labels, it
