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

Hybrid mode (default): the dense step pays the full-edge gather every
level, which on power-law graphs wastes most of its work on the first
and last levels where the frontier touches few edges. The hybrid driver
(the TPU counterpart of push/pull direction-optimizing BFS) runs dense
device steps only for heavy levels and expands sparse frontiers on the
host over the push CSR — total work ~O(nnz) instead of O(nnz × levels).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

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
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    levels0 = jnp.full((n,), INT32_INF, dtype=jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros((n,), dtype=jnp.int32).at[source].set(1)

    def cond(state):
        level, levels, frontier, nonempty = state
        return nonempty & (level < n)

    def body(state):
        level, levels, frontier, _ = state
        reached = pull_reduce(
            "max", table_gather(frontier, edges_src, chunk=EDGE_STREAM_CHUNK), edges_dst, indptr, n, jnp.int32(0), impl
        )
        new_frontier = jnp.where(levels == INT32_INF, reached, 0)
        levels = jnp.where(new_frontier == 1, level + 1, levels)
        nonempty = jnp.any(new_frontier == 1)
        return level + 1, levels, new_frontier, nonempty

    level, levels, frontier, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), levels0, frontier0, jnp.bool_(True))
    )
    return levels, level


@partial(jax.jit, static_argnames=("n", "impl"))
def _bfs_dense_step(levels, frontier, level, edges_src, edges_dst, indptr, n, impl="scan"):
    """One dense level expansion (pull orientation); returns the updated
    levels and the new frontier mask."""
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    reached = pull_reduce(
        "max", table_gather(frontier, edges_src, chunk=EDGE_STREAM_CHUNK), edges_dst, indptr, n, jnp.int32(0), impl
    )
    new_frontier = jnp.where(levels == INT32_INF, reached, 0)
    levels = jnp.where(new_frontier == 1, level + 1, levels)
    return levels, new_frontier


@partial(
    jax.jit,
    static_argnames=("n", "t_trunc", "tiers", "k_bu", "e_bu", "impl", "mode"),
)
def _bfs_adaptive_kernel(
    levels0, frontier0_id, edges_src, edges_dst, pull_indptr,
    deg_pad, push_indptr, push_dst, pull_deg_pad, trunc_tbl,
    n, t_trunc, tiers, k_bu, e_bu, impl="scan", mode="phases",
):
    """Single-dispatch direction-optimizing BFS, the TPU counterpart of
    LAGr_BreadthFirstSearch's push/pull switching (bfs.cpp:76-80). The
    phases are nested while_loops (a lax.cond in a loop body would
    schedule both branches every level on TPU):

    * push tier ladder — `tiers` is an ascending tuple of (rows, edges)
      capacities; each level runs the SMALLEST tier that fits its
      frontier, so a 25k-edge tail level pays a 2^16-slot expansion
      instead of a 2^22-slot one (the padded expansion cost is linear
      in the tier's edge capacity: ~10 ms at 2^18 for that level in the
      round-3 phase replay). The top tier replaces the round-2 dense
      fallback for MID-SIZE frontiers: a non-hub source's 1M-edge level
      used to abort bottom-up (low probe hit rate -> residual overflow)
      and pay a 286 ms full sweep;
    * truncated bottom-up — heavy levels (frontier edges above the top
      tier, i.e. around Beamer's m/alpha switch point) claim unvisited
      rows by testing their first `t_trunc` in-neighbors in one gather
      of t_trunc*n indices (pull CSR segments are sorted by id, so the
      probed lowest-id in-neighbors skew toward early-reached hubs);
      rows the probe misses are compacted and their full in-edge lists
      checked through the frontier engine;
    * dense pull fallback — a full-edge gather + segment reduce, only
      when the bottom-up residual overflows its static capacities.

    Phase selection: `chosen = max(first_fit(cnt, fe), min_tier)` where
    first_fit is the smallest fitting tier index, T = len(tiers) means
    bottom-up and T+1 dense. `min_tier` escalates on aborts (a tier
    whose OUTPUT frontier overflows its row budget re-runs the level one
    tier up; bottom-up overflow re-runs it dense) and resets to 0 when a
    level completes — every level terminates because dense is total.

    One dispatch for the whole traversal — the host-driven hybrid pays
    per-level host-device transfers, which this environment's TPU relay
    makes dominant.

    `mode` selects the step-composition machinery (the round-5
    step-floor experiment, VERDICT r4 #3): "switch" runs ONE
    `lax.while_loop` whose body is a `lax.switch` over the phase step
    bodies — HLO conditionals execute only the taken branch, so each
    level pays one loop-cond + one switch + its own step, instead of
    the "phases" machinery's T+2 nested while_loops whose conds are all
    re-evaluated (~253 us each, step_floor_bench.py) at every phase
    transition. MEASURED VERDICT: on the axon TPU the switch kernel is
    a compile-time blow-up — XLA spends >10 minutes compiling the
    6-branch conditional inside the loop even at s10 shapes (vs ~2 min
    for the whole phases kernel), which disqualifies it as the default
    regardless of its runtime; on the CPU backend it compiles fine and
    matches bit-for-bit (tests run it). "phases" stays the production
    default; scripts/perf/measure_bfs_switch.py is the re-check."""
    from graphtpu.ops.frontier import (
        compact,
        compact_stream,
        expand,
        frontier_deg_sum,
    )
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather

    deg_n = deg_pad[:-1]
    pdeg_n = pull_deg_pad[:-1]
    T = len(tiers)
    BU, DENSE = T, T + 1

    def first_fit(cnt, fe):
        """Smallest tier whose (rows, edges) budget fits; T if none."""
        ff = jnp.int32(BU)
        for i in range(T - 1, -1, -1):
            k_i, e_i = tiers[i]
            ff = jnp.where((cnt <= k_i) & (fe <= e_i), jnp.int32(i), ff)
        return ff

    m_edges = edges_src.shape[0]

    def status(levels, level):
        """(cnt, fe) of `levels == level` — pure mask sums (no sort).
        Frontier ids are compacted lazily inside the tier step that
        consumes them; bottom-up and dense never read ids. The two
        reductions are FUSED into one packed-int64 sum when the counts
        fit disjoint bit fields (fe < 2^38, cnt < 2^25 — true for every
        Graphalytics graph): one n-sized reduce instead of two
        (step-floor lever, VERDICT r4 #3)."""
        from graphtpu.ops.frontier import mask_status

        return mask_status(levels == level, deg_n, m_edges)

    # ---- phase step bodies ----
    # state: (levels, cnt, fe, min_tier, level)

    def make_tier_step(i):
        k, e = tiers[i]

        def tier_step(s):
            levels, cnt, fe, _, level, counts = s
            counts = counts.at[i].add(1)
            ids, _ = compact(levels == level, k)
            exp = expand(ids, deg_pad, push_indptr, push_dst, e, with_row_ids=False)
            unvisited = exp.valid & (
                table_gather(levels, exp.neigh) == INT32_INF
            )
            # dedupe BEFORE the level scatter (sorts at ~0.3 ns/el,
            # scatter-min at 1.4-4.3 ns/el — scatter_bench.py): the
            # scatter then only touches K slots, and the deduped sorted
            # ids double as the next level's frontier
            ids2, cnt2 = compact_stream(exp.neigh, unvisited, k, n)
            # if the new frontier overflows this tier's row budget, ids2
            # is truncated and the update would be incomplete: abort
            # (levels unchanged, level not counted) and escalate
            applied = cnt2 <= k
            updated = levels.at[ids2].set(level + 1, mode="drop")
            levels = jnp.where(applied, updated, levels)
            fe2 = frontier_deg_sum(ids2, deg_pad)
            return (
                levels,
                jnp.where(applied, cnt2, cnt),
                jnp.where(applied, fe2, fe),
                jnp.where(applied, jnp.int32(0), jnp.int32(i + 1)),
                level + jnp.where(applied, 1, 0),
                counts,
            )

        return tier_step

    def bu_step(s):
        """Truncated bottom-up: claim unvisited rows whose first t_trunc
        in-neighbors hit the frontier (one gather of t_trunc*n indices);
        rows with deg > t_trunc that the probe missed get their full
        in-edge lists checked through the frontier engine. Aborts
        (levels unchanged, level not counted) when that residual
        overflows k_bu/e_bu — the dense phase then redoes the level."""
        levels, cnt, fe, _, level, counts = s
        counts = counts.at[BU].add(1)
        fmask_pad = jnp.concatenate(
            [(levels == level).astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        hit = jnp.max(
            table_gather(fmask_pad, trunc_tbl).reshape(t_trunc, n), axis=0
        )
        unvis = levels == INT32_INF
        claim_trunc = unvis & (hit == 1)
        resid_mask = unvis & (pdeg_n > t_trunc) & (hit == 0)
        rids, rcnt = compact(resid_mask, k_bu)
        fe_r = frontier_deg_sum(rids, pull_deg_pad)
        ok = (rcnt <= k_bu) & (fe_r <= e_bu)
        exp = expand(rids, pull_deg_pad, pull_indptr, edges_src, e_bu,
                     with_row_ids=False)
        rhit = (exp.valid & (table_gather(fmask_pad, exp.neigh) == 1)).astype(
            jnp.int32
        )
        # segment-any per residual row: the expansion stream is ordered
        # by frontier slot, so a cumsum + boundary diff replaces a
        # scatter-max
        cs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(rhit, dtype=jnp.int32)]
        )
        seg_hits = table_gather(cs, exp.seg_starts[1:]) - table_gather(
            cs, exp.seg_starts[:-1]
        )
        claimed_ids = jnp.where(seg_hits > 0, rids, jnp.int32(n))
        updated = jnp.where(claim_trunc, level + 1, levels)
        updated = updated.at[claimed_ids].set(level + 1, mode="drop")
        levels = jnp.where(ok, updated, levels)
        ncnt, nfe = status(levels, level + 1)
        return (
            levels,
            jnp.where(ok, ncnt, cnt),
            jnp.where(ok, nfe, fe),
            jnp.where(ok, jnp.int32(0), jnp.int32(DENSE)),
            level + jnp.where(ok, 1, 0),
            counts,
        )

    def dense_step(s):
        # the frontier IS the set of vertices at the current level — no
        # mask state has to survive across phases
        levels, _, _, _, level, counts = s
        counts = counts.at[DENSE].add(1)
        fmask = (levels == level).astype(jnp.int32)
        levels, _ = _bfs_dense_step(
            levels, fmask, level, edges_src, edges_dst, pull_indptr, n, impl,
        )
        ncnt, nfe = status(levels, level + 1)
        return levels, ncnt, nfe, jnp.int32(0), level + 1, counts

    def chosen(s):
        _, cnt, fe, min_tier, _, _ = s
        return jnp.maximum(first_fit(cnt, fe), min_tier)

    def make_phase(idx, step):
        def phase(state):
            def cond(s):
                return (s[1] > 0) & (chosen(s) == idx) & (s[4] < n)

            return jax.lax.while_loop(cond, step, state)

        return phase

    levels0 = levels0.at[frontier0_id].set(0)
    cnt0, fe0 = status(levels0, 0)
    # per-phase step counters [T tiers..., BU, DENSE] for executed-volume
    # rooflines (VERDICT r3 #3): aborted attempts count too — their work
    # is paid
    state = (levels0, cnt0, fe0, jnp.int32(0), jnp.int32(0),
             jnp.zeros((T + 2,), jnp.int32))

    steps = [make_tier_step(i) for i in range(T)] + [bu_step, dense_step]

    def outer_cond(s):
        return (s[1] > 0) & (s[4] < n)

    if mode == "switch":
        def body(s):
            return jax.lax.switch(chosen(s), steps, s)

        state = jax.lax.while_loop(outer_cond, body, state)
    else:
        phases = [make_phase(i, step) for i, step in enumerate(steps)]

        def outer_body(s):
            for ph in phases:
                s = ph(s)
            return s

        state = jax.lax.while_loop(outer_cond, outer_body, state)
    return state[0], state[4], state[5]


# default in-neighbors probed per row by the truncated bottom-up.
# Round-3 sweep at RMAT s20/ef32 (scripts/perf/measure_bfs3.py): t=2
# fastest at every tested source, t=4 within 5%, t=8 ~15% slower — the
# probe gather is t*n indices/level and residuals stayed empty down to
# t=2 on hub-adjacent levels; the capacity-gated dense fallback bounds
# the cost of a weak probe on other graphs. bfs-trunc overrides.
BFS_TRUNC = 2


def bfs_adaptive_prep(graph: Graph, t_trunc: int = BFS_TRUNC):
    """Device-resident arrays for the adaptive BFS kernel, cached on the
    Graph per trunc depth (transfers dominate a single traversal's wall
    time; the probe table is the only t-dependent array)."""
    cache = getattr(graph, "_bfs_adaptive_prep", None)
    if cache is None or cache[0] != t_trunc:
        coo = graph.device_pull()
        n = graph.n
        pull_deg = np.diff(graph.pull_indptr).astype(np.int64)
        # truncated bottom-up probe table, flattened [T, n] -> [T*n]:
        # trunc[t*n + v] = v's t-th smallest-id in-neighbor, sentinel n
        # past the row's degree (the frontier mask is padded with 0 at n)
        psrc = graph.pull_arrays()[0]
        offs = np.arange(t_trunc, dtype=np.int64)
        pos = graph.pull_indptr[:-1, None] + offs[None, :]
        valid = offs[None, :] < pull_deg[:, None]
        trunc = np.full((n, t_trunc), n, dtype=np.int32)
        trunc[valid] = psrc[np.minimum(pos, max(len(psrc) - 1, 0))[valid]]
        cache = (
            t_trunc,
            coo,
            jnp.asarray(graph.pull_indptr.astype(np.int32)),
            jnp.asarray(
                np.concatenate([graph.out_degree, [0]]).astype(np.int32)
            ),
            jnp.asarray(graph.indptr.astype(np.int32)),
            jnp.asarray(graph.dst.astype(np.int32)),
            jnp.asarray(
                np.concatenate([pull_deg, [0]]).astype(np.int32)
            ),
            jnp.asarray(np.ascontiguousarray(trunc.T).reshape(-1)),
        )
        graph._bfs_adaptive_prep = cache
    return cache[1:]


def bfs_adaptive_run(graph: Graph, src_dense: int, cfg: Optional[PlatformConfig] = None,
                     with_stats: bool = False):
    """Entry point for the single-dispatch adaptive BFS. Returns
    (levels int32 DEVICE array with INT32_INF unreachable, iterations) —
    levels stay on device so callers control when to pay the D2H copy.
    With `with_stats`, also returns per-phase step counters (tier/
    bottom-up/dense) for executed-volume roofline accounting."""
    n = graph.n
    t_trunc = int(getattr(cfg, "bfs_trunc", 0) or BFS_TRUNC)
    (
        coo, pull_indptr, deg_pad, push_indptr, push_dst,
        pull_deg_pad, trunc_tbl,
    ) = bfs_adaptive_prep(graph, t_trunc)
    # push-tier ladder: ascending (rows, edges) capacities; each level
    # runs the smallest tier that fits. Row budgets match edge budgets —
    # phase choice belongs to EDGE counts; a row cap below the edge cap
    # forced a 286 ms dense sweep on hub frontiers (round-3 phase
    # replay). bfs-push-tiers overrides the edge ladder; the top tier
    # sits near Beamer's m/alpha push->bottom-up switch for the bench
    # graphs (4.2M at s20/ef32).
    tiers_cfg = getattr(cfg, "bfs_push_tiers", "") or ""
    if tiers_cfg:
        edge_tiers = sorted({int(t) for t in str(tiers_cfg).split(",") if t})
    else:
        e_cap = int(getattr(cfg, "bfs_frontier_edges", 0) or 1 << 22)
        edge_tiers = [t for t in (1 << 16, 1 << 18, 1 << 20) if t < e_cap]
        edge_tiers += [e_cap]
    # row budgets are capped independently of edge budgets: rows only
    # size the ids/dedupe/scatter buffers of PUSH steps (bottom-up and
    # dense never read ids) — frontiers with more rows than 2^18 belong
    # to bottom-up anyway
    k_cap = int(getattr(cfg, "bfs_frontier_rows", 0) or 1 << 18)
    tiers = tuple((min(k_cap, e, n), e) for e in edge_tiers)
    k_bu = int(getattr(cfg, "bfs_bu_rows", 0) or 1 << 15)
    # measured residuals at t=2 on s20/ef32 are ~12k edges (bfs_phases
    # replay); 2^18 keeps 20x headroom while halving the residual
    # engine's static cost, and overflow degrades to dense, not to wrong
    e_bu = int(getattr(cfg, "bfs_bu_edges", 0) or 1 << 18)
    levels0 = jnp.full((n,), INT32_INF, dtype=jnp.int32)
    levels, niter, counts = _bfs_adaptive_kernel(
        levels0,
        jnp.int32(src_dense),
        coo.src,
        coo.dst,
        pull_indptr,
        deg_pad,
        push_indptr,
        push_dst,
        pull_deg_pad,
        trunc_tbl,
        n,
        t_trunc,
        tiers,
        k_bu,
        e_bu,
        getattr(cfg, "spmv_impl", "scan") or "scan",
        getattr(cfg, "bfs_step_mode", "") or "phases",
    )
    if with_stats:
        # one D2H for iteration count + phase counters (separate
        # transfers cost a ~25 ms relay roundtrip each — the round-4
        # bench read 0.583 -> 0.465 GTEPS until this was batched)
        niter, c = jax.device_get((niter, counts))
        niter = int(niter)
        stats = {
            "tier_steps": {int(e): int(c[i]) for i, (_, e) in enumerate(tiers)},
            "tiers": [(int(k), int(e)) for k, e in tiers],
            "bu_steps": int(c[len(tiers)]),
            "dense_steps": int(c[len(tiers) + 1]),
            "t_trunc": t_trunc,
            "k_bu": k_bu,
            "e_bu": e_bu,
        }
        return levels, niter, stats
    return levels, int(niter)


def bfs_hybrid_run(graph: Graph, src_dense: int, cfg: Optional[PlatformConfig] = None):
    """Direction-optimizing hybrid: sparse frontiers expand on the host
    over the push CSR (out-edges — the correct direction for directed
    graphs); frontiers touching more than `bfs_active_threshold` of the
    edges run the dense pull step on device. Returns (levels int32 np
    array with INT32_INF unreachable, iterations)."""
    n, m = graph.n, graph.nnz
    indptr_h = graph.indptr          # push CSR (out-edge) row pointers
    dst_h = graph.dst
    threshold = getattr(cfg, "bfs_active_threshold", None)
    if threshold is None:  # explicit 0 forces the dense path every round
        threshold = 0.05
    tau = threshold * max(m, 1)

    levels = np.full(n, INT32_INF, dtype=np.int32)
    levels[src_dense] = 0
    frontier = np.array([src_dense], dtype=np.int64)
    level = 0
    while frontier.size:
        fe = int((indptr_h[frontier + 1] - indptr_h[frontier]).sum())
        if fe <= tau:
            # host expansion over out-edges of the frontier
            from graphtpu.core.graph import frontier_edge_positions

            pos, _ = frontier_edge_positions(indptr_h, frontier)
            cand = dst_h[pos]
            cand = cand[levels[cand] == INT32_INF]
            # dedupe via mask scatter (cheaper than np.unique's sort)
            mask = np.zeros(n, dtype=bool)
            mask[cand] = True
            frontier = np.nonzero(mask)[0]
            levels[frontier] = level + 1
            level += 1
        else:
            # dense device steps while the frontier stays heavy
            coo = graph.device_pull()
            pull_indptr = getattr(graph, "_pull_indptr_dev", None)
            if pull_indptr is None:
                pull_indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
                graph._pull_indptr_dev = pull_indptr
            levels_d = jnp.asarray(levels)
            f_mask = np.zeros(n, dtype=np.int32)
            f_mask[frontier] = 1
            frontier_d = jnp.asarray(f_mask)
            impl = getattr(cfg, "spmv_impl", "scan") or "scan"
            while True:
                levels_d, frontier_d = _bfs_dense_step(
                    levels_d, frontier_d, jnp.int32(level), coo.src, coo.dst,
                    pull_indptr, n, impl,
                )
                level += 1
                frontier = np.nonzero(np.asarray(frontier_d))[0]
                if frontier.size == 0:
                    break
                fe = int((indptr_h[frontier + 1] - indptr_h[frontier]).sum())
                if fe <= tau:
                    break
            levels = np.array(levels_d)
    return levels, level


@register("bfs")
def bfs(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.source_vertex is None:
        raise ValueError("bfs requires source-vertex")
    src_dense = graph.dense_source(params.source_vertex)
    impl = getattr(cfg, "bfs_impl", "auto")
    if impl in ("auto", "adaptive"):
        levels, niter = bfs_adaptive_run(graph, src_dense, cfg)
        levels = np.asarray(levels).astype(np.int64)
    elif impl == "hybrid":
        levels, niter = bfs_hybrid_run(graph, src_dense, cfg)
        levels = levels.astype(np.int64)
    else:
        coo = graph.device_pull()
        indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
        levels, niter = _bfs_kernel(
            coo.src, coo.dst, indptr, jnp.int32(src_dense), graph.n, cfg.spmv_impl
        )
        levels = np.asarray(levels).astype(np.int64)
    levels[levels == INT32_INF] = UNREACHABLE
    return AlgorithmResult("bfs", levels, iterations=int(niter))
