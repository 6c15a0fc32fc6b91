"""Single-source shortest paths — iterative min.plus relaxation.

Semantics match the reference (sssp.cpp:60-78: delta-stepping
LAGr_SingleSourceShortestPath over FP64 weights with an explicit zero
diagonal): distances from the source over directed weighted edges;
unreachable vertices serialize as the literal "infinity" (sssp.cpp:45).

TPU design: dense distance vector; each iteration relaxes every edge at
once — new[v] = min(dist[v], min over in-edges (dist[u] + w)) — one
min.plus SpMV (gather + segment-min) under `lax.while_loop` until fixed
point. This is Bellman-Ford, which on TPUs beats bucketed delta-stepping:
the whole edge stream is processed in one vectorized sweep with no
data-dependent bucketing, and the iteration count is bounded by the hop
diameter of the shortest-path tree (small for Graphalytics graphs).

Hybrid mode (default): weighted graphs take more relaxation rounds than
the hop diameter, and in the settled tail only a few distances still
improve. Like hybrid BFS, rounds whose changed set touches few edges
relax on the host over the push CSR (monotone relaxations commute, so
the fixed point is unchanged); only heavy rounds pay the dense
device sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.algorithms.common import AlgorithmResult, float_dtype, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


@partial(jax.jit, static_argnames=("n", "impl"))
def _sssp_kernel(edges_src, edges_dst, indptr, edges_w, source, n, impl="scan"):
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    dtype = edges_w.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    dist0 = jnp.full((n,), inf, dtype=dtype).at[source].set(0.0)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        dist, _, it = state
        relaxed = pull_reduce(
            "min", table_gather(dist, edges_src, chunk=EDGE_STREAM_CHUNK) + edges_w,
        edges_dst, indptr, n, inf, impl
        )
        new = jnp.minimum(dist, relaxed)
        changed = jnp.any(new < dist)
        return new, changed, it + 1

    dist, _, it = jax.lax.while_loop(cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist, it


@partial(jax.jit, static_argnames=("n", "impl"))
def _sssp_dense_step(dist, edges_src, edges_dst, indptr, edges_w, n, impl="scan"):
    """One synchronous relaxation of every edge; returns (new dist,
    changed mask)."""
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
    from graphtpu.ops.spmv import pull_reduce

    inf = jnp.asarray(jnp.inf, dist.dtype)
    relaxed = pull_reduce(
        "min", table_gather(dist, edges_src, chunk=EDGE_STREAM_CHUNK) + edges_w,
        edges_dst, indptr, n, inf, impl
    )
    new = jnp.minimum(dist, relaxed)
    return new, new < dist


@partial(jax.jit, static_argnames=("n", "tiers", "impl"))
def _sssp_adaptive_kernel(
    dist0, src, edges_src, edges_dst, pull_indptr, pull_w,
    deg_pad, push_indptr, push_dst, push_w, n, tiers, impl="scan",
):
    """Single-dispatch changed-set Bellman-Ford with a TIERED frontier
    ladder: rounds whose changed set fits a tier's static (rows, edges)
    budget relax only those vertices' out-edges through the compacted
    frontier engine at the SMALLEST fitting tier; heavier rounds run the
    dense sweep. One jit dispatch for the whole fixed-point iteration.

    Unlike CDLP (where a ladder measured slower — the changed set
    collapses abruptly, ops/active.py cdlp_tiers), SSSP's cost lives in
    the active steps on high-diameter graphs: the 512^2 torus ran 560
    rounds of ~2k-vertex wavefronts, and shrinking the step budget from
    (2^16, 2^18) to (2^13, 2^15) measured 3.67 -> 1.47 s — 2.1x FASTER
    than the dense sweep that used to win that regime. The ladder gives
    small wavefronts the small budget and power-law mid-rounds the big
    one without config.

    SSSP's active set is the changed vertices themselves (no neighbor
    union), so tier routing is exact and cheap: one n-mask compact +
    ONE fused mask reduction per step (ops/frontier.mask_status)."""
    from graphtpu.ops.frontier import compact, expand, mask_status
    from graphtpu.ops.gather import table_gather

    deg_n = deg_pad[:-1]
    m_edges = int(edges_src.shape[0])
    T = len(tiers)
    FULL = T
    k_max = tiers[-1][0]
    IMAX = jnp.int32(np.iinfo(np.int32).max)

    def chosen(acnt, ae):
        c = jnp.int32(FULL)
        for i in range(T - 1, -1, -1):
            k_i, e_i = tiers[i]
            c = jnp.where((acnt <= k_i) & (ae <= e_i), jnp.int32(i), c)
        return c

    def derive(changed_mask):
        ids, _ = compact(changed_mask, k_max)
        cnt, fe = mask_status(changed_mask, deg_n, m_edges)
        return ids, cnt, fe

    def full_step(dist):
        new, changed_mask = _sssp_dense_step(
            dist, edges_src, edges_dst, pull_indptr, pull_w, n, impl
        )
        ids, acnt, ae = derive(changed_mask)
        return new, ids, acnt, ae

    def make_tier_step(i):
        k_i, e_i = tiers[i]

        def tier_step(s):
            dist, ids, _, _, it, counts = s
            counts = counts.at[i].add(1)
            ids_i = jax.lax.slice_in_dim(ids, 0, k_i)  # sorted, pad = n
            exp = expand(ids_i, deg_pad, push_indptr, push_dst, e_i)
            du = table_gather(dist, jnp.where(exp.valid, exp.row_ids, 0))
            cand = du + table_gather(push_w, exp.gpos)
            targets = jnp.where(exp.valid, exp.neigh, jnp.int32(n))
            new = dist.at[targets].min(
                jnp.where(exp.valid, cand, jnp.inf), mode="drop"
            )
            ids2, acnt, ae = derive(new < dist)
            return new, ids2, acnt, ae, it + 1, counts

        return tier_step

    # state: (dist, ids[k_max], acnt, ae, it, counts[T+1]); acnt==0 ends
    def full_phase(state):
        def cond(s):
            _, _, acnt, ae, it, _ = s
            return (acnt > 0) & (chosen(acnt, ae) == FULL) & (it < n)

        def body(s):
            dist, _, _, _, it, counts = s
            new, ids, acnt, ae = full_step(dist)
            return new, ids, acnt, ae, it + 1, counts.at[FULL].add(1)

        return jax.lax.while_loop(cond, body, state)

    def make_tier_phase(i, step):
        def phase(state):
            def cond(s):
                _, _, acnt, ae, it, _ = s
                return (acnt > 0) & (chosen(acnt, ae) == i) & (it < n)

            return jax.lax.while_loop(cond, step, state)

        return phase

    tier_phases = [make_tier_phase(i, make_tier_step(i)) for i in range(T)]

    fmask0 = jnp.zeros((n,), bool).at[src].set(True)
    ids0, acnt0, ae0 = derive(fmask0)
    state = (dist0, ids0, acnt0, ae0, jnp.int32(0),
             jnp.zeros((T + 1,), jnp.int32))

    def outer_cond(s):
        _, _, acnt, _, it, _ = s
        return (acnt > 0) & (it < n)

    def outer_body(s):
        for ph in tier_phases:
            s = ph(s)
        return full_phase(s)

    dist, _, _, _, it, counts = jax.lax.while_loop(
        outer_cond, outer_body, state
    )
    return dist, it, counts


def sssp_tiers(k_cap: int, e_cap: int, cfg=None) -> tuple:
    """Frontier ladder for the tiered SSSP: a small tier at 1/8 the
    configured budgets (the torus-measured winner for thin wavefronts)
    under the configured (sssp-frontier-rows/edges) tier. `sssp-tiers`
    (comma edge budgets, rows = e/4 capped at the configured rows)
    overrides."""
    cfg_tiers = getattr(cfg, "sssp_tiers", "") or ""
    if cfg_tiers:
        edge_tiers = sorted({int(t) for t in str(cfg_tiers).split(",") if t})
        return tuple((min(k_cap, max(e // 4, 1)), e) for e in edge_tiers)
    small = (max(k_cap // 8, 1), max(e_cap // 8, 1))
    return (small, (k_cap, e_cap)) if small != (k_cap, e_cap) else ((k_cap, e_cap),)


@partial(jax.jit, static_argnames=("n", "k_cap", "e_cap", "impl"))
def _sssp_delta_kernel(
    dist0, src, edges_src, edges_dst, pull_indptr, pull_w,
    light_deg_pad, light_indptr, light_dst, light_w,
    heavy_deg_pad, heavy_indptr, heavy_dst, heavy_w,
    inv_delta, n, k_cap, e_cap, impl="scan",
):
    """Single-dispatch bucketed delta-stepping — the TPU counterpart of
    the reference's LAGr_SingleSourceShortestPath with Delta=2.5
    (sssp.cpp:70-78). Vertices are processed in buckets of width delta by
    tentative distance; within a bucket, light edges (w <= delta) relax
    to a fixed point through the compacted frontier engine, then heavy
    edges (w > delta) of the now-settled bucket relax once. Heavy
    relaxations land strictly beyond the next bucket boundary, so every
    bucket is final when left — the property that bounds re-relaxations
    on high-diameter weighted graphs where plain Bellman-Ford's round
    count blows up.

    Capacity gating follows the repo's nested-phase-while_loop pattern
    (a lax.cond in a loop body schedules both branches on TPU): an
    active set that overflows the static frontier capacities falls back
    to one dense full-edge sweep, which is always safe — monotone
    relaxations never break the upper-bound invariant."""
    from graphtpu.ops.frontier import compact, expand
    from graphtpu.ops.gather import table_gather

    dtype = dist0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    imax = jnp.int32(np.iinfo(np.int32).max)
    light_deg_n = light_deg_pad[:-1]
    heavy_deg_n = heavy_deg_pad[:-1]

    def bucket(dist):
        # floor(dist/delta); inf (and anything overflowing int32) -> imax
        b = jnp.floor(dist * inv_delta)
        return jnp.where(
            b >= jnp.asarray(2**31 - 1, dtype), imax, b.astype(jnp.int32)
        )

    def relax_frontier(dist, ids, deg_pad, indptr, dst, w):
        """Scatter-min relaxation of the out-edges of `ids` in one CSR."""
        exp = expand(ids, deg_pad, indptr, dst, e_cap)
        du = table_gather(dist, jnp.where(exp.valid, exp.row_ids, 0))
        cand = du + table_gather(w, exp.gpos)
        targets = jnp.where(exp.valid, exp.neigh, jnp.int32(n))
        new = dist.at[targets].min(jnp.where(exp.valid, cand, inf), mode="drop")
        return new, new < dist

    def derive_light(dist, changed, k):
        active = changed & (bucket(dist) == k)
        ids, cnt = compact(active, k_cap)
        fe = jnp.sum(jnp.where(active, light_deg_n, 0), dtype=jnp.int32)
        fits = (cnt <= k_cap) & (fe <= e_cap)
        return ids, fits, cnt > 0

    # ---- light fixed point within bucket k ----
    # state: (dist, changed, ids, fits, any_active, k, it)
    def light_active_phase(s):
        def cond(st):
            _, _, _, fits, any_a, _, it = st
            return any_a & fits & (it < 4 * n)

        def body(st):
            dist, changed, ids, _, _, k, it = st
            new, improved = relax_frontier(
                dist, ids, light_deg_pad, light_indptr, light_dst, light_w
            )
            changed = changed.at[ids].set(False, mode="drop") | improved
            ids2, fits, any_a = derive_light(new, changed, k)
            return new, changed, ids2, fits, any_a, k, it + 1

        return jax.lax.while_loop(cond, body, s)

    def light_dense_phase(s):
        def cond(st):
            _, _, _, fits, any_a, _, it = st
            return any_a & (~fits) & (it < 4 * n)

        def body(st):
            dist, _, _, _, _, k, it = st
            new, improved = _sssp_dense_step(
                dist, edges_src, edges_dst, pull_indptr, pull_w, n, impl
            )
            # a dense sweep relaxes every vertex's edges: the changed set
            # collapses to exactly the improved vertices
            ids2, fits, any_a = derive_light(new, improved, k)
            return new, improved, ids2, fits, any_a, k, it + 1

        return jax.lax.while_loop(cond, body, s)

    # ---- heavy relaxation of the settled bucket (once) ----
    # state: (dist, changed, pending, k, it)
    def heavy_phases(s):
        def derive_heavy(dist, k):
            mask = bucket(dist) == k
            ids, cnt = compact(mask, k_cap)
            fe = jnp.sum(jnp.where(mask, heavy_deg_n, 0), dtype=jnp.int32)
            fits = (cnt <= k_cap) & (fe <= e_cap)
            return ids, fits

        def cond_f(st):
            dist, _, pending, k, it = st
            _, fits = derive_heavy(dist, k)
            return pending & fits & (it < 4 * n)

        def body_f(st):
            dist, changed, _, k, it = st
            ids, _ = derive_heavy(dist, k)
            new, improved = relax_frontier(
                dist, ids, heavy_deg_pad, heavy_indptr, heavy_dst, heavy_w
            )
            changed = changed.at[ids].set(False, mode="drop") | improved
            return new, changed, jnp.bool_(False), k, it + 1

        def cond_d(st):
            dist, _, pending, k, it = st
            _, fits = derive_heavy(dist, k)
            return pending & (~fits) & (it < 4 * n)

        def body_d(st):
            dist, _, _, k, it = st
            new, improved = _sssp_dense_step(
                dist, edges_src, edges_dst, pull_indptr, pull_w, n, impl
            )
            return new, improved, jnp.bool_(False), k, it + 1

        s = jax.lax.while_loop(cond_f, body_f, s)
        return jax.lax.while_loop(cond_d, body_d, s)

    dist0 = dist0.at[src].set(jnp.asarray(0.0, dtype))
    changed0 = jnp.zeros((n,), bool).at[src].set(True)

    # outer state: (dist, changed, k, it)
    def outer_cond(s):
        _, _, k, it = s
        return (k < imax) & (it < 4 * n)

    def outer_body(s):
        dist, changed, k, it = s
        ids, fits, any_a = derive_light(dist, changed, k)
        dist, changed, _, _, _, _, it = jax.lax.while_loop(
            lambda st: st[4],
            lambda st: light_dense_phase(light_active_phase(st)),
            (dist, changed, ids, fits, any_a, k, it),
        )
        dist, changed, _, _, it = heavy_phases(
            (dist, changed, jnp.bool_(True), k, it)
        )
        b = bucket(dist)
        k_next = jnp.min(jnp.where(b > k, b, imax))
        return dist, changed, k_next, it

    dist, _, _, it = jax.lax.while_loop(
        outer_cond, outer_body, (dist0, changed0, jnp.int32(0), jnp.int32(0))
    )
    return dist, it


def sssp_delta_prep(graph: Graph, delta: float, dtype=np.float32):
    """Light/heavy push-CSR split (w <= delta vs w > delta) plus the full
    pull arrays for the dense fallback, cached on the Graph per
    (delta, dtype). The split is the TPU analogue of LAGraph's one-time
    tl/th matrix selects inside LAGr_SingleSourceShortestPath."""
    key = (float(delta), np.dtype(dtype).name)
    cache = getattr(graph, "_sssp_delta_prep", None)
    if cache is None or cache[0] != key:
        coo = graph.device_pull(wdtype=dtype)
        w = graph.w.astype(dtype)
        deg = graph.out_degree
        n = graph.n
        light = w <= dtype(delta)

        src_rep = np.repeat(np.arange(n, dtype=np.int64), deg)

        def split(mask):
            # per-source counts of the masked edges, preserving CSR order
            cnt = np.bincount(src_rep[mask], minlength=n).astype(np.int64)
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(cnt, out=indptr[1:])
            dst_m = graph.dst[mask].astype(np.int32)
            w_m = w[mask]
            if dst_m.size == 0:
                # zero-length gathers are illegal in XLA; one inert
                # sentinel edge (all degrees stay 0, so it is never a
                # valid expansion slot and only ever read masked)
                dst_m = np.zeros(1, dtype=np.int32)
                w_m = np.full(1, np.inf, dtype=dtype)
            return (
                jnp.asarray(np.concatenate([cnt, [0]]).astype(np.int32)),
                jnp.asarray(indptr.astype(np.int32)),
                jnp.asarray(dst_m),
                jnp.asarray(w_m),
            )

        cache = (
            key,
            coo,
            jnp.asarray(graph.pull_indptr.astype(np.int32)),
            split(light),
            split(~light),
        )
        graph._sssp_delta_prep = cache
    return cache[1:]


def sssp_delta_run(graph: Graph, src_dense: int, cfg=None, dtype=np.float32):
    """Entry point for the single-dispatch delta-stepping SSSP."""
    n = graph.n
    delta = float(getattr(cfg, "sssp_delta", 0) or 2.5)
    coo, pull_indptr, light, heavy = sssp_delta_prep(graph, delta, dtype)
    k_cap = int(getattr(cfg, "sssp_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "sssp_frontier_edges", 0) or 1 << 18)
    dist0 = jnp.full((n,), jnp.inf, dtype=dtype)
    dist, niter = _sssp_delta_kernel(
        dist0,
        jnp.int32(src_dense),
        coo.src,
        coo.dst,
        pull_indptr,
        coo.w,
        *light,
        *heavy,
        jnp.asarray(1.0 / delta, dtype),
        n,
        k_cap,
        e_cap,
        getattr(cfg, "spmv_impl", "scan") or "scan",
    )
    return np.asarray(dist), int(niter)


def sssp_adaptive_prep(graph: Graph, dtype=np.float32):
    """Device-resident arrays for the adaptive SSSP kernel, cached on the
    Graph."""
    key = np.dtype(dtype).name
    cache = getattr(graph, "_sssp_adaptive_prep", None)
    if cache is None or cache[0] != key:
        coo = graph.device_pull(wdtype=dtype)
        cache = (
            key,
            coo,
            jnp.asarray(graph.pull_indptr.astype(np.int32)),
            jnp.asarray(
                np.concatenate([graph.out_degree, [0]]).astype(np.int32)
            ),
            jnp.asarray(graph.indptr.astype(np.int32)),
            jnp.asarray(graph.dst.astype(np.int32)),
            jnp.asarray(graph.w.astype(dtype)),
        )
        graph._sssp_adaptive_prep = cache
    return cache[1:]


def sssp_adaptive_run(graph: Graph, src_dense: int, cfg=None, dtype=np.float32,
                      with_stats: bool = False):
    """Entry point for the single-dispatch adaptive SSSP. With
    `with_stats`, also returns phase counters for executed-volume
    roofline accounting."""
    n = graph.n
    coo, pull_indptr, deg_pad, push_indptr, push_dst, push_w = sssp_adaptive_prep(
        graph, dtype
    )
    k_cap = int(getattr(cfg, "sssp_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "sssp_frontier_edges", 0) or 1 << 18)
    tiers = sssp_tiers(k_cap, e_cap, cfg)
    dist0 = jnp.full((n,), jnp.inf, dtype=dtype).at[src_dense].set(0.0)
    dist, niter, counts = _sssp_adaptive_kernel(
        dist0,
        jnp.int32(src_dense),
        coo.src,
        coo.dst,
        pull_indptr,
        coo.w,
        deg_pad,
        push_indptr,
        push_dst,
        push_w,
        n,
        tiers,
        getattr(cfg, "spmv_impl", "scan") or "scan",
    )
    if with_stats:
        # one D2H for every counter (a separate int() per scalar costs a
        # ~25 ms relay roundtrip each inside bench timed regions)
        niter, c = jax.device_get((niter, counts))
        stats = {
            "full_steps": int(c[-1]),
            "active_steps": int(niter) - int(c[-1]),
            "tier_steps": {int(e): int(c[i]) for i, (_, e) in enumerate(tiers)},
            "tiers": [(int(k), int(e)) for k, e in tiers],
            "e_cap": e_cap,
            "k_cap": k_cap,
        }
        return np.asarray(dist), int(niter), stats
    return np.asarray(dist), int(niter)


def sssp_hybrid_run(graph: Graph, src_dense: int, cfg=None, dtype=np.float32):
    """Changed-set Bellman-Ford: rounds whose changed vertices touch less
    than `sssp_active_threshold` of the edges relax on the host over the
    push CSR; heavy rounds run the dense device sweep. Returns
    (distances np array, rounds)."""
    n, m = graph.n, graph.nnz
    indptr_h = graph.indptr
    dst_h = graph.dst
    w_h = graph.w.astype(dtype)
    threshold = getattr(cfg, "sssp_active_threshold", None)
    if threshold is None:  # explicit 0 forces the dense path every round
        threshold = 0.05
    tau = threshold * max(m, 1)

    dist = np.full(n, np.inf, dtype=dtype)
    dist[src_dense] = 0.0
    changed = np.array([src_dense], dtype=np.int64)
    rounds = 0
    while changed.size:
        fe = int((indptr_h[changed + 1] - indptr_h[changed]).sum())
        if fe <= tau:
            # host relaxation of the changed set's out-edges (reads are
            # synchronous: contributions computed before any update)
            from graphtpu.core.graph import frontier_edge_positions

            pos, rows_rep = frontier_edge_positions(indptr_h, changed)
            cand = dst_h[pos]
            newd = dist[rows_rep] + w_h[pos]
            improved = newd < dist[cand]
            cand, newd = cand[improved], newd[improved]
            np.minimum.at(dist, cand, newd)
            mask = np.zeros(n, dtype=bool)
            mask[cand] = True
            changed = np.nonzero(mask)[0]
            rounds += 1
        else:
            coo = graph.device_pull(wdtype=dtype)
            pull_indptr = getattr(graph, "_pull_indptr_dev", None)
            if pull_indptr is None:
                pull_indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
                graph._pull_indptr_dev = pull_indptr
            dist_d = jnp.asarray(dist)
            impl = getattr(cfg, "spmv_impl", "scan") or "scan"
            while True:
                dist_d, changed_d = _sssp_dense_step(
                    dist_d, coo.src, coo.dst, pull_indptr, coo.w, n, impl
                )
                rounds += 1
                changed = np.nonzero(np.asarray(changed_d))[0]
                if changed.size == 0:
                    break
                fe = int((indptr_h[changed + 1] - indptr_h[changed]).sum())
                if fe <= tau:
                    break
            dist = np.array(dist_d)
    return dist, rounds


@register("sssp")
def sssp(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    if params.source_vertex is None:
        raise ValueError("sssp requires source-vertex")
    if params.weight_property not in (None, "weight"):
        # dataset descriptors name the edge property used as the weight
        # (graph.<name>.sssp.weight-property); the ingest pipeline stores
        # exactly one edge property, "weight" (relabel.py:11-23 semantics)
        raise ValueError(
            f"unsupported sssp weight-property {params.weight_property!r}; "
            "only 'weight' exists in the ingested graph"
        )
    dtype = float_dtype(cfg)
    src_dense = graph.dense_source(params.source_vertex)
    impl = getattr(cfg, "sssp_impl", "auto")
    # auto == adaptive, by measurement, not by assumption: the round-4
    # TPU A/B (scripts/perf/measure_sssp.py, ROADMAP round-4 table) ran
    # adaptive vs delta(2.5/0.5/0.25/0.1) vs dense on BOTH regimes —
    # power-law (RMAT s20/ef16-w: adaptive 1.01 s < delta 1.21-1.57 s <
    # dense 1.47 s) and high-diameter (512^2 torus, 560 hop rounds:
    # TIERED adaptive 1.54 s < dense 3.15 s << delta 5.8-29.7 s,
    # degrading as Delta shrinks). On a TPU every round costs its
    # tier's static-shaped step, so delta-stepping's re-relaxation
    # savings never repay its extra bucket rounds — there is NO
    # crossover at which auto should pick anything else. delta stays as
    # the reference-parity arm (sssp.cpp:70-78).
    if impl in ("auto", "adaptive"):
        dist, niter = sssp_adaptive_run(graph, src_dense, cfg, dtype)
        return AlgorithmResult(
            "sssp", dist.astype(np.float64), iterations=int(niter)
        )
    if impl == "hybrid":
        dist, niter = sssp_hybrid_run(graph, src_dense, cfg, dtype)
        return AlgorithmResult(
            "sssp", dist.astype(np.float64), iterations=int(niter)
        )
    if impl == "delta":
        dist, niter = sssp_delta_run(graph, src_dense, cfg, dtype)
        return AlgorithmResult(
            "sssp", dist.astype(np.float64), iterations=int(niter)
        )
    coo = graph.device_pull(wdtype=dtype)
    indptr = jnp.asarray(graph.pull_indptr.astype(np.int32))
    dist, niter = _sssp_kernel(
        coo.src, coo.dst, indptr, coo.w, jnp.int32(src_dense), graph.n, cfg.spmv_impl
    )
    return AlgorithmResult("sssp", np.asarray(dist, dtype=np.float64), iterations=int(niter))
