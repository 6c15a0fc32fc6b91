"""Per-phase BFS breakdown + primitive roofline on the real TPU.

VERDICT r2 #1: nobody can say where the 0.95s/0.51s of an adaptive BFS
traversal goes. This script (a) microbenches the primitives the kernel
is built from (dispatch overhead, n-sort, trunc-table gather, dense
gather+segment-reduce), (b) replays the traversal level-by-level with
standalone jitted mirrors of the kernel's phase bodies, syncing between
levels, and (c) prints measured-vs-roof per phase.

    PYTHONPATH=/root/repo python scripts/perf/bfs_phases.py [scale] [ef] [src]

Every timed region is fenced with a D2H reduction (block_until_ready
returns early under the axon relay). The phase mirrors duplicate the
closures in graphtpu/algorithms/bfs.py::_bfs_adaptive_kernel on purpose:
they must be separately dispatchable, and the production kernel must
stay a single fused dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def sync(x):
    import jax.numpy as jnp

    return float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


def timeit(fn, reps=3):
    """Best-of-reps seconds; fn must sync internally."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from functools import partial

    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import rmat_graph
    from graphtpu.core.types import INT32_INF

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    src = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    print(f"backend={jax.devices()[0].platform} scale={scale} ef={ef} src={src}", flush=True)

    gname = f"bench-rmat-s{scale}-ef{ef}"
    t0 = time.perf_counter()
    g = cache_mod.load("./intermediate", gname) if cache_mod.exists("./intermediate", gname) else None
    if g is None:
        g = rmat_graph(scale, ef, directed=False, seed=42)
        cache_mod.save(g, "./intermediate", gname)
    print(f"graph ready {time.perf_counter()-t0:.1f}s n={g.n} nnz={g.nnz}", flush=True)

    cfg = PlatformConfig()
    n, m = g.n, g.nnz

    # ---------------- primitive microbench ----------------
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.frontier import compact, compact_stream, expand, frontier_deg_sum
    from graphtpu.ops.spmv import pull_reduce

    nop = jax.jit(lambda x: x + 1)
    x8 = jnp.arange(8, dtype=jnp.int32)
    sync(nop(x8))
    t_nop = timeit(lambda: sync(nop(x8)), reps=5)
    print(f"[prim] dispatch+sync overhead: {t_nop*1e3:.2f} ms", flush=True)

    vec_n = jnp.arange(n, dtype=jnp.int32)
    sort_j = jax.jit(jnp.sort)
    sync(sort_j(vec_n))
    t_sort = timeit(lambda: sync(sort_j(vec_n)))
    print(f"[prim] sort n={n}: {(t_sort-t_nop)*1e3:.2f} ms = {(t_sort-t_nop)/n*1e9:.2f} ns/el", flush=True)

    rng = np.random.default_rng(0)
    for sz_name, sz in (("8n (trunc tbl)", 8 * n), ("m (dense)", m)):
        idx = jnp.asarray(rng.integers(0, n, size=sz).astype(np.int32))
        tbl = jnp.ones((n + 1,), jnp.int32)
        gj = jax.jit(lambda t, i: jnp.max(table_gather(t, i)))
        sync(gj(tbl, idx))
        t_g = timeit(lambda: sync(gj(tbl, idx)))
        print(
            f"[prim] table_gather {sz_name} ({sz}): {(t_g-t_nop)*1e3:.1f} ms = "
            f"{(t_g-t_nop)/sz*1e9:.2f} ns/idx",
            flush=True,
        )

    # dense pull step cost = gather at edges_src + segment reduce
    from graphtpu.algorithms.bfs import (
        BFS_TRUNC,
        _bfs_dense_step,
        bfs_adaptive_prep,
        bfs_adaptive_run,
    )

    prep = bfs_adaptive_prep(g)
    (coo, pull_indptr, deg_pad, push_indptr, push_dst, pull_deg_pad, trunc_tbl) = prep
    fmask = jnp.zeros((n,), jnp.int32).at[src].set(1)
    levels_x = jnp.full((n,), INT32_INF, jnp.int32).at[src].set(0)
    impl = getattr(cfg, "spmv_impl", "scan") or "scan"
    sync(_bfs_dense_step(levels_x, fmask, jnp.int32(0), coo.src, coo.dst, pull_indptr, n, impl)[0])
    t_dense = timeit(
        lambda: sync(
            _bfs_dense_step(levels_x, fmask, jnp.int32(0), coo.src, coo.dst, pull_indptr, n, impl)[0]
        )
    )
    print(f"[prim] dense pull step: {(t_dense-t_nop)*1e3:.1f} ms = {(t_dense-t_nop)/m*1e9:.2f} ns/edge", flush=True)

    # ---------------- end-to-end adaptive ----------------
    levels, it = bfs_adaptive_run(g, src, cfg)
    sync(levels)
    t_total = timeit(lambda: sync(bfs_adaptive_run(g, src, cfg)[0]))
    print(f"[e2e] adaptive: {t_total:.3f}s = {m/t_total/1e9:.3f} GTEPS ({it} levels)", flush=True)

    # ---------------- per-level replay (tier-ladder kernel) ----------------
    from graphtpu.algorithms.bfs import BFS_TRUNC

    t_trunc = int(getattr(cfg, "bfs_trunc", 0) or BFS_TRUNC)
    e_cap = int(getattr(cfg, "bfs_frontier_edges", 0) or 1 << 22)
    edge_tiers = [t for t in (1 << 16, 1 << 18, 1 << 20) if t < e_cap] + [e_cap]
    k_cap = int(getattr(cfg, "bfs_frontier_rows", 0) or 1 << 18)
    tiers = tuple((min(k_cap, e, n), e) for e in edge_tiers)
    k_bu = int(getattr(cfg, "bfs_bu_rows", 0) or 1 << 15)
    e_bu = int(getattr(cfg, "bfs_bu_edges", 0) or 1 << 18)
    deg_n = deg_pad[:-1]
    pdeg_n = pull_deg_pad[:-1]

    # prep must match the kernel's trunc depth
    if t_trunc != BFS_TRUNC:
        pass  # prep above already used default cfg -> BFS_TRUNC

    @jax.jit
    def status_j(levels, level, deg_n):
        fmask = levels == level
        return jnp.sum(fmask, dtype=jnp.int32), jnp.sum(
            jnp.where(fmask, deg_n, 0), dtype=jnp.int32
        )

    def make_tier_j(i):
        k, e = tiers[i]

        @jax.jit
        def tier_j(levels, level, deg_pad, push_indptr, push_dst):
            deg_n = deg_pad[:-1]
            ids, _ = compact(levels == level, k)
            exp = expand(ids, deg_pad, push_indptr, push_dst, e, with_row_ids=False)
            unvisited = exp.valid & (table_gather(levels, exp.neigh) == INT32_INF)
            ids2, cnt2 = compact_stream(exp.neigh, unvisited, k, n)
            applied = cnt2 <= k
            updated = levels.at[ids2].set(level + 1, mode="drop")
            return jnp.where(applied, updated, levels), applied

        return tier_j

    tier_js = [make_tier_j(i) for i in range(len(tiers))]

    @jax.jit
    def bu_j(levels, level, trunc_tbl, pdeg_n, pull_deg_pad, pull_indptr, esrc):
        fmask_pad = jnp.concatenate(
            [(levels == level).astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        hit = jnp.max(table_gather(fmask_pad, trunc_tbl).reshape(t_trunc, n), axis=0)
        unvis = levels == INT32_INF
        claim_trunc = unvis & (hit == 1)
        resid_mask = unvis & (pdeg_n > t_trunc) & (hit == 0)
        rids, rcnt = compact(resid_mask, k_bu)
        fe_r = frontier_deg_sum(rids, pull_deg_pad)
        ok = (rcnt <= k_bu) & (fe_r <= e_bu)
        exp = expand(rids, pull_deg_pad, pull_indptr, esrc, e_bu, with_row_ids=False)
        rhit = (exp.valid & (table_gather(fmask_pad, exp.neigh) == 1)).astype(jnp.int32)
        cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(rhit, dtype=jnp.int32)])
        seg_hits = table_gather(cs, exp.seg_starts[1:]) - table_gather(cs, exp.seg_starts[:-1])
        claimed_ids = jnp.where(seg_hits > 0, rids, jnp.int32(n))
        updated = jnp.where(claim_trunc, level + 1, levels)
        updated = updated.at[claimed_ids].set(level + 1, mode="drop")
        return jnp.where(ok, updated, levels), ok, rcnt, fe_r

    @jax.jit
    def bu_trunc_only(levels, level, trunc_tbl):
        fmask_pad = jnp.concatenate(
            [(levels == level).astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        hit = jnp.max(table_gather(fmask_pad, trunc_tbl).reshape(t_trunc, n), axis=0)
        return jnp.sum(hit, dtype=jnp.int32)

    @jax.jit
    def dense_j(levels, level, esrc, edst, pull_indptr):
        fmask = (levels == level).astype(jnp.int32)
        levels, _ = _bfs_dense_step(levels, fmask, level, esrc, edst, pull_indptr, n, impl)
        return levels

    def tier_of(cnt, fe):
        for i, (k, e) in enumerate(tiers):
            if cnt <= k and fe <= e:
                return i
        return len(tiers)

    levels = jnp.full((n,), INT32_INF, jnp.int32).at[src].set(0)
    # warm all kernels
    sync(status_j(levels, jnp.int32(0), deg_n)[0])
    for tj in tier_js:
        sync(tj(levels, jnp.int32(0), deg_pad, push_indptr, push_dst)[0])
    sync(bu_j(levels, jnp.int32(0), trunc_tbl, pdeg_n, pull_deg_pad, pull_indptr, coo.src)[0])
    sync(bu_trunc_only(levels, jnp.int32(0), trunc_tbl))
    sync(dense_j(levels, jnp.int32(0), coo.src, coo.dst, pull_indptr)[0])

    levels = jnp.full((n,), INT32_INF, jnp.int32).at[src].set(0)
    level = 0
    tot = 0.0
    while level < n:
        cnt, fe = status_j(levels, jnp.int32(level), deg_n)
        cnt, fe = int(cnt), int(fe)
        if cnt == 0:
            break
        ti = tier_of(cnt, fe)
        extra = ""
        t0 = time.perf_counter()
        if ti < len(tiers):
            new_levels, applied = tier_js[ti](levels, jnp.int32(level), deg_pad, push_indptr, push_dst)
            sync(new_levels)
            dt = time.perf_counter() - t0
            phase = f"tier{ti}(e=2^{tiers[ti][1].bit_length()-1})"
            ok = bool(applied)
        else:
            new_levels, ok, rcnt, fe_r = bu_j(levels, jnp.int32(level), trunc_tbl, pdeg_n, pull_deg_pad, pull_indptr, coo.src)
            sync(new_levels)
            dt = time.perf_counter() - t0
            phase = "bu"
            ok = bool(ok)
            t0b = time.perf_counter()
            sync(bu_trunc_only(levels, jnp.int32(level), trunc_tbl))
            extra = f" resid_rows={int(rcnt)} resid_edges={int(fe_r)} trunc_only={(time.perf_counter()-t0b-t_nop)*1e3:.1f}ms"
        if not ok:
            t0 = time.perf_counter()
            new_levels = dense_j(levels, jnp.int32(level), coo.src, coo.dst, pull_indptr)
            sync(new_levels)
            dt = time.perf_counter() - t0
            phase += "->dense"
        levels = new_levels
        tot += dt - t_nop
        print(
            f"[level {level}] phase={phase} frontier={cnt} f_edges={fe} "
            f"step={(dt-t_nop)*1e3:.1f} ms{extra}",
            flush=True,
        )
        level += 1

    t_status = timeit(lambda: sync(status_j(levels, jnp.int32(0), deg_n)[0]))
    print(
        f"[replay] sum of steps (dispatch-corrected): {tot*1e3:.1f} ms; "
        f"single-dispatch e2e was {t_total*1e3:.1f} ms; "
        f"status {(t_status-t_nop)*1e3:.2f} ms/eval",
        flush=True,
    )


if __name__ == "__main__":
    main()
