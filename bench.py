"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: CDLP throughput in processed incidence edges per second
on a datagen-7_5-fb-scale power-law graph (the reference fork's own
headline workload). Baseline: the reference's CPU LAGraph_cdlp at
~1,500 ms per iteration on datagen-7_5-fb (ECE508_Final_Report.pdf §4.1;
BASELINE.md), i.e. 2 × 34,185,747 stored edges / 1.5 s ≈ 45.6M edges/s.

Secondary metrics (reported in "details"): PageRank SpMV nnz/s per chip
and BFS GTEPS — the north-star metrics named in BASELINE.json.

Environment knobs: GRAPHTPU_BENCH_SCALE (default 20),
GRAPHTPU_BENCH_EDGE_FACTOR (default 32), GRAPHTPU_BENCH_ITERS (default 10).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import graphtpu  # noqa: F401  (enables x64 config; compute stays f32/int32)

# Reference CPU baseline (BASELINE.md): datagen-7_5-fb, 34,185,747 undirected
# edges (2x stored, LAGraph holds both directions), ~1.5 s per CDLP iteration.
BASELINE_CDLP_EDGES_PER_S = 2 * 34_185_747 / 1.5


def _sync(x):
    """Force real device synchronization.

    Under this environment's axon TPU relay, `block_until_ready()` returns
    before the computation drains; a device-to-host copy of a reduced
    scalar is the reliable fence.
    """
    import jax.numpy as jnp

    if hasattr(x, "block_until_ready"):
        return float(jnp.max(x))
    return x


def main() -> None:
    import jax
    import jax.numpy as jnp

    from graphtpu.algorithms.cdlp import build_incidence
    from graphtpu.utils.synth import rmat_graph

    scale = int(os.environ.get("GRAPHTPU_BENCH_SCALE", "20"))
    edge_factor = int(os.environ.get("GRAPHTPU_BENCH_EDGE_FACTOR", "32"))
    itermax = int(os.environ.get("GRAPHTPU_BENCH_ITERS", "10"))

    # generation is host-side and deterministic; cache it like the
    # reference caches its ingest artifacts (load-graph.sh:50-67)
    from graphtpu.ingest import cache as cache_mod

    cache_dir = os.environ.get("GRAPHTPU_BENCH_CACHE", "./intermediate")
    gname = f"bench-rmat-s{scale}-ef{edge_factor}"
    t0 = time.perf_counter()
    g = None
    if cache_mod.exists(cache_dir, gname):
        try:
            g = cache_mod.load(cache_dir, gname)
        except ValueError:
            g = None  # stale cache version — regenerate
    if g is None:
        g = rmat_graph(scale, edge_factor, directed=False, seed=42)
        cache_mod.save(g, cache_dir, gname)
    gen_s = time.perf_counter() - t0

    # ---------------- CDLP (headline, single-dispatch adaptive) ----------------
    # full slab steps while labels churn, compacted active-set steps once
    # the frontier fits — one jit dispatch for the whole itermax run
    # (graphtpu/ops/active.py)
    from graphtpu.ops.active import cdlp_adaptive_device_run, prepare_cdlp_adaptive
    from graphtpu.utils.config import PlatformConfig

    cfg = PlatformConfig()
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    inc_nnz = centers.shape[0]

    prep = prepare_cdlp_adaptive(g, centers, neigh, deg, cfg)
    labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
    _sync(labels)  # warmup/compile
    t0 = time.perf_counter()
    labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
    _sync(labels)
    cdlp_s = time.perf_counter() - t0
    iters_done = max(int(it), 1)
    cdlp_edges_per_s = inc_nnz * iters_done / cdlp_s
    cdlp_ms_per_iter = cdlp_s * 1000.0 / iters_done

    # ---------------- PageRank SpMV nnz/s (slab pull plan) ----------------
    out_deg = jnp.asarray(g.out_degree.astype(np.int32))
    n = g.n
    pr_iters = 20

    from graphtpu.algorithms.pr import _pr_slab_kernel
    from graphtpu.ops.spmv import build_pull_plan

    plan = build_pull_plan(g, wdtype=np.float32, with_values=False)
    pargs = (plan, out_deg, jnp.float32(0.85), n, pr_iters)
    _sync(_pr_slab_kernel(*pargs))
    t0 = time.perf_counter()
    _sync(_pr_slab_kernel(*pargs))
    pr_s = time.perf_counter() - t0
    pr_nnz_per_s = g.nnz * pr_iters / pr_s

    # ---------------- BFS GTEPS (single-dispatch adaptive) ----------------
    from graphtpu.algorithms.bfs import bfs_adaptive_run

    levels, nit = bfs_adaptive_run(g, 0, cfg)
    t0 = time.perf_counter()
    levels, nit = bfs_adaptive_run(g, 0, cfg)
    bfs_s = time.perf_counter() - t0
    bfs_gteps = g.nnz / bfs_s / 1e9

    backend = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": "cdlp_edges_per_s",
                "value": round(cdlp_edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(cdlp_edges_per_s / BASELINE_CDLP_EDGES_PER_S, 3),
                "details": {
                    "backend": backend,
                    "graph": f"rmat scale={scale} ef={edge_factor} undirected",
                    "n": g.n,
                    "nnz_stored": g.nnz,
                    "cdlp_ms_per_iter": round(cdlp_ms_per_iter, 2),
                    "cdlp_iters": iters_done,
                    "baseline_cdlp_ms_per_iter_cpu": 1500.0,
                    "pr_nnz_per_s": round(pr_nnz_per_s, 1),
                    "bfs_gteps": round(bfs_gteps, 4),
                    "bfs_iters": int(nit),
                    "gen_s": round(gen_s, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
