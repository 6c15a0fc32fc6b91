"""Round-2 TPU measurement sweep: new BFS phases, LCC pair-list probe,
wedge-prep timing, CDLP regression check.

Run on the real TPU (no env overrides) once per kernel change:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/perf/measure_round2.py [scale] [ef]

Prints one line per measurement; every timed region is fenced with a
D2H reduction (block_until_ready returns early under the axon relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

# persist compiled executables across measurement processes (relay
# compiles cost minutes per bucket shape; must be set pre-import)
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def sync(x):
    import jax.numpy as jnp

    return float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


def main():
    import jax

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"backend={jax.devices()[0].platform} scale={scale} ef={ef}", flush=True)

    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import rmat_graph

    gname = f"bench-rmat-s{scale}-ef{ef}"
    t0 = time.perf_counter()
    g = cache_mod.load("./intermediate", gname) if cache_mod.exists("./intermediate", gname) else None
    if g is None:
        g = rmat_graph(scale, ef, directed=False, seed=42)
        cache_mod.save(g, "./intermediate", gname)
    print(f"graph ready {time.perf_counter()-t0:.1f}s n={g.n} nnz={g.nnz}", flush=True)
    cfg = PlatformConfig()

    # resumable sections (suite jobs run one algorithm per process; the
    # sweep frees each section's memoized device prep to match)
    sections = {
        s.strip()
        for s in os.environ.get("GRAPHTPU_MEASURE_SECTIONS", "bfs,lcc,cdlp").split(",")
        if s.strip()
    }
    unknown = sections - {"bfs", "lcc", "cdlp"}
    if unknown:
        # a typo'd section name would otherwise yield an empty run that
        # looks successful (ADVICE r2)
        print(f"unknown GRAPHTPU_MEASURE_SECTIONS: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)

    # ---------------- BFS (three-phase) ----------------
    from graphtpu.algorithms.bfs import bfs_adaptive_run

    if "bfs" not in sections:
        print("bfs section skipped", flush=True)
    for src in (0, 1, 12345) if "bfs" in sections else ():
        levels, it = bfs_adaptive_run(g, src, cfg)  # warm (compile once)
        sync(levels)
        t0 = time.perf_counter()
        levels, it = bfs_adaptive_run(g, src, cfg)
        sync(levels)
        dt = time.perf_counter() - t0
        print(
            f"bfs src={src}: {dt:.3f}s = {g.nnz/dt/1e9:.3f} GTEPS ({it} levels)",
            flush=True,
        )

    # free BFS device state before any later section runs (per-job
    # isolation — must happen even when lcc is skipped, ADVICE r2)
    for attr in ("_bfs_adaptive_prep", "_pull_indptr_dev"):
        if hasattr(g, attr):
            delattr(g, attr)

    # ---------------- LCC: prep + probe variants ----------------
    if "lcc" not in sections:
        print("lcc section skipped", flush=True)
        return _cdlp_section(g, cfg, sections)

    from graphtpu.ops.triangles import lcc_oriented_numerator, prepare_wedge_plan

    t0 = time.perf_counter()
    plan = prepare_wedge_plan(g, cache_dir="./intermediate")
    print(f"lcc prep: {time.perf_counter()-t0:.1f}s", flush=True)

    nums = {}
    for probe in ("pairs", "pairs-sorted", "square"):
        os.environ["GRAPHTPU_LCC_PROBE"] = probe
        t0 = time.perf_counter()
        nums[probe] = lcc_oriented_numerator(plan, progress=True)
        dt = time.perf_counter() - t0
        print(f"lcc numerator [{probe}]: {dt:.1f}s", flush=True)
    for probe, num in nums.items():
        if not np.array_equal(num, nums["pairs"]):
            print(f"lcc MISMATCH: {probe} != pairs", flush=True)

    # fill=0.5 halves the table (536 MB at s20/ef32) — tests whether the
    # probe is table-size bound rather than issue-rate bound
    os.environ["GRAPHTPU_LCC_PROBE"] = "pairs"
    os.environ["GRAPHTPU_LCC_HASH_FILL"] = "0.5"
    t0 = time.perf_counter()
    plan2 = prepare_wedge_plan(g, cache_dir="./intermediate")  # oriented cache hit; hash rebuilt at fill=0.5
    print(f"lcc re-prep fill=0.5: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    num2 = lcc_oriented_numerator(plan2)
    dt = time.perf_counter() - t0
    print(f"lcc numerator [pairs fill=0.5]: {dt:.1f}s "
          f"{'OK' if np.array_equal(num2, nums['pairs']) else 'MISMATCH'}",
          flush=True)
    del os.environ["GRAPHTPU_LCC_HASH_FILL"]
    del plan, plan2
    _cdlp_section(g, cfg, sections)


def _cdlp_section(g, cfg, sections):
    if "cdlp" not in sections:
        print("cdlp section skipped", flush=True)
        return

    # ---------------- CDLP + PR: auto vs static slab buckets ----------------
    import jax.numpy as jnp

    from graphtpu.algorithms.cdlp import build_incidence
    from graphtpu.algorithms.pr import _pr_slab_kernel
    from graphtpu.ops.active import cdlp_adaptive_device_run, prepare_cdlp_adaptive
    from graphtpu.ops.spmv import build_pull_plan

    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    out_deg = jnp.asarray(g.out_degree.astype(np.int32))
    labels_by_mode = {}
    for mode in ("auto", "static"):
        if mode == "static":
            os.environ["GRAPHTPU_SLAB_BUCKETS"] = "static"
        prep = prepare_cdlp_adaptive(g, centers, neigh, deg, cfg)
        labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, 10, cfg, prep)
        sync(labels)
        t0 = time.perf_counter()
        labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, 10, cfg, prep)
        sync(labels)
        dt = time.perf_counter() - t0
        labels_by_mode[mode] = np.asarray(labels)
        print(
            f"cdlp 10 iters [{mode} buckets]: {dt:.2f}s = "
            f"{centers.shape[0]*max(int(it),1)/dt/1e6:.0f}M edges/s",
            flush=True,
        )

        plan = build_pull_plan(g, wdtype=np.float32, with_values=False)
        pargs = (plan, out_deg, jnp.float32(0.85), g.n, 20)
        sync(_pr_slab_kernel(*pargs))
        t0 = time.perf_counter()
        sync(_pr_slab_kernel(*pargs))
        pr_s = time.perf_counter() - t0
        print(
            f"pr slab 20 iters [{mode} buckets]: {pr_s:.2f}s = "
            f"{g.nnz*20/pr_s/1e6:.0f}M nnz/s",
            flush=True,
        )
        os.environ.pop("GRAPHTPU_SLAB_BUCKETS", None)
    if not np.array_equal(labels_by_mode["auto"], labels_by_mode["static"]):
        print("cdlp MISMATCH: auto != static buckets", flush=True)


if __name__ == "__main__":
    main()
