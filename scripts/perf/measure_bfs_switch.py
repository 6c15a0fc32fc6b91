"""A/B: lax.switch step body vs nested-phase while_loops for the
adaptive BFS (round-5 step-floor lever, VERDICT r4 #3).

The nested-phase machinery re-evaluates every phase's while_loop cond
(~253 us each, step_floor_bench.py) at each phase transition; a
lax.switch body pays one loop cond + one conditional per level. HLO
conditionals execute only the taken branch on TPU — this script is the
measurement that claim rests on.

    PYTHONPATH=/root/repo python scripts/perf/measure_bfs_switch.py [scale] [ef]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from graphtpu.algorithms.bfs import bfs_adaptive_run
    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import rmat_graph

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"backend={jax.devices()[0].platform} scale={scale} ef={ef}", flush=True)

    gname = f"bench-rmat-s{scale}-ef{ef}"
    g = cache_mod.load("./intermediate", gname) if cache_mod.exists("./intermediate", gname) else None
    if g is None:
        g = rmat_graph(scale, ef, directed=False, seed=42)
        cache_mod.save(g, "./intermediate", gname)
    print(f"graph n={g.n} nnz={g.nnz}", flush=True)

    sources = [0, 1, 12345, 99999]
    for mode in ("switch", "phases"):
        cfg = PlatformConfig(bfs_step_mode=mode)
        # warm the compile + caches
        levels, it = bfs_adaptive_run(g, sources[0], cfg)
        _ = int(jnp.max(jnp.where(levels == np.iinfo(np.int32).max, 0, levels)))
        per_src = []
        ref = {}
        for src in sources:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                levels, it = bfs_adaptive_run(g, src, cfg)
                _ = int(jnp.max(jnp.where(levels == np.iinfo(np.int32).max, 0, levels)))
                best = min(best, time.perf_counter() - t0)
            per_src.append(best)
            ref[src] = (np.asarray(levels), it)
            print(f"  {mode:8s} src={src:7d}: {best*1e3:8.2f} ms  iters={it}", flush=True)
        tot = sum(per_src)
        print(f"{mode:8s}: total {tot*1e3:.1f} ms  "
              f"GTEPS(sum) {g.nnz*len(sources)/tot/1e9:.3f}", flush=True)
        if mode == "switch":
            ref_switch = ref
        else:
            for src in sources:
                np.testing.assert_array_equal(ref_switch[src][0], ref[src][0])
            print("levels identical across modes", flush=True)


if __name__ == "__main__":
    main()
