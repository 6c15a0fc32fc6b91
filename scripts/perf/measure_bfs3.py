"""Round-3 BFS A/B on the real TPU: row-cap fix + small push tier +
trunc-depth sweep.

    PYTHONPATH=/root/repo python scripts/perf/measure_bfs3.py [scale] [ef]

Each variant is one relay compile (minutes); keep the grid small.
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


def main():
    import jax

    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import rmat_graph
    from graphtpu.algorithms.bfs import bfs_adaptive_run

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"backend={jax.devices()[0].platform} scale={scale} ef={ef}", flush=True)

    gname = f"bench-rmat-s{scale}-ef{ef}"
    g = cache_mod.load("./intermediate", gname) if cache_mod.exists("./intermediate", gname) else None
    if g is None:
        g = rmat_graph(scale, ef, directed=False, seed=42)
        cache_mod.save(g, "./intermediate", gname)
    m = g.nnz
    print(f"graph ready n={g.n} nnz={m}", flush=True)

    import os as _os

    tset = _os.environ.get("GRAPHTPU_BFS_TRUNCS", "0")
    variants = [
        (f"t={t or 'default'}", PlatformConfig(bfs_trunc=int(t)))
        for t in tset.split(",")
    ]
    ref = None
    for name, cfg in variants:
        for src in (0, 1, 12345):
            levels, it = bfs_adaptive_run(g, src, cfg)  # compile+warm
            sync(levels)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                levels, it = bfs_adaptive_run(g, src, cfg)
                sync(levels)
                best = min(best, time.perf_counter() - t0)
            lv = np.asarray(levels)
            key = (name.split()[0], src)
            if src == 0 and name == variants[0][0]:
                ref = lv
            ok = "" if ref is None or src != 0 else (
                " OK" if np.array_equal(lv, ref) else " MISMATCH-vs-default"
            )
            print(
                f"bfs [{name}] src={src}: {best:.3f}s = {m/best/1e9:.3f} GTEPS "
                f"({it} levels){ok}",
                flush=True,
            )
        # drop the t-dependent prep so the next variant rebuilds its table
        if hasattr(g, "_bfs_adaptive_prep"):
            delattr(g, "_bfs_adaptive_prep")


if __name__ == "__main__":
    main()
