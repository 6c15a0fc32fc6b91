"""SSSP at bench scale: adaptive vs dense Bellman-Ford on a weighted
directed RMAT. Run exclusively."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.sssp import _sssp_kernel, sssp_adaptive_run, sssp_adaptive_prep
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph


def sync(x):
    return float(jnp.max(jnp.where(jnp.isinf(x), -1.0, x)))


gname = "bench-rmat-s20-ef16-w"
t0 = time.perf_counter()
g = None
if cache_mod.exists("./intermediate", gname):
    try:
        g = cache_mod.load("./intermediate", gname)
    except ValueError:
        g = None
if g is None:
    # same graph as bench.py's sssp section (cache name is shared)
    g = rmat_graph(20, 16, directed=False, weighted=True, seed=42)
    cache_mod.save(g, "./intermediate", gname)
print(f"graph ready {time.perf_counter()-t0:.1f}s: {g}", flush=True)
cfg = PlatformConfig()
src = 0

# dense kernel
coo = g.device_pull(wdtype=np.float32)
indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
dist_d, it_d = _sssp_kernel(coo.src, coo.dst, indptr, coo.w, jnp.int32(src), g.n)
sync(dist_d)
t0 = time.perf_counter()
dist_d, it_d = _sssp_kernel(coo.src, coo.dst, indptr, coo.w, jnp.int32(src), g.n)
sync(dist_d)
dt_d = time.perf_counter() - t0
print(f"sssp dense  : {dt_d:.3f} s  rounds={int(it_d)}  "
      f"{g.nnz*int(it_d)/dt_d/1e6:.1f} M relax/s", flush=True)

# adaptive (prep cached on graph after first call)
sssp_adaptive_prep(g)
t0 = time.perf_counter()
dist_a, it_a = sssp_adaptive_run(g, src, cfg)
print(f"sssp adaptive warmup {time.perf_counter()-t0:.1f}s (rounds={it_a})", flush=True)
for rep in range(2):
    t0 = time.perf_counter()
    dist_a, it_a = sssp_adaptive_run(g, src, cfg)
    dt = time.perf_counter() - t0
    print(f"sssp adaptive rep{rep}: {dt:.3f} s  rounds={it_a}", flush=True)

finite = np.isfinite(np.asarray(dist_d))
same = np.allclose(np.asarray(dist_a)[finite], np.asarray(dist_d)[finite], rtol=1e-5)
same_inf = bool((np.isinf(np.asarray(dist_a)) == ~finite).all())
print(f"dist match: {same}  inf match: {same_inf}", flush=True)

# delta-stepping A/B (VERDICT r2 #6): reference Delta=2.5 makes every
# synth weight (0.01..1.01) light; 0.5/0.25 exercise real bucketing
from graphtpu.algorithms.sssp import sssp_delta_run

for delta in (2.5, 0.5, 0.25):
    dcfg = PlatformConfig(sssp_delta=delta)
    t0 = time.perf_counter()
    dist_x, it_x = sssp_delta_run(g, src, dcfg)
    print(f"sssp delta={delta} warmup {time.perf_counter()-t0:.1f}s (rounds={it_x})", flush=True)
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        dist_x, it_x = sssp_delta_run(g, src, dcfg)
        best = min(best, time.perf_counter() - t0)
    ok = np.allclose(np.asarray(dist_x)[finite], np.asarray(dist_d)[finite], rtol=1e-5)
    print(f"sssp delta={delta}: {best:.3f} s  rounds={it_x}  match={ok}", flush=True)
    if hasattr(g, "_sssp_delta_prep"):
        delattr(g, "_sssp_delta_prep")

# ---- high-diameter weighted arm (VERDICT r3 #1/#9): 512x512 torus ----
# diameter ~512 hops; Bellman-Ford's round count tracks the hop depth of
# the shortest-path tree, the regime delta-stepping exists for.
from graphtpu.utils.synth import grid_graph

side = int(os.environ.get("GRAPHTPU_SSSP_GRID_SIDE", "512"))
gg = grid_graph(side, weighted=True, seed=7)
print(f"\nhigh-diameter arm: {side}x{side} torus {gg}", flush=True)

coo = gg.device_pull(wdtype=np.float32)
indptr = jnp.asarray(gg.pull_indptr.astype(np.int32))
dist_gd, it_gd = _sssp_kernel(coo.src, coo.dst, indptr, coo.w, jnp.int32(src), gg.n)
sync(dist_gd)
t0 = time.perf_counter()
dist_gd, it_gd = _sssp_kernel(coo.src, coo.dst, indptr, coo.w, jnp.int32(src), gg.n)
sync(dist_gd)
dt = time.perf_counter() - t0
print(f"grid dense   : {dt:.3f} s  rounds={int(it_gd)}", flush=True)
finite_g = np.isfinite(np.asarray(dist_gd))

t0 = time.perf_counter()
dist_ga, it_ga = sssp_adaptive_run(gg, src, cfg)
print(f"grid adaptive warmup {time.perf_counter()-t0:.1f}s (rounds={it_ga})", flush=True)
best = float("inf")
for rep in range(2):
    t0 = time.perf_counter()
    dist_ga, it_ga = sssp_adaptive_run(gg, src, cfg)
    best = min(best, time.perf_counter() - t0)
ok = np.allclose(np.asarray(dist_ga)[finite_g], np.asarray(dist_gd)[finite_g], rtol=1e-5)
print(f"grid adaptive: {best:.3f} s  rounds={it_ga}  match={ok}", flush=True)

for delta in (2.5, 0.5, 0.25, 0.1):
    dcfg = PlatformConfig(sssp_delta=delta)
    t0 = time.perf_counter()
    dist_gx, it_gx = sssp_delta_run(gg, src, dcfg)
    print(f"grid delta={delta} warmup {time.perf_counter()-t0:.1f}s (rounds={it_gx})", flush=True)
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        dist_gx, it_gx = sssp_delta_run(gg, src, dcfg)
        best = min(best, time.perf_counter() - t0)
    ok = np.allclose(np.asarray(dist_gx)[finite_g], np.asarray(dist_gd)[finite_g], rtol=1e-5)
    print(f"grid delta={delta}: {best:.3f} s  rounds={it_gx}  match={ok}", flush=True)
    if hasattr(gg, "_sssp_delta_prep"):
        delattr(gg, "_sssp_delta_prep")
