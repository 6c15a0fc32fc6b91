"""Compare PR scan-path vs slab-path and BFS scan vs slab at bench scale."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.pr import _pr_kernel, _pr_slab_kernel
from graphtpu.algorithms.bfs import _bfs_kernel
from graphtpu.ops.spmv import build_pull_plan


def sync(x):
    return float(jnp.max(x))


g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
n, nnz = g.n, g.nnz
print(f"n={n} nnz={nnz}", flush=True)
out_deg = jnp.asarray(g.out_degree.astype(np.int32))
pr_iters = 20

# scan path
coo = g.device_pull(wdtype=np.float32)
pr_indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
args = (coo.src, coo.dst, pr_indptr, out_deg, jnp.float32(0.85), n, pr_iters)
sync(_pr_kernel(*args))
t0 = time.perf_counter()
r_scan = _pr_kernel(*args)
sync(r_scan)
dt = time.perf_counter() - t0
print(f"pr scan : {dt:.3f} s  {nnz*pr_iters/dt/1e9:.3f} Gnnz/s", flush=True)

# slab path
t0 = time.perf_counter()
plan = build_pull_plan(g, wdtype=np.float32, with_values=False)
print(f"  build_pull_plan: {time.perf_counter()-t0:.1f} s", flush=True)
sargs = (plan, out_deg, jnp.float32(0.85), n, pr_iters)
sync(_pr_slab_kernel(*sargs))
t0 = time.perf_counter()
r_slab = _pr_slab_kernel(*sargs)
sync(r_slab)
dt = time.perf_counter() - t0
print(f"pr slab : {dt:.3f} s  {nnz*pr_iters/dt/1e9:.3f} Gnnz/s", flush=True)
print(f"max |diff| = {float(jnp.max(jnp.abs(r_scan - r_slab))):.3e}", flush=True)

# BFS scan vs slab impl
for impl in ("scan",):
    levels, nit = _bfs_kernel(coo.src, coo.dst, pr_indptr, jnp.int32(0), n, impl)
    sync(levels)
    t0 = time.perf_counter()
    levels, nit = _bfs_kernel(coo.src, coo.dst, pr_indptr, jnp.int32(0), n, impl)
    sync(levels)
    dt = time.perf_counter() - t0
    print(
        f"bfs {impl}: {dt:.3f} s  iters={int(nit)}  {nnz/dt/1e9:.4f} GTEPS",
        flush=True,
    )
