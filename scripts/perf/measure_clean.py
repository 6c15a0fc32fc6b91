"""Clean serialized measurement: adaptive CDLP + hybrid BFS at bench scale.
MUST run with nothing else on the box (single CPU core)."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.cdlp import build_incidence
from graphtpu.ops.active import cdlp_adaptive_run
from graphtpu.algorithms.bfs import bfs_hybrid_run, _bfs_kernel
from graphtpu.utils.config import PlatformConfig


def sync(x):
    return float(jnp.max(x))


t0 = time.perf_counter()
g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
print(f"load {time.perf_counter()-t0:.1f}s", flush=True)
centers, neigh = build_incidence(g)
deg = np.bincount(centers, minlength=g.n).astype(np.int64)
inc_nnz = centers.shape[0]
itermax = 10
cfg = PlatformConfig()

t0 = time.perf_counter()
labels_a, it_a = cdlp_adaptive_run(g, centers, neigh, deg, itermax, cfg)
sync(labels_a)
print(f"adaptive warmup: {time.perf_counter()-t0:.1f} s", flush=True)
for rep in range(2):
    t0 = time.perf_counter()
    labels_a, it_a = cdlp_adaptive_run(g, centers, neigh, deg, itermax, cfg)
    sync(labels_a)
    dt = time.perf_counter() - t0
    print(
        f"adaptive rep{rep}: {dt:.3f} s  it={int(it_a)}  "
        f"{inc_nnz*int(it_a)/dt/1e6:.1f} M edges/s",
        flush=True,
    )

# hybrid BFS
t0 = time.perf_counter()
levels_h, it_h = bfs_hybrid_run(g, 0, cfg)
print(f"bfs hybrid warmup: {time.perf_counter()-t0:.1f} s (it={it_h})", flush=True)
for rep in range(2):
    t0 = time.perf_counter()
    levels_h, it_h = bfs_hybrid_run(g, 0, cfg)
    dt = time.perf_counter() - t0
    print(
        f"bfs hybrid rep{rep}: {dt:.3f} s  it={it_h}  {g.nnz/dt/1e9:.4f} GTEPS",
        flush=True,
    )

# cross-check vs device kernel
coo = g.device_pull()
indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
levels_d, it_d = _bfs_kernel(coo.src, coo.dst, indptr, jnp.int32(0), g.n)
sync(levels_d)
t0 = time.perf_counter()
levels_d, it_d = _bfs_kernel(coo.src, coo.dst, indptr, jnp.int32(0), g.n)
sync(levels_d)
dt = time.perf_counter() - t0
print(f"bfs device: {dt:.3f} s  it={int(it_d)}  {g.nnz/dt/1e9:.4f} GTEPS", flush=True)
print(
    f"bfs levels match: {np.array_equal(levels_h, np.asarray(levels_d))}  "
    f"it match: {it_h == int(it_d)}",
    flush=True,
)
