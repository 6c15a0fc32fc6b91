"""Time the single-dispatch adaptive CDLP + BFS kernels at bench scale,
with prep (plan build + transfers) excluded from the measured reps.
Run exclusively."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.cdlp import build_incidence
from graphtpu.ops.active import cdlp_adaptive_device_run, prepare_cdlp_adaptive
from graphtpu.algorithms.bfs import bfs_adaptive_prep, bfs_adaptive_run
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
prep = prepare_cdlp_adaptive(g, centers, neigh, deg, cfg)
sync(prep.neigh_dev)
print(f"cdlp prep: {time.perf_counter()-t0:.1f} s", flush=True)

t0 = time.perf_counter()
labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
sync(labels)
print(f"cdlp adaptive-dev warmup: {time.perf_counter()-t0:.1f} s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
    sync(labels)
    dt = time.perf_counter() - t0
    print(
        f"cdlp adaptive-dev rep{rep}: {dt:.3f} s  it={int(it)}  "
        f"{inc_nnz*int(it)/dt/1e6:.1f} M edges/s",
        flush=True,
    )

# correctness vs full slab kernel (reuses prep.plan — no rebuild)
from graphtpu.ops.minmode import _cdlp_slab_kernel

labels_f, it_f = _cdlp_slab_kernel(
    prep.plan, jnp.arange(g.n, dtype=jnp.int32), itermax, True
)
sync(labels_f)
t0 = time.perf_counter()
labels_f, it_f = _cdlp_slab_kernel(
    prep.plan, jnp.arange(g.n, dtype=jnp.int32), itermax, True
)
sync(labels_f)
print(f"cdlp full slab rep: {time.perf_counter()-t0:.3f} s", flush=True)
print(
    f"labels match full: {np.array_equal(np.asarray(labels), np.asarray(labels_f))}"
    f"  it: {int(it)} vs {int(it_f)}",
    flush=True,
)

# BFS adaptive (prep cached on graph by first call)
t0 = time.perf_counter()
levels, nit = bfs_adaptive_run(g, 0, cfg)
sync(levels)
print(f"bfs adaptive-dev warmup: {time.perf_counter()-t0:.1f} s (it={nit})", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    levels, nit = bfs_adaptive_run(g, 0, cfg)
    sync(levels)
    dt = time.perf_counter() - t0
    print(
        f"bfs adaptive-dev rep{rep}: {dt:.3f} s  it={nit}  "
        f"{g.nnz/dt/1e9:.4f} GTEPS",
        flush=True,
    )
