"""Re-measure adaptive CDLP/BFS with stream-dedupe + raised caps
(e_cap 2^23): iteration 3 (8.5% active) should now run compacted.
Run exclusively."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.cdlp import build_incidence
from graphtpu.ops.active import cdlp_adaptive_device_run, prepare_cdlp_adaptive
from graphtpu.algorithms.bfs import bfs_adaptive_run
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
print(f"caps: cdlp K={cfg.cdlp_frontier_rows} E={cfg.cdlp_frontier_edges} "
      f"bfs K={cfg.bfs_frontier_rows} E={cfg.bfs_frontier_edges}", flush=True)

prep = prepare_cdlp_adaptive(g, centers, neigh, deg, cfg)
sync(prep.neigh_dev)
t0 = time.perf_counter()
labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
sync(labels)
print(f"cdlp warmup: {time.perf_counter()-t0:.1f} s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg, prep)
    sync(labels)
    dt = time.perf_counter() - t0
    print(
        f"cdlp rep{rep}: {dt:.3f} s  it={int(it)}  "
        f"{inc_nnz*int(it)/dt/1e6:.1f} M edges/s",
        flush=True,
    )

from graphtpu.ops.minmode import _cdlp_slab_kernel

labels_f, it_f = _cdlp_slab_kernel(
    prep.plan, jnp.arange(g.n, dtype=jnp.int32), itermax, True
)
sync(labels_f)
print(
    f"labels match full: {np.array_equal(np.asarray(labels), np.asarray(labels_f))}",
    flush=True,
)

levels, nit = bfs_adaptive_run(g, 0, cfg)
sync(levels)
print(f"bfs warmup done (it={nit})", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    levels, nit = bfs_adaptive_run(g, 0, cfg)
    sync(levels)
    dt = time.perf_counter() - t0
    print(
        f"bfs rep{rep}: {dt:.3f} s  it={nit}  {g.nnz/dt/1e9:.4f} GTEPS",
        flush=True,
    )

# cross-check vs dense kernel
from graphtpu.algorithms.bfs import _bfs_kernel

coo = g.device_pull()
indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
levels_d, it_d = _bfs_kernel(coo.src, coo.dst, indptr, jnp.int32(0), g.n)
sync(levels_d)
print(
    f"bfs levels match: {np.array_equal(np.asarray(levels), np.asarray(levels_d))}"
    f"  it {nit} vs {int(it_d)}",
    flush=True,
)
