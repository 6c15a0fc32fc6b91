"""Time cdlp_adaptive_run vs the full slab kernel at bench scale."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.cdlp import build_incidence
from graphtpu.ops.minmode import _cdlp_slab_kernel, build_slab_plan
from graphtpu.ops.active import cdlp_adaptive_run
from graphtpu.utils.config import PlatformConfig


def sync(x):
    return float(jnp.max(x))


g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
centers, neigh = build_incidence(g)
deg = np.bincount(centers, minlength=g.n).astype(np.int64)
inc_nnz = centers.shape[0]
itermax = 10
cfg = PlatformConfig()

# --- full slab kernel (current bench path) ---
plan = build_slab_plan(centers, neigh, deg, g.n)
labels0 = jnp.arange(g.n, dtype=jnp.int32)
labels, it = _cdlp_slab_kernel(plan, labels0, itermax, True)
sync(labels)
t0 = time.perf_counter()
labels_full, it_full = _cdlp_slab_kernel(plan, labels0, itermax, True)
sync(labels_full)
dt_full = time.perf_counter() - t0
print(
    f"full slab : {dt_full:.3f} s  it={int(it_full)}  "
    f"{inc_nnz*int(it_full)/dt_full/1e6:.1f} M edges/s",
    flush=True,
)

# --- adaptive (warmup covers all shapes, then measure) ---
t0 = time.perf_counter()
labels_a, it_a = cdlp_adaptive_run(g, centers, neigh, deg, itermax, cfg)
sync(labels_a)
print(f"adaptive warmup: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
labels_a, it_a = cdlp_adaptive_run(g, centers, neigh, deg, itermax, cfg)
sync(labels_a)
dt_a = time.perf_counter() - t0
print(
    f"adaptive  : {dt_a:.3f} s  it={int(it_a)}  "
    f"{inc_nnz*int(it_a)/dt_a/1e6:.1f} M edges/s",
    flush=True,
)
same = np.array_equal(np.asarray(labels_full), np.asarray(labels_a))
print(f"labels match full kernel: {same}  it match: {int(it_full)==int(it_a)}", flush=True)
