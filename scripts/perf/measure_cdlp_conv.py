"""Measure CDLP convergence on the bench graph: per-iteration wall time,
changed-vertex count, and changed-incidence-edge fraction (the upper bound
on work an active-set scheme must do)."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.algorithms.cdlp import build_incidence
from graphtpu.ops.minmode import _cdlp_one_step, build_slab_plan


def sync(x):
    return float(jnp.max(x))


g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
centers, neigh = build_incidence(g)
deg = np.bincount(centers, minlength=g.n).astype(np.int64)
inc_nnz = centers.shape[0]
print(f"n={g.n} nnz_stored={g.nnz} inc_nnz={inc_nnz}", flush=True)

plan = build_slab_plan(centers, neigh, deg, g.n)
labels = jnp.arange(g.n, dtype=jnp.int32)

# warm both step variants
sync(_cdlp_one_step(plan, labels, True)[0])
sync(_cdlp_one_step(plan, labels, False)[0])
print("compiled", flush=True)

labels = jnp.arange(g.n, dtype=jnp.int32)
prev_np = np.asarray(labels)
for i in range(12):
    t0 = time.perf_counter()
    labels, changed = _cdlp_one_step(plan, labels, i == 0)
    sync(labels)
    dt = time.perf_counter() - t0
    cur = np.asarray(labels)
    nchanged = int((cur != prev_np).sum())
    # active next iter = vertices with >=1 changed neighbor; incidence work
    # proportional to deg over active rows. changed mask on neighbors:
    changed_mask = np.zeros(g.n, dtype=bool)
    changed_mask[np.nonzero(cur != prev_np)[0]] = True
    active_edges = int(changed_mask[neigh].sum())  # edges whose neigh changed
    # rows having at least one changed neighbor:
    act_rows = np.zeros(g.n, dtype=bool)
    np.logical_or.at(act_rows, centers[changed_mask[neigh]], True)
    active_rows = int(act_rows.sum())
    active_row_edges = int(deg[act_rows].sum())
    prev_np = cur
    print(
        f"iter {i}: {dt*1000:7.1f} ms  changed_v={nchanged:8d} "
        f"({100*nchanged/g.n:5.2f}%)  active_rows={active_rows:8d} "
        f"({100*active_rows/g.n:5.2f}%)  active_row_edges={active_row_edges:9d} "
        f"({100*active_row_edges/inc_nnz:5.2f}%)",
        flush=True,
    )
    if not bool(changed):
        print("converged", flush=True)
        break
