"""LCC hash-fill A/B (round 5, VERDICT r4 #4 follow-through).

The warm numerator runs at ~92% of the hash-row roof; the roof rate
(14.5 ns/row fetch) is issue-rate bound on the 1.07 GB table at the
default fill 0.25. ROADMAP r2 left `GRAPHTPU_LCC_HASH_FILL=0.5` (536 MB
table) as an unmeasured knob: if random-row issue rate improves on a
smaller table, both the warm and cold LCC headline improve for free
(row-overflow P stays ~2e-7 per row — spill patching handles it).

Run exclusively on the chip:
    python scripts/perf/lcc_fill_ab.py

Prints prep-phase timings (GRAPHTPU_LCC_PREP_TRACE) plus the warm
numerator at fill 0.25 and fill 0.5 with identical credit sums.
"""
import os
import time

os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")
os.environ.setdefault("GRAPHTPU_LCC_PREP_TRACE", "1")

import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.ops import edgehash
from graphtpu.ops.triangles import lcc_oriented_numerator, prepare_wedge_plan

CACHE = "./intermediate"
NAME = "bench-rmat-s20-ef32"

t0 = time.perf_counter()
if cache_mod.exists(CACHE, NAME):
    g = cache_mod.load(CACHE, NAME)
else:
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(20, 32, directed=False, seed=42)
    cache_mod.save(g, CACHE, NAME)
print(f"graph {time.perf_counter()-t0:.1f}s  (n={g.n} nnz={g.nnz})", flush=True)

t0 = time.perf_counter()
plan = prepare_wedge_plan(g, cache_dir=CACHE)
print(f"prep(first) {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
plan = prepare_wedge_plan(g, cache_dir=CACHE)
print(f"prep(oriented-cache) {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
num = lcc_oriented_numerator(plan)
print(f"numerator(cold) {time.perf_counter()-t0:.1f}s sum={num.sum()}", flush=True)

t0 = time.perf_counter()
num25 = lcc_oriented_numerator(plan)
dt25 = time.perf_counter() - t0
print(f"numerator(warm, fill=0.25) {dt25:.1f}s sum={num25.sum()}", flush=True)

# rebuild the membership table at fill 0.5 from the plan's host copies
ex32 = jnp.asarray(plan.ex.astype(np.int32))
ey32 = jnp.asarray(plan.ey.astype(np.int32))
packed = (ex32.astype(jnp.int64) << plan.id_bits) | ey32.astype(jnp.int64)
mult_d = jnp.asarray(plan.mult.astype(np.int32))
t0 = time.perf_counter()
ehash5, spilled5 = edgehash.build_edge_hash_device(packed, mult_d, fill=0.5)
print(f"hash build fill=0.5 {time.perf_counter()-t0:.1f}s "
      f"rows={ehash5.rows} spilled={int(spilled5.sum())}", flush=True)
plan5 = plan._replace(ehash=ehash5, spilled=spilled5)

t0 = time.perf_counter()
num5 = lcc_oriented_numerator(plan5)
print(f"numerator(cold, fill=0.5) {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
num5 = lcc_oriented_numerator(plan5)
dt5 = time.perf_counter() - t0
print(f"numerator(warm, fill=0.5) {dt5:.1f}s sum={num5.sum()}", flush=True)
print(f"match={bool((num25 == num5).all())}  speedup={dt25/dt5:.3f}x", flush=True)
