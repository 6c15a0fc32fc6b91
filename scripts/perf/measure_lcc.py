"""Time oriented LCC at bench scale (run exclusively)."""
import os
import time

os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.ops.triangles import prepare_wedge_plan, lcc_oriented_numerator

t0 = time.perf_counter()
g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
print(f"load {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
plan = prepare_wedge_plan(g)
print(f"prepare_wedge_plan {time.perf_counter()-t0:.1f}s "
      f"(buckets={len(plan.buckets)}, spilled={int(plan.spilled.sum())})", flush=True)
for b in plan.buckets:
    w, rp = b.slab.shape
    print(f"  W={w:5d} R={b.r_real:8d} Rc={b.chunk_cols:6d} pairs={w*w*rp/1e9:.3f}G(sq)",
          flush=True)

t0 = time.perf_counter()
num = lcc_oriented_numerator(plan, progress=True)
dt = time.perf_counter() - t0
print(f"warmup numerator: {dt:.1f}s  total_credit={num.sum()}", flush=True)
t0 = time.perf_counter()
num = lcc_oriented_numerator(plan)
dt = time.perf_counter() - t0
print(f"numerator: {dt:.1f}s  ({g.nnz/dt/1e6:.1f} M A-edges/s)", flush=True)
