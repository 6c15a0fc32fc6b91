"""Per-bucket synced LCC evaluation to pinpoint which bucket (if any)
faults the TPU worker. Run exclusively."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax.numpy as jnp

from graphtpu.ingest import cache as cache_mod
from graphtpu.ops.triangles import prepare_wedge_plan, _wedge_bucket

t0 = time.perf_counter()
g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
print(f"load {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
plan = prepare_wedge_plan(g)
print(f"prep {time.perf_counter()-t0:.1f}s", flush=True)

for i, b in enumerate(plan.buckets):
    w, r_pad = b.slab.shape
    t0 = time.perf_counter()
    u_all, e_all = _wedge_bucket(b.slab, b.mslab, plan.ehash, plan.id_bits,
                                 b.chunk_cols)
    tot = float(jnp.sum(u_all))  # sync
    dt = time.perf_counter() - t0
    pairs = w * w * r_pad
    print(
        f"bucket {i}: W={w:5d} R_pad={r_pad:8d} Rc={b.chunk_cols:6d} "
        f"pairs={pairs/1e9:.3f}G  {dt:7.2f}s ({dt/max(pairs,1)*1e9:.2f} ns/pair) "
        f"u_credit={tot:.0f}",
        flush=True,
    )
print("ALL BUCKETS OK", flush=True)
