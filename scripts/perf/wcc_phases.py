"""WCC per-phase replay (VERDICT r3 #6) — clone of bfs_phases.py's
methodology: time each phase of the adaptive WCC in isolation on the
chip and compare against its executed-volume roof, so the gap between
wcc_sol_pct and 100% is attributed (gather? scan? pointer jumps? the
fits/derive bookkeeping? while_loop fusion boundaries?).

Run exclusively."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np
import graphtpu  # noqa: F401
import jax
import jax.numpy as jnp

from graphtpu.core.types import INT32_INF
from graphtpu.ingest import cache as cache_mod
from graphtpu.utils import roofline as rl


def fence(x):
    return float(jnp.max(x))


def timed(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


g = cache_mod.load("./intermediate", "bench-rmat-s20-ef32")
sym = g.symmetrized()
coo = sym.device_pull()
indptr = jnp.asarray(sym.pull_indptr.astype(np.int32))
deg_pad = jnp.asarray(np.concatenate([sym.in_degree, [0]]).astype(np.int32))
n, m = sym.n, sym.nnz
print(f"graph n={n} m={m}", flush=True)

from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather
from graphtpu.ops.spmv import pull_reduce

labels0 = jnp.arange(n, dtype=jnp.int32)


# ---- components of one full step (arrays passed as ARGS — closing
# over device arrays bakes them into the HLO as constants and the relay
# rejects the 240 MB request body with HTTP 413) ----
@jax.jit
def edge_gather_only(labels, src):
    return jnp.sum(
        table_gather(labels, src, chunk=EDGE_STREAM_CHUNK),
        dtype=jnp.int32,
    )


@jax.jit
def gather_plus_segmin(labels, src, dst, ip):
    return jnp.sum(
        pull_reduce(
            "min",
            table_gather(labels, src, chunk=EDGE_STREAM_CHUNK),
            dst, ip, n, INT32_INF, "scan",
        ),
        dtype=jnp.int32,
    )


@jax.jit
def jumps_only(labels):
    new = jnp.minimum(labels, table_gather(labels, labels))
    new = jnp.minimum(new, table_gather(new, new))
    return jnp.sum(new, dtype=jnp.int32)


@jax.jit
def full_step(labels, src, dst, ip, dp):
    neigh_min = pull_reduce(
        "min",
        table_gather(labels, src, chunk=EDGE_STREAM_CHUNK),
        dst, ip, n, INT32_INF, "scan",
    )
    new = jnp.minimum(labels, neigh_min)
    new = jnp.minimum(new, table_gather(new, new))
    new = jnp.minimum(new, table_gather(new, new))
    changed_mask = new != labels
    deg_n = dp[:-1]
    cnt = jnp.sum(changed_mask, dtype=jnp.int32)
    ce = jnp.sum(jnp.where(changed_mask, deg_n, 0), dtype=jnp.int32)
    return jnp.sum(new, dtype=jnp.int32) + cnt + ce


rows = [
    ("edge gather only",
     lambda: edge_gather_only(labels0, coo.src),
     rl.roof_seconds(gathers=m)),
    ("gather + seg-min scan",
     lambda: gather_plus_segmin(labels0, coo.src, coo.dst, indptr),
     rl.roof_seconds(gathers=m, scans=m)),
    ("2 pointer jumps (2n gathers)",
     lambda: jumps_only(labels0),
     rl.roof_seconds(gathers=2 * n)),
    ("FULL STEP (gather+scan+jumps+fits)",
     lambda: full_step(labels0, coo.src, coo.dst, indptr, deg_pad),
     rl.roof_seconds(gathers=m + 2 * n, scans=m)),
]
for name, fn, roof in rows:
    dt = timed(lambda fn=fn: fence(jnp.asarray(fn())))
    print(f"  {name:38s}: {dt*1000:8.2f} ms  roof {roof*1000:7.2f} ms  "
          f"sol {100*roof/dt:5.1f}%", flush=True)

# ---- the real kernel, for reference ----
from graphtpu.algorithms.wcc import wcc_adaptive_run
from graphtpu.utils.config import PlatformConfig

cfg = PlatformConfig()
labels, it = wcc_adaptive_run(g, cfg)
fence(labels)
t0 = time.perf_counter()
labels, it, stats = wcc_adaptive_run(g, cfg, with_stats=True)
fence(labels)
dt = time.perf_counter() - t0
roof = rl.wcc_executed_roof(stats["full_steps"], stats["active_steps"],
                            m, n, stats["e_cap"],
                            stats.get("plan_gathers"))
print(f"  adaptive kernel ({stats}): {dt:0.3f} s  roof {roof:0.3f} s  "
      f"sol {100*roof/dt:5.1f}%", flush=True)
