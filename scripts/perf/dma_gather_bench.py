"""XLA gather engine vs Pallas scalar-prefetch DMA row fetch (VERDICT
r3 #4, second formulation). Run exclusively.

Compares, at several table sizes, the rate of out[i] = table[idx[i]]
for random [R, 128] row indices:
  - XLA:    table[idx] (the lowering behind ops/gather.table_gather and
            the LCC hash-row probe)
  - Pallas: ops/pallas_gather.dma_row_gather (one 512 B async copy per
            index, `slots` in flight), swept over block/slots.

The verdict lands in ROADMAP.md either way.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np
import graphtpu  # noqa: F401
import jax
import jax.numpy as jnp

from graphtpu.ops.pallas_gather import dma_row_gather


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


N = 1 << 20
rng = np.random.default_rng(0)
idx_host = rng.integers(0, 1 << 21, size=N)


@jax.jit
def xla_row_gather_sum(table, idx):
    return jnp.sum(table[idx][:, 0], dtype=jnp.int32)


from functools import partial


@partial(jax.jit, static_argnames=("block", "slots"))
def dma_sum(table, idx, block=512, slots=16):
    # scalar-prefetch operands live in SMEM (1 MB): chunk to 2^17 indices
    total = jnp.int32(0)
    for s0 in range(0, idx.shape[0], 1 << 17):
        part = dma_row_gather(
            table, idx[s0:s0 + (1 << 17)], block=block, slots=slots
        )
        total = total + jnp.sum(part[:, 0], dtype=jnp.int32)
    return total


for rows_log2 in (14, 19, 21):  # 8 MB, 256 MB, 1 GB
    rows = 1 << rows_log2
    table = jnp.zeros((rows, 128), jnp.int32)
    idx = jnp.asarray((idx_host & (rows - 1)).astype(np.int32))
    dt = timed(lambda: fence(xla_row_gather_sum(table, idx)))
    print(f"rows=2^{rows_log2} ({rows*512/2**20:6.0f} MB)  "
          f"XLA   : {dt/N*1e9:7.2f} ns/row", flush=True)
    try:
        dt = timed(lambda: fence(dma_sum(table, idx)), reps=2)
        print(f"rows=2^{rows_log2} ({rows*512/2**20:6.0f} MB)  "
              f"pallas: {dt/N*1e9:7.2f} ns/row", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"rows=2^{rows_log2} pallas FAILED: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    del table

print("== block/slots sweep at 1 GB ==", flush=True)
rows = 1 << 21
table = jnp.zeros((rows, 128), jnp.int32)
idx = jnp.asarray((idx_host & (rows - 1)).astype(np.int32))
for block in (256, 512, 1024):
    for slots in (8, 16, 32):
        try:
            dt = timed(
                lambda: fence(dma_sum(table, idx, block=block, slots=slots)),
                reps=2,
            )
            print(f"  block={block:5d} slots={slots:3d}: "
                  f"{dt/N*1e9:7.2f} ns/row", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  block={block:5d} slots={slots:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
