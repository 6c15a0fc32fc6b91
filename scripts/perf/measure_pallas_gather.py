"""Pallas-vs-XLA table_gather A/B on the real TPU (VERDICT r2 #4).

    PYTHONPATH=/root/repo python scripts/perf/measure_pallas_gather.py

Correctness-checks the Pallas kernel against x[idx], then times both at
the slab-context shapes (random indices into a 2^20-entry table, the
bench graph's label-gather shape). Prints a winner line for ROADMAP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def sync(x):
    import jax.numpy as jnp

    return float(jnp.max(jnp.asarray(x).astype(jnp.float32)))


def best_of(fn, reps=5):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    import jax
    import jax.numpy as jnp

    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.pallas_gather import pallas_table_gather

    print(f"backend={jax.devices()[0].platform} jax={jax.__version__}", flush=True)
    rng = np.random.default_rng(7)
    n = 1 << 20

    tbl = jnp.asarray(rng.integers(0, 1 << 30, size=n).astype(np.int32))

    # correctness first, on a small shape
    idx_small = jnp.asarray(rng.integers(0, n, size=1 << 14).astype(np.int32))
    try:
        got = np.asarray(pallas_table_gather(tbl, idx_small))
    except Exception as e:  # noqa: BLE001 — the "Mosaic refuses" outcome is data too
        print(f"pallas gather FAILED TO COMPILE/RUN: {type(e).__name__}: {e}"[:500],
              flush=True)
        return
    want = np.asarray(tbl)[np.asarray(idx_small)]
    ok = np.array_equal(got, want)
    print(f"correctness: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        return

    nop = jax.jit(lambda v: v + 1)
    x8 = jnp.arange(8, dtype=jnp.int32)
    sync(nop(x8))
    t_nop = best_of(lambda: sync(nop(x8)))

    xla_j = jax.jit(lambda t, i: jnp.max(table_gather(t, i)))
    pal_j = jax.jit(lambda t, i: jnp.max(pallas_table_gather(t, i)))

    for sz in (1 << 22, 1 << 24, 60 * (1 << 20)):
        idx = jnp.asarray(rng.integers(0, n, size=sz).astype(np.int32))
        sync(xla_j(tbl, idx))
        t_x = best_of(lambda: sync(xla_j(tbl, idx))) - t_nop
        sync(pal_j(tbl, idx))
        t_p = best_of(lambda: sync(pal_j(tbl, idx))) - t_nop
        print(
            f"gather {sz/1e6:.0f}M idx: xla {t_x*1e3:.1f} ms ({t_x/sz*1e9:.2f} ns/idx)"
            f"  pallas {t_p*1e3:.1f} ms ({t_p/sz*1e9:.2f} ns/idx)"
            f"  -> {'PALLAS' if t_p < t_x else 'XLA'} wins {max(t_x,t_p)/min(t_x,t_p):.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
