"""Pallas-vs-XLA table_gather A/B on the real TPU (VERDICT r2 #4).

    PYTHONPATH=/root/repo python scripts/perf/measure_pallas_gather.py

Round-3 verdict (see graphtpu/ops/pallas_gather.py for the full chain):
Mosaic's tpu.dynamic_gather is a single-vreg lane-aligned shuffle, so a
VMEM-resident label table is not expressible — XLA's row-fetch gather
keeps the hot path. This script re-verifies the boundary on the current
toolchain: the supported 8-row vreg shuffle must pass, and the big-table
prototype must still raise (when it stops raising, a newer Mosaic has
grown multi-vreg dynamic_gather and the VMEM design is back on the
table — expected win: ~64x less HBM row traffic per index).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from graphtpu.ops.pallas_gather import pallas_table_gather, vreg_shuffle

    print(f"backend={jax.devices()[0].platform} jax={jax.__version__}", flush=True)
    rng = np.random.default_rng(7)

    # 1. the supported single-vreg shuffle must work
    tbl8 = jnp.asarray(rng.integers(0, 99, size=(8, 128)).astype(np.int32))
    ind = jnp.asarray(rng.integers(0, 8, size=(8, 128)).astype(np.int32))
    got = np.asarray(vreg_shuffle(tbl8, ind))
    want = np.asarray(tbl8)[np.asarray(ind), np.arange(128)[None, :]]
    print(
        "vreg_shuffle (8-row dynamic_gather): "
        + ("OK" if np.array_equal(got, want) else "MISMATCH"),
        flush=True,
    )

    # 2. the big-table prototype documents its own verdict
    tbl = jnp.zeros((1 << 20,), jnp.int32)
    idx = jnp.zeros((1 << 10,), jnp.int32)
    try:
        pallas_table_gather(tbl, idx)
        print(
            "pallas_table_gather RAN — a newer Mosaic supports multi-vreg "
            "dynamic_gather; re-open the VMEM-resident gather design!",
            flush=True,
        )
    except NotImplementedError as e:
        print(f"pallas_table_gather verdict: {e}", flush=True)


if __name__ == "__main__":
    main()
