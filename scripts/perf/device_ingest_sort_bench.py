"""Re-check for the on-device ingest sort NEGATIVE result (round 5).

Verdict being re-checked (core/graph.py _device_sort_edges): the chip
sorts the 62M packed edge keys quickly and H2D runs ~800 MB/s, but this
environment's device->host relay streams results at ~2.5 MB/s (measured
173 s for one 248 MB sorted array, 2026-08-21), so round-tripping the
sorted stream loses by minutes to the native host counting sort
(native/graphtpu_io.cpp gtio_sort_edges). On hardware with a
direct-attached host link the device path should win — re-run this
script there and flip GRAPHTPU_DEVICE_INGEST_SORT=1 if it does.

    PYTHONPATH=/root/repo python scripts/perf/device_ingest_sort_bench.py [m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401


def main():
    import jax

    from graphtpu.core import graph as G

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 62_000_000
    n = 1 << 20
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, m).astype(np.int32)
    dst = rng.integers(0, n, m).astype(np.int32)
    print(f"backend={jax.devices()[0].platform} m={m}", flush=True)

    # host arms
    t0 = time.perf_counter()
    perm = G._lexsort_edges(src, dst, "src")
    host_np = time.perf_counter() - t0
    print(f"numpy packed argsort: {host_np:.2f}s", flush=True)

    from graphtpu.ingest import native

    if native.sort_available():
        t0 = time.perf_counter()
        native.sort_edges(src, dst, None, n, False)
        host_nat = time.perf_counter() - t0
        print(f"native counting sort: {host_nat:.2f}s", flush=True)

    # device arm, split by phase (block-fenced by host reads)
    import jax.numpy as jnp

    t0 = time.perf_counter()
    sd, dd = jax.device_put(src), jax.device_put(dst)
    jax.block_until_ready((sd, dd))
    print(f"H2D: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    s_s, d_s, pos, keep = G._device_sort_kernel(sd, dd, True, True, False)
    # fence with a SCALAR read (the relay's block_until_ready returns
    # early; a reduction forces execution without the bulk D2H)
    _ = int(jnp.sum(s_s[:: max(m // 64, 1)], dtype=jnp.int64))
    sort_s = time.perf_counter() - t0
    print(f"device sort (scalar-fenced): {sort_s:.2f}s", flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(s_s)
    d2h1 = time.perf_counter() - t0
    print(f"D2H one sorted array ({4*m/1e6:.0f} MB): {d2h1:.2f}s "
          f"= {4*m/1e6/max(d2h1,1e-9):.1f} MB/s", flush=True)

    total_dev = sort_s + 3 * d2h1  # src+dst+keep roundtrip estimate
    print(f"device path ~= {total_dev:.1f}s vs native {host_nat:.1f}s -> "
          f"{'DEVICE WINS: set GRAPHTPU_DEVICE_INGEST_SORT=1' if total_dev < host_nat else 'negative result stands'}",
          flush=True)


if __name__ == "__main__":
    main()
