"""Offline padded-probe analysis for LCC wedge buckets (host numpy only).

Reads the oriented-edge cache (`intermediate/<graph>/wedge-v2.npz`)
written by the REAL prep pipeline (graphtpu/ops/triangles.py
prepare_wedge_plan with cache_dir), so the analyzed d+ distribution can
never diverge from the kernel's orientation semantics. Reports padded
pair-list probe counts for the static ladder vs the per-graph DP bounds
at several bucket budgets — the measurements behind the DP-bucket
default (6.28G -> 4.75G padded probes at RMAT s20/ef32, k=16).

Usage: python scripts/perf/bucket_tightening.py [graph-name]
(run LCC once with an intermediate dir first to create the cache).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from graphtpu.ops.slab import optimal_bucket_bounds  # noqa: E402
from graphtpu.ops.triangles import _WEDGE_BUCKETS  # noqa: E402


def padded_pairs(d_plus: np.ndarray, bounds) -> int:
    tot, prev = 0, 1
    for w in bounds:
        rows = int(((d_plus > prev) & (d_plus <= w)).sum())
        tot += rows * (w * (w - 1) // 2)
        prev = w
    return tot


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "bench-rmat-s20-ef32"
    f = Path("./intermediate") / name / "wedge-v2.npz"
    if not f.exists():
        sys.exit(
            f"{f} missing — run LCC once with an intermediate dir "
            "(prepare_wedge_plan cache_dir) to create it"
        )
    with np.load(f) as z:
        ex = z["ex"].astype(np.int64)
        n = int(z["n"])
    d_plus = np.bincount(ex, minlength=n)
    dp2 = d_plus[d_plus >= 2]
    true_w = int((dp2 * (dp2 - 1) // 2).sum())
    print(f"{name}: n={n} oriented_edges={ex.shape[0]} max_d+={dp2.max()}")
    print(f"true wedges (pairs): {true_w/1e9:.3f}G")

    st = padded_pairs(d_plus, _WEDGE_BUCKETS)
    print(f"static ladder ({len(_WEDGE_BUCKETS)} buckets): "
          f"{st/1e9:.3f}G  overhead={st/true_w:.3f}x")
    for k in (10, 16, 20, 24):
        b = optimal_bucket_bounds(d_plus, k=k, kind="pairs", lo=1)
        p = padded_pairs(d_plus, b)
        print(f"DP k={k:2d} ({len(b):2d} buckets): {p/1e9:.3f}G  "
              f"overhead={p/true_w:.3f}x  bounds={b}")


if __name__ == "__main__":
    main()
