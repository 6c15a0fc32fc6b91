"""Offline padded-probe analysis for LCC wedge buckets (host numpy only).

Loads the cached bench graph, derives the degree-oriented out-degree
distribution (same semantics as ops/triangles.prepare_wedge_plan), and
reports padded pair-list probe counts Σ_rows W(W-1)/2 for the current
bucket set vs candidates — the statically-computable part of ROADMAP's
"tighter wedge buckets" lever.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from graphtpu.ingest import cache as cache_mod

g = cache_mod.load("./intermediate", sys.argv[1] if len(sys.argv) > 1 else "bench-rmat-s20-ef32")
n = g.n
s, d = g.src, g.dst
keep = s != d
s, d = s[keep], d[keep]
id_bits = max(int(max(n - 1, 1)).bit_length(), 1)
lo = np.minimum(s, d).astype(np.int64)
hi = np.maximum(s, d).astype(np.int64)
key = (lo << id_bits) | hi
key.sort()
is_first = np.ones(key.shape[0], dtype=bool)
is_first[1:] = key[1:] != key[:-1]
uniq = key[is_first]
eu = (uniq >> id_bits).astype(np.int64)
ev = (uniq & ((1 << id_bits) - 1)).astype(np.int64)
deg_s = np.bincount(eu, minlength=n) + np.bincount(ev, minlength=n)
# rank relabel: id order == (degree, id) order; orientation lower->higher rank
order_v = np.lexsort((np.arange(n), deg_s))
rank = np.empty(n, dtype=np.int64)
rank[order_v] = np.arange(n, dtype=np.int64)
ru, rv = rank[eu], rank[ev]
ex = np.minimum(ru, rv)
d_plus = np.bincount(ex, minlength=n)
d_plus = d_plus[d_plus >= 2]
true_wedges = int((d_plus * (d_plus - 1) // 2).sum())
print(f"n={n} oriented_edges={uniq.shape[0]} max_d+={d_plus.max()}")
print(f"true wedges (pairs): {true_wedges/1e9:.3f}G")

CUR = (2, 4, 8, 16, 32, 64, 128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)
CANDIDATES = {
    "current": CUR,
    "dense-high": (2, 4, 8, 16, 32, 64, 96, 128, 192, 256, 320, 384, 448, 512,
                   640, 768, 896, 1024, 1280, 1536, 2048, 3072, 4096),
    "pow1.25": tuple(sorted(set(
        [2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96, 128,
         160, 192, 256, 320, 384, 512, 640, 768, 1024, 1280, 1536, 2048,
         2560, 3072, 4096]))),
    "every-64-above-256": tuple(list(CUR[:8]) + list(range(320, 1025, 64))
                                + [1280, 1536, 2048, 3072, 4096]),
}

hist = np.bincount(d_plus)
np.save("/tmp/dplus_hist.npy", hist)  # fast re-analysis without the 4-min load
for name, bks in CANDIDATES.items():
    padded = 0
    rows_tot = 0
    prev = 1
    for w in bks:
        hi_b = min(w, hist.shape[0] - 1)
        if prev >= hist.shape[0] - 1:
            break
        r = int(hist[prev + 1 : hi_b + 1].sum())
        prev = w
        padded += r * (w * (w - 1) // 2)
        rows_tot += r
    print(f"{name:22s} buckets={len(bks):3d} rows={rows_tot} "
          f"padded={padded/1e9:.3f}G  overhead={padded/true_wedges:.3f}x")
