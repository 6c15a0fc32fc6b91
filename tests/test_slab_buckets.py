"""Per-graph DP-optimal slab bucket bounds (graphtpu/ops/slab.py)."""

import numpy as np

from graphtpu.ops.slab import DEFAULT_BUCKETS, optimal_bucket_bounds, resolve_buckets


def _padded_elements(deg, bks):
    tot, prev = 0, 0
    for w in bks:
        rows = int(((deg > prev) & (deg <= w)).sum())
        tot += rows * w
        prev = w
    return tot


def test_linear_dp_beats_static_ladder():
    rng = np.random.default_rng(1)
    deg = np.minimum((rng.pareto(1.1, size=50000) * 3).astype(np.int64), 4096)
    bounds = optimal_bucket_bounds(deg, k=10, kind="elements", lo=0, cap=4096)
    assert bounds == sorted(set(bounds))
    assert len(bounds) <= 10
    present = deg[(deg > 0) & (deg <= 4096)]
    assert bounds[-1] == int(present.max())
    assert _padded_elements(deg, bounds) <= _padded_elements(deg, DEFAULT_BUCKETS)


def test_exact_buckets_for_few_degrees():
    deg = np.array([0, 3, 3, 7, 7, 7, 12])
    assert optimal_bucket_bounds(deg, k=10, kind="elements") == [3, 7, 12]
    # heavy tail excluded by cap
    deg2 = np.array([1, 5, 9000])
    assert optimal_bucket_bounds(deg2, k=10, kind="elements", cap=4096) == [1, 5]


def test_resolve_buckets_semantics(monkeypatch):
    deg = np.array([0, 1, 2, 2, 5])
    # explicit bounds win verbatim
    assert resolve_buckets(deg, (8, 64)) == (8, 64)
    # auto = DP-optimal over present degrees
    assert resolve_buckets(deg, None) == (1, 2, 5)
    # static knob restores the ladder
    monkeypatch.setenv("GRAPHTPU_SLAB_BUCKETS", "static")
    assert resolve_buckets(deg, None) == DEFAULT_BUCKETS
    monkeypatch.delenv("GRAPHTPU_SLAB_BUCKETS")
    # all-zero degrees keep the ladder (heavy-tail cutoff must exist)
    assert resolve_buckets(np.zeros(4, np.int64), None) == DEFAULT_BUCKETS
    # bucket budget knob
    monkeypatch.setenv("GRAPHTPU_SLAB_BUCKET_K", "1")
    deg3 = np.array([1, 2, 3, 4, 5])
    assert resolve_buckets(deg3, None) == (5,)


def test_pairs_vs_elements_choose_differently():
    """A distribution where the two cost kinds pick DIFFERENT cuts:
    degrees {8×10 rows, 64×400 rows, 65×1 row}, k=2. Linear cost keeps
    the light rows exact ([8, 65]: 8·10+65·401 < 64·410+65); quadratic
    cost protects the wide rows instead ([64, 65]: 28·10+2080·401 >
    2016·410+2080)."""
    deg = np.concatenate([np.full(10, 8), np.full(400, 64), np.full(1, 65)])
    lin = optimal_bucket_bounds(deg, k=2, kind="elements")
    pr = optimal_bucket_bounds(deg, k=2, kind="pairs")
    assert lin == [8, 65]
    assert pr == [64, 65]


def test_dp_matches_bruteforce_small():
    """Exhaustive check: the DP finds the true minimum padded cost over
    all ≤ k boundary subsets for small distributions."""
    from itertools import combinations

    rng = np.random.default_rng(7)
    for trial in range(5):
        deg = rng.integers(1, 12, size=30).astype(np.int64)
        ends = sorted(set(int(d) for d in deg if d > 0))
        for k in (1, 2, 3):
            best = None
            for r in range(1, min(k, len(ends)) + 1):
                for combo in combinations(ends, r):
                    if combo[-1] != ends[-1]:
                        continue  # must cover the max degree
                    best_c = _padded_elements(deg, combo)
                    if best is None or best_c < best:
                        best = best_c
            got = optimal_bucket_bounds(deg, k=k, kind="elements")
            assert _padded_elements(deg, got) == best, (deg, k, got)
