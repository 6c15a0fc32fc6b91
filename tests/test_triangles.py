"""Oriented-wedge LCC (graphtpu/ops/triangles.py) vs the membership-sweep
oracle, plus edge-hash unit coverage including forced spills."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.common import ALGORITHMS
from graphtpu.core.graph import Graph
from graphtpu.ops.edgehash import build_edge_hash, probe_edge_hash
from graphtpu.ops.triangles import lcc_oriented, prepare_wedge_plan
from graphtpu.utils.config import AlgorithmParams, PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph


def _sweep(g):
    from graphtpu.algorithms.lcc import _lcc_sweep

    return _lcc_sweep(g, PlatformConfig()).values


def test_edge_hash_roundtrip():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 40, size=5000, dtype=np.int64))
    payload = rng.integers(1, 3, size=keys.shape[0], dtype=np.int64)
    eh, spilled = build_edge_hash(keys, payload)
    assert not spilled.any()
    found, pay = probe_edge_hash(eh, jnp.asarray(keys))
    assert bool(jnp.all(found))
    np.testing.assert_array_equal(np.asarray(pay), payload)
    absent = jnp.asarray((keys[: 100] + 1)[~np.isin(keys[:100] + 1, keys)])
    f2, p2 = probe_edge_hash(eh, absent)
    assert not bool(jnp.any(f2))
    assert not bool(jnp.any(p2))


def test_edge_hash_spill_at_tiny_fill():
    """Force spills with an overfull table; spilled keys are absent, the
    rest still probe correctly."""
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 1 << 40, size=4000, dtype=np.int64))
    payload = np.ones(keys.shape[0], dtype=np.int64)
    eh, spilled = build_edge_hash(keys, payload, fill=8.0)  # 64 keys/row mean
    assert spilled.any()
    found, _ = probe_edge_hash(eh, jnp.asarray(keys))
    found = np.asarray(found)
    assert not found[spilled].any()
    assert found[~spilled].all()


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("seed", [0, 4])
def test_oriented_matches_sweep(directed, seed):
    g = rmat_graph(8, 10, directed=directed, seed=seed)
    np.testing.assert_array_equal(lcc_oriented(g), _sweep(g))


def test_oriented_uniform_and_structured():
    g = uniform_graph(300, 4000, directed=True, seed=9)
    np.testing.assert_array_equal(lcc_oriented(g), _sweep(g))
    # triangle + pendant + isolate
    src = np.array([0, 1, 2, 1, 2, 0, 3], dtype=np.int64)
    dst = np.array([1, 2, 0, 0, 1, 2, 0], dtype=np.int64)
    g2 = Graph(5, src, dst, None, np.arange(5, dtype=np.uint64),
               directed=True, weighted=False)
    got = lcc_oriented(g2)
    np.testing.assert_array_equal(got, _sweep(g2))
    # vertex 1's neighborhood {0, 2} is fully bidirectionally connected;
    # vertex 0's also contains the pendant 3 -> 2 edges / (3*2) pairs
    assert got[1] == pytest.approx(1.0)
    assert got[0] == pytest.approx(1.0 / 3.0)
    assert got[4] == 0.0


def test_pair_list_probe_matches_square(monkeypatch):
    """The upper-triangle pair-list probe (default) and the full-square
    probe produce identical numerators."""
    from graphtpu.ops.triangles import lcc_oriented_numerator

    g = rmat_graph(10, 8, directed=False, seed=7)
    plan = prepare_wedge_plan(g)
    monkeypatch.setenv("GRAPHTPU_LCC_PROBE", "square")
    a = lcc_oriented_numerator(plan)
    monkeypatch.setenv("GRAPHTPU_LCC_PROBE", "pairs")
    b = lcc_oriented_numerator(plan)
    np.testing.assert_array_equal(a, b)
    # sorted-row-gather variants (locality A/B knob) are bit-identical
    monkeypatch.setenv("GRAPHTPU_LCC_PROBE", "pairs-sorted")
    np.testing.assert_array_equal(lcc_oriented_numerator(plan), a)
    monkeypatch.setenv("GRAPHTPU_LCC_PROBE", "square-sorted")
    np.testing.assert_array_equal(lcc_oriented_numerator(plan), a)


def test_wedge_cache_roundtrip(tmp_path):
    """The oriented edge list persists under the ingest cache and repeat
    prep restores it (skip-if-exists); incompatible entries rebuild."""
    g = rmat_graph(10, 8, directed=False, seed=7)
    ref = lcc_oriented(g)

    g2 = rmat_graph(10, 8, directed=False, seed=7)
    g2.name = "cachetest"
    np.testing.assert_array_equal(lcc_oriented(g2, cache_dir=tmp_path), ref)
    assert (tmp_path / "cachetest" / "wedge-v2.npz").exists()

    g3 = rmat_graph(10, 8, directed=False, seed=7)
    g3.name = "cachetest"
    np.testing.assert_array_equal(lcc_oriented(g3, cache_dir=tmp_path), ref)

    # different graph under the same name — detected and rebuilt
    g4 = rmat_graph(9, 8, directed=False, seed=1)
    g4.name = "cachetest"
    ref4 = lcc_oriented(rmat_graph(9, 8, directed=False, seed=1))
    np.testing.assert_array_equal(lcc_oriented(g4, cache_dir=tmp_path), ref4)


def test_oriented_spill_patch_correctness():
    """Run the full oriented pipeline with a hash forced to spill heavily;
    the host patch must recover the exact sweep answer."""
    import graphtpu.ops.edgehash as ehmod

    g = rmat_graph(9, 12, directed=False, seed=2)
    ref = _sweep(g)
    orig = ehmod.build_edge_hash_device
    try:
        # overload the table hard enough that even 64-slot rows overflow
        ehmod.__dict__["build_edge_hash_device"] = lambda k, p, fill=0.25: orig(
            k, p, fill=64.0
        )
        plan = prepare_wedge_plan(g)
        assert plan.spilled.any(), "expected forced spills"
        got = lcc_oriented(g)
    finally:
        ehmod.__dict__["build_edge_hash_device"] = orig
    np.testing.assert_array_equal(got, ref)


def test_lcc_dispatch_auto_uses_oriented():
    g = rmat_graph(6, 6, directed=False, seed=1)
    res = ALGORITHMS["lcc"](g, AlgorithmParams(), PlatformConfig())
    np.testing.assert_array_equal(res.values, _sweep(g))


def test_optimal_bucket_bounds():
    """DP boundaries: cover max d+, strictly increasing, never cost more
    padded probes than the static ladder, exact for few distinct degrees."""
    from graphtpu.ops.triangles import _WEDGE_BUCKETS, _optimal_bucket_bounds

    rng = np.random.default_rng(0)
    # heavy-tailed degree sample capped at the static-ladder max
    d_plus = np.minimum(
        (rng.pareto(1.2, size=20000) * 4).astype(np.int64), _WEDGE_BUCKETS[-1]
    )
    bounds = _optimal_bucket_bounds(d_plus)
    assert bounds == sorted(set(bounds))
    assert bounds[-1] == int(d_plus.max())
    assert len(bounds) <= 16

    def padded(bks):
        tot, prev = 0, 1
        for w in bks:
            rows = int(((d_plus > prev) & (d_plus <= w)).sum())
            tot += rows * (w * (w - 1) // 2)
            prev = w
        return tot

    assert padded(bounds) <= padded(_WEDGE_BUCKETS)

    # few distinct degrees => exact buckets (zero padding)
    small = np.array([0, 1, 2, 2, 3, 7, 7, 9])
    assert _optimal_bucket_bounds(small) == [2, 3, 7, 9]
    assert _optimal_bucket_bounds(np.array([1, 1, 0])) == []


def test_oriented_static_bucket_knob(monkeypatch):
    """GRAPHTPU_LCC_BUCKETS=static restores the fixed ladder and the
    numerator is unchanged."""
    g = rmat_graph(8, 8, directed=False, seed=3)
    ref = lcc_oriented(g)
    g2 = rmat_graph(8, 8, directed=False, seed=3)
    monkeypatch.setenv("GRAPHTPU_LCC_BUCKETS", "static")
    np.testing.assert_array_equal(lcc_oriented(g2), ref)
