"""Hybrid (changed-set) SSSP vs the pure-device Bellman-Ford kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.sssp import _sssp_kernel, sssp_hybrid_run
from graphtpu.core.graph import Graph
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph


def _device_dist(g, src, dtype=np.float32):
    coo = g.device_pull(wdtype=dtype)
    indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
    dist, it = _sssp_kernel(
        coo.src, coo.dst, indptr, coo.w, jnp.int32(src), g.n
    )
    return np.asarray(dist)


def _weighted(g, seed):
    # weights keyed on the unordered pair: undirected graphs store both
    # directions of an edge with the SAME weight (Graph.from_original_ids)
    lo = np.minimum(g.src, g.dst).astype(np.int64)
    hi = np.maximum(g.src, g.dst).astype(np.int64)
    w = 0.1 + ((lo * 1000003 + hi * 31 + seed) % 997) / 200.0
    return Graph(
        g.n, g.src, g.dst, w.astype(np.float64), g.mapping, g.directed, True,
        _presorted=True, _dedup=False,
    )


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("threshold", [1.0, 0.2, 1e-9])
def test_hybrid_matches_device(directed, threshold):
    g = _weighted(rmat_graph(8, 8, directed=directed, seed=6), 1)
    cfg = PlatformConfig(sssp_active_threshold=threshold)
    ref = _device_dist(g, 0)
    got, _ = sssp_hybrid_run(g, 0, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_hybrid_unreachable_and_chain():
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([1.5, 2.0, 0.25])
    g = Graph(5, src, dst, w, np.arange(5, dtype=np.uint64),
              directed=True, weighted=True)
    for threshold in (1.0, 1e-9):
        dist, _ = sssp_hybrid_run(g, 0, PlatformConfig(sssp_active_threshold=threshold))
        np.testing.assert_allclose(dist[:4], [0.0, 1.5, 3.5, 3.75], rtol=1e-6)
        assert np.isinf(dist[4])


def test_hybrid_uniform():
    g = _weighted(uniform_graph(400, 3500, directed=True, seed=8), 3)
    ref = _device_dist(g, 7)
    got, _ = sssp_hybrid_run(g, 7, PlatformConfig(sssp_active_threshold=0.3))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


# ---------------- single-dispatch device kernel ----------------


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize(
    "caps",
    [
        (1 << 10, 1 << 14),  # roomy: active relaxation covers everything
        (4, 16),             # tiny: dense fallback dominates
    ],
)
def test_adaptive_matches_device_kernel(directed, caps):
    from graphtpu.algorithms.sssp import sssp_adaptive_run

    g = _weighted(rmat_graph(8, 8, directed=directed, seed=6), 1)
    cfg = PlatformConfig(sssp_frontier_rows=caps[0], sssp_frontier_edges=caps[1])
    ref = _device_dist(g, 0)
    got, _ = sssp_adaptive_run(g, 0, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_adaptive_chain_and_unreachable():
    from graphtpu.algorithms.sssp import sssp_adaptive_run

    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([1.5, 2.0, 0.25])
    g = Graph(5, src, dst, w, np.arange(5, dtype=np.uint64),
              directed=True, weighted=True)
    for caps in ((1 << 8, 1 << 10), (2, 2)):
        cfg = PlatformConfig(sssp_frontier_rows=caps[0], sssp_frontier_edges=caps[1])
        dist, _ = sssp_adaptive_run(g, 0, cfg)
        np.testing.assert_allclose(dist[:4], [0.0, 1.5, 3.5, 3.75], rtol=1e-6)
        assert np.isinf(dist[4])


# ---------------- single-dispatch delta-stepping kernel ----------------


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize(
    "delta,caps",
    [
        (2.5, (1 << 10, 1 << 14)),   # reference Delta (sssp.cpp:70-78), roomy
        (0.5, (1 << 10, 1 << 14)),   # many buckets, light/heavy both populated
        (2.5, (4, 16)),              # tiny caps: dense fallback dominates
        (0.3, (4, 16)),
    ],
)
def test_delta_matches_device_kernel(directed, delta, caps):
    from graphtpu.algorithms.sssp import sssp_delta_run

    g = _weighted(rmat_graph(8, 8, directed=directed, seed=6), 1)
    cfg = PlatformConfig(
        sssp_delta=delta, sssp_frontier_rows=caps[0], sssp_frontier_edges=caps[1]
    )
    ref = _device_dist(g, 0)
    got, _ = sssp_delta_run(g, 0, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_delta_high_diameter_chain():
    """A weighted path — the shape where Bellman-Ford's round count equals
    the diameter; delta-stepping must stay correct and its bucket advance
    must walk the whole distance range."""
    from graphtpu.algorithms.sssp import sssp_adaptive_run, sssp_delta_run

    n = 300
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    rng = np.random.default_rng(5)
    w = 0.05 + rng.random(n - 1)
    g = Graph(n, src, dst, w, np.arange(n, dtype=np.uint64),
              directed=True, weighted=True)
    expect = np.concatenate([[0.0], np.cumsum(w)]).astype(np.float32)
    for delta in (2.5, 0.4):
        cfg = PlatformConfig(sssp_delta=delta)
        dist, _ = sssp_delta_run(g, 0, cfg)
        np.testing.assert_allclose(dist, expect, rtol=1e-5)
    ref, _ = sssp_adaptive_run(g, 0, PlatformConfig())
    np.testing.assert_allclose(ref, expect, rtol=1e-5)


def test_delta_unreachable_and_registry():
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.utils.config import AlgorithmParams

    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([1.5, 2.0, 0.25])
    g = Graph(5, src, dst, w, np.arange(5, dtype=np.uint64),
              directed=True, weighted=True)
    cfg = PlatformConfig(sssp_impl="delta")
    params = AlgorithmParams(source_vertex=0)
    res = run_algorithm("sssp", g, params, cfg)
    np.testing.assert_allclose(res.values[:4], [0.0, 1.5, 3.5, 3.75], rtol=1e-6)
    assert np.isinf(res.values[4])


def test_auto_impl_routes_to_adaptive(monkeypatch):
    """sssp-impl=auto picks the adaptive kernel — the measured round-4
    A/B found no regime (power-law or high-diameter) where delta or
    dense beats it enough to justify a crossover heuristic (ROADMAP
    round-4 table)."""
    import numpy as np

    from graphtpu.algorithms import sssp as sssp_mod
    from graphtpu.algorithms.common import AlgorithmParams
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import uniform_graph

    g = uniform_graph(64, 256, directed=True, weighted=True, seed=3)
    called = {}
    real = sssp_mod.sssp_adaptive_run

    def spy(*a, **kw):
        called["adaptive"] = True
        return real(*a, **kw)

    monkeypatch.setattr(sssp_mod, "sssp_adaptive_run", spy)
    params = AlgorithmParams(source_vertex=0, weight_property="weight")
    cfg = PlatformConfig()
    assert getattr(cfg, "sssp_impl", "auto") in ("auto", "adaptive")
    res = sssp_mod.sssp(g, params, cfg)
    assert called.get("adaptive")
    assert np.isfinite(res.values[0])
