"""Convergence-adaptive CDLP (graphtpu/ops/active.py) vs the sort-path
oracle: identical labels and iteration counts for every threshold,
including thresholds that force active-set steps from iteration 1."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.cdlp import _cdlp_sort_kernel, build_incidence
from graphtpu.ops.active import cdlp_adaptive_run
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph
from graphtpu.core.graph import Graph


def _oracle(g, itermax):
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    labels, it = _cdlp_sort_kernel(
        jnp.asarray(centers), jnp.asarray(neigh), jnp.asarray(deg), g.n, itermax
    )
    return np.asarray(labels), int(it)


def _adaptive(g, itermax, threshold):
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    cfg = PlatformConfig(cdlp_active_threshold=threshold)
    labels, it = cdlp_adaptive_run(g, centers, neigh, deg, itermax, cfg)
    return np.asarray(labels), int(it)


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("threshold", [1.0, 0.3, 1e-9])
def test_adaptive_matches_oracle(directed, threshold):
    g = rmat_graph(9, 8, directed=directed, seed=3)
    for itermax in (1, 3, 10):
        ref_labels, ref_it = _oracle(g, itermax)
        got_labels, got_it = _adaptive(g, itermax, threshold)
        np.testing.assert_array_equal(got_labels, ref_labels)
        assert got_it == ref_it


@pytest.mark.parametrize("threshold", [1.0, 0.5])
def test_adaptive_oscillators_and_isolates(threshold):
    """Isolated edges swap labels forever (never reach the fixed point);
    zero-degree vertices keep their own label; a triangle converges."""
    # vertices: 0-1 isolated edge, 2 isolated vertex, 3-4-5 triangle
    src = np.array([0, 1, 3, 4, 5, 4, 5, 3], dtype=np.int64)
    dst = np.array([1, 0, 4, 5, 3, 3, 4, 5], dtype=np.int64)
    ids = np.arange(6, dtype=np.uint64)
    g = Graph(6, src, dst, None, ids, directed=False, weighted=False)
    for itermax in (1, 2, 5, 9):
        ref_labels, ref_it = _oracle(g, itermax)
        got_labels, got_it = _adaptive(g, itermax, threshold)
        np.testing.assert_array_equal(got_labels, ref_labels)
        assert got_it == ref_it
    # the isolated edge oscillates with period 2
    odd, _ = _adaptive(g, 3, threshold)
    even, _ = _adaptive(g, 4, threshold)
    assert odd[0] != even[0]
    # isolated vertex keeps its identity label
    assert even[2] == 2


def test_adaptive_uniform_directed():
    g = uniform_graph(400, 3000, directed=True, seed=11)
    ref_labels, ref_it = _oracle(g, 8)
    got_labels, got_it = _adaptive(g, 8, 0.6)
    np.testing.assert_array_equal(got_labels, ref_labels)
    assert got_it == ref_it


# ---------------- single-dispatch device kernel ----------------


def _adaptive_device(g, itermax, rows_cap, edges_cap):
    from graphtpu.ops.active import cdlp_adaptive_device_run

    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    cfg = PlatformConfig(
        cdlp_frontier_rows=rows_cap, cdlp_frontier_edges=edges_cap
    )
    labels, it = cdlp_adaptive_device_run(g, centers, neigh, deg, itermax, cfg)
    return np.asarray(labels), int(it)


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize(
    "caps",
    [
        (1 << 10, 1 << 14),  # roomy: active path runs
        (8, 32),             # tiny: nearly everything falls back to full steps
    ],
)
def test_adaptive_device_matches_oracle(directed, caps):
    g = rmat_graph(9, 8, directed=directed, seed=3)
    for itermax in (1, 3, 10):
        ref_labels, ref_it = _oracle(g, itermax)
        got_labels, got_it = _adaptive_device(g, itermax, *caps)
        np.testing.assert_array_equal(got_labels, ref_labels)
        assert got_it == ref_it


def test_adaptive_device_oscillators():
    src = np.array([0, 1, 3, 4, 5, 4, 5, 3], dtype=np.int64)
    dst = np.array([1, 0, 4, 5, 3, 3, 4, 5], dtype=np.int64)
    g = Graph(6, src, dst, None, np.arange(6, dtype=np.uint64),
              directed=False, weighted=False)
    for itermax in (1, 2, 5, 9):
        ref_labels, ref_it = _oracle(g, itermax)
        got_labels, got_it = _adaptive_device(g, itermax, 1 << 8, 1 << 10)
        np.testing.assert_array_equal(got_labels, ref_labels)
        assert got_it == ref_it


def test_adaptive_device_uniform_directed():
    g = uniform_graph(300, 2500, directed=True, seed=13)
    ref_labels, ref_it = _oracle(g, 8)
    got_labels, got_it = _adaptive_device(g, 8, 1 << 9, 1 << 13)
    np.testing.assert_array_equal(got_labels, ref_labels)
    assert got_it == ref_it
