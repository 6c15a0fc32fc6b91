"""Synthetic graph generator properties (determinism, shape, skew)."""

import numpy as np

from graphtpu.utils.synth import rmat_edges, rmat_graph, uniform_graph


def test_rmat_deterministic():
    g1 = rmat_graph(8, 8, seed=13)
    g2 = rmat_graph(8, 8, seed=13)
    np.testing.assert_array_equal(g1.src, g2.src)
    np.testing.assert_array_equal(g1.dst, g2.dst)
    g3 = rmat_graph(8, 8, seed=14)
    assert g3.nnz != g1.nnz or not np.array_equal(g3.src, g1.src)


def test_rmat_power_law_skew():
    g = rmat_graph(12, 16, seed=0)
    deg = g.out_degree
    # RMAT(0.57,...) hubs: max degree far above mean
    assert deg.max() > 10 * deg.mean()


def test_rmat_edges_in_range():
    n, src, dst = rmat_edges(10, 4, seed=1)
    assert n == 1024
    assert src.min() >= 0 and src.max() < n
    assert dst.min() >= 0 and dst.max() < n


def test_undirected_rmat_symmetric():
    g = rmat_graph(8, 4, directed=False, seed=2)
    pairs = set(zip(g.src.tolist(), g.dst.tolist()))
    for s, d in list(pairs)[:200]:
        assert (d, s) in pairs


def test_uniform_weighted():
    g = uniform_graph(100, 500, directed=True, weighted=True, seed=3)
    assert g.weighted and g.w.min() > 0
    assert not np.any(g.src == g.dst)  # self-loops dropped
