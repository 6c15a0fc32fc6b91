"""Adaptive WCC vs the dense pointer-jumping kernel: identical components
(min label per component) across capacity settings."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.wcc import _wcc_kernel, _wcc_adaptive_kernel
from graphtpu.core.graph import Graph
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph


def _dense(sym):
    coo = sym.device_pull()
    indptr = jnp.asarray(sym.pull_indptr.astype(np.int32))
    labels, _ = _wcc_kernel(coo.src, coo.dst, indptr, sym.n)
    return np.asarray(labels)


def _adaptive(sym, k_cap, e_cap):
    coo = sym.device_pull()
    indptr = jnp.asarray(sym.pull_indptr.astype(np.int32))
    deg_pad = jnp.asarray(
        np.concatenate([sym.in_degree, [0]]).astype(np.int32)
    )
    labels, _, _ = _wcc_adaptive_kernel(
        coo.src, coo.dst, indptr, deg_pad, sym.n, k_cap, e_cap
    )
    return np.asarray(labels)


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("caps", [(1 << 10, 1 << 14), (4, 16)])
def test_adaptive_matches_dense(directed, caps):
    g = rmat_graph(9, 6, directed=directed, seed=7)
    sym = g.symmetrized()
    np.testing.assert_array_equal(_adaptive(sym, *caps), _dense(sym))


def test_adaptive_many_components_and_chains():
    # two chains, a triangle, isolates — exercises the pure-propagation
    # active tail (no pointer jumps in active mode)
    src = np.array([0, 1, 2, 3, 5, 6, 8, 9, 10], dtype=np.int64)
    dst = np.array([1, 2, 3, 4, 6, 7, 9, 10, 8], dtype=np.int64)
    g = Graph(13, src, dst, None, np.arange(13, dtype=np.uint64),
              directed=True, weighted=False)
    sym = g.symmetrized()
    for caps in ((1 << 8, 1 << 10), (2, 4)):
        got = _adaptive(sym, *caps)
        np.testing.assert_array_equal(got, _dense(sym))
    # chain 0-4 collapses to 0; isolates keep their own label
    assert got[4] == 0 and got[7] == 5 and got[10] == 8
    assert got[11] == 11 and got[12] == 12


def test_adaptive_uniform():
    g = uniform_graph(400, 1200, directed=True, seed=4)  # sparse: many comps
    sym = g.symmetrized()
    np.testing.assert_array_equal(
        _adaptive(sym, 1 << 9, 1 << 13), _dense(sym)
    )


@pytest.mark.parametrize("directed", [True, False])
def test_slab_adaptive_matches_dense(directed):
    """The slab-plan full-step variant (round-4 structural lever) reaches
    the same fixed point as the dense kernel."""
    from graphtpu.algorithms.wcc import wcc_adaptive_run
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import uniform_graph

    g = uniform_graph(300, 900, directed=directed, seed=11)
    cfg = PlatformConfig(wcc_impl="slab", wcc_frontier_rows=1 << 8,
                         wcc_frontier_edges=1 << 12)
    labels, it = wcc_adaptive_run(g, cfg)
    expected = _dense(g.symmetrized())
    assert np.array_equal(np.asarray(labels), expected)
