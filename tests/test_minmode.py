"""Slab min-mode kernel vs the sort-path oracle on synthetic graphs."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.cdlp import _cdlp_sort_kernel, build_incidence
from graphtpu.ops.minmode import build_slab_plan, cdlp_slab_run, _slab_minmode
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_slab_matches_sort_path(directed, seed):
    g = rmat_graph(10, 12, directed=directed, seed=seed)
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)

    sort_labels, sort_it = _cdlp_sort_kernel(
        jnp.asarray(centers), jnp.asarray(neigh), jnp.asarray(deg), g.n, 10
    )
    slab_labels, slab_it = cdlp_slab_run(
        g, centers, neigh, deg, 10, PlatformConfig()
    )
    np.testing.assert_array_equal(np.asarray(slab_labels), np.asarray(sort_labels))
    assert int(slab_it) == int(sort_it)


def test_slab_heavy_tail_path():
    """Tiny buckets force most rows through the heavy global-sort path."""
    g = uniform_graph(300, 9000, directed=True, seed=7)
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    cfg = PlatformConfig(slab_buckets=(4, 8))  # nearly everything is "heavy"

    sort_labels, _ = _cdlp_sort_kernel(
        jnp.asarray(centers), jnp.asarray(neigh), jnp.asarray(deg), g.n, 6
    )
    slab_labels, _ = cdlp_slab_run(g, centers, neigh, deg, 6, cfg)
    np.testing.assert_array_equal(np.asarray(slab_labels), np.asarray(sort_labels))


def test_slab_minmode_tie_break():
    """Smallest label among most frequent (LAGraph_cdlp.c:40-45)."""
    labels = jnp.asarray(np.arange(10, dtype=np.int32))
    # row 0: neighbors {3, 3, 5, 5, 1} -> counts {3:2, 5:2, 1:1} -> pick 3
    # row 1: neighbors {7} -> 7
    # row 2: all pads -> INT32_INF (caller guards deg=0 rows)
    slab = jnp.asarray(
        np.array(
            [[3, 3, 5, 5, 1, -1], [7, -1, -1, -1, -1, -1], [-1, -1, -1, -1, -1, -1]],
            dtype=np.int32,
        ).T  # slabs are stored transposed [W, R]
    )
    out = np.asarray(_slab_minmode(labels, slab))
    assert out[0] == 3
    assert out[1] == 7


def test_empty_bucket_handling():
    g = uniform_graph(100, 400, directed=False, seed=2)
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n).astype(np.int32)
    plan = build_slab_plan(centers, neigh, deg.astype(np.int64), g.n, (16, 64, 256, 1024, 4096))
    assert plan.heavy_rows is None
    labels, it = cdlp_slab_run(g, centers, neigh, deg, 5, PlatformConfig())
    assert labels.shape == (g.n,)
