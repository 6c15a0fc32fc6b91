"""Hybrid (direction-optimizing) BFS vs the pure-device kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.algorithms.bfs import _bfs_kernel, bfs_hybrid_run
from graphtpu.core.graph import Graph
from graphtpu.core.types import INT32_INF
from graphtpu.utils.config import PlatformConfig
from graphtpu.utils.synth import rmat_graph, uniform_graph


def _device_levels(g, src):
    coo = g.device_pull()
    indptr = jnp.asarray(g.pull_indptr.astype(np.int32))
    levels, it = _bfs_kernel(coo.src, coo.dst, indptr, jnp.int32(src), g.n)
    return np.asarray(levels), int(it)


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("threshold", [1.0, 0.2, 1e-9])
def test_hybrid_matches_device(directed, threshold):
    """threshold=1.0 forces host-only expansion; 1e-9 forces device-only;
    0.2 exercises the mode switches both ways."""
    g = rmat_graph(9, 8, directed=directed, seed=5)
    cfg = PlatformConfig(bfs_active_threshold=threshold)
    ref_levels, ref_it = _device_levels(g, 0)
    got_levels, got_it = bfs_hybrid_run(g, 0, cfg)
    np.testing.assert_array_equal(got_levels, ref_levels)
    assert got_it == ref_it


def test_hybrid_unreachable_and_chain():
    # 0->1->2->3 chain plus isolated vertex 4 (unreachable)
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = Graph(5, src, dst, None, np.arange(5, dtype=np.uint64),
              directed=True, weighted=False)
    for threshold in (1.0, 1e-9):
        levels, it = bfs_hybrid_run(g, 0, PlatformConfig(bfs_active_threshold=threshold))
        np.testing.assert_array_equal(levels[:4], [0, 1, 2, 3])
        assert levels[4] == INT32_INF
        ref_levels, ref_it = _device_levels(g, 0)
        np.testing.assert_array_equal(levels, ref_levels)
        assert it == ref_it


def test_hybrid_uniform_directed():
    g = uniform_graph(500, 4000, directed=True, seed=2)
    ref_levels, ref_it = _device_levels(g, 3)
    got_levels, got_it = bfs_hybrid_run(g, 3, PlatformConfig(bfs_active_threshold=0.3))
    np.testing.assert_array_equal(got_levels, ref_levels)
    assert got_it == ref_it


# ---------------- single-dispatch device kernel ----------------


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize(
    "caps",
    [
        (1 << 10, 1 << 14),  # roomy: active path covers everything
        (4, 16),             # tiny: dense fallback dominates
    ],
)
def test_adaptive_matches_device(directed, caps):
    from graphtpu.algorithms.bfs import bfs_adaptive_run

    g = rmat_graph(9, 8, directed=directed, seed=5)
    cfg = PlatformConfig(bfs_frontier_rows=caps[0], bfs_frontier_edges=caps[1])
    ref_levels, ref_it = _device_levels(g, 0)
    got_levels, got_it = bfs_adaptive_run(g, 0, cfg)
    np.testing.assert_array_equal(got_levels, ref_levels)
    assert got_it == ref_it


def test_adaptive_chain_and_unreachable():
    from graphtpu.algorithms.bfs import bfs_adaptive_run

    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = Graph(5, src, dst, None, np.arange(5, dtype=np.uint64),
              directed=True, weighted=False)
    for caps in ((1 << 8, 1 << 10), (4, 4)):
        cfg = PlatformConfig(bfs_frontier_rows=caps[0], bfs_frontier_edges=caps[1])
        levels, it = bfs_adaptive_run(g, 0, cfg)
        np.testing.assert_array_equal(levels[:4], [0, 1, 2, 3])
        assert levels[4] == INT32_INF
        ref_levels, ref_it = _device_levels(g, 0)
        np.testing.assert_array_equal(levels, ref_levels)
        assert it == ref_it


@pytest.mark.parametrize("directed", [False, True])
def test_bfs_step_mode_switch_matches_phases(directed):
    """bfs_step_mode="switch" (single while_loop + lax.switch body) is
    bit-identical to the default nested-phase machinery, including the
    per-phase step counters — the config-exposed comparison arm stays
    correct (scripts/perf/measure_bfs_switch.py is the perf side)."""
    from graphtpu.algorithms.bfs import bfs_adaptive_run
    from graphtpu.utils.config import PlatformConfig
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(9, 8, directed=directed, seed=5)
    # small caps force multi-phase traversals (tiers + bottom-up + dense)
    base = dict(bfs_frontier_rows=64, bfs_frontier_edges=256,
                bfs_bu_rows=32, bfs_bu_edges=512)
    lp, itp, sp = bfs_adaptive_run(
        g, 0, PlatformConfig(bfs_step_mode="phases", **base), with_stats=True
    )
    ls, its, ss = bfs_adaptive_run(
        g, 0, PlatformConfig(bfs_step_mode="switch", **base), with_stats=True
    )
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(ls))
    assert itp == its
    assert sp == ss
