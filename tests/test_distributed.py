"""Multi-chip parity tests on a virtual 8-device CPU mesh.

Each distributed loop must produce outputs that pass the same golden-file
validation as its single-chip sibling (conftest forces
--xla_force_host_platform_device_count=8, SURVEY.md §4 implication).
"""

from pathlib import Path

import numpy as np
import pytest
import jax

from graphtpu.algorithms.common import AlgorithmResult
from graphtpu.harness.validator import validate_result
from graphtpu.ingest.loader import load_graph_from_spec
from graphtpu.parallel import ShardedGraph, make_mesh
from graphtpu.parallel import algorithms as dist
from graphtpu.core.types import INT32_INF, UNREACHABLE
from graphtpu.utils.config import GraphSpec, PlatformConfig
from graphtpu.utils.synth import uniform_graph

from conftest import FIXTURES

ALGO_SUFFIX = {"bfs": "BFS", "pr": "PR", "wcc": "WCC", "cdlp": "CDLP", "sssp": "SSSP", "lcc": "LCC"}


def _spec(name):
    return GraphSpec.from_properties(FIXTURES / f"{name}.properties")


@pytest.fixture(scope="module", params=["example-directed", "example-undirected"])
def sharded(request):
    spec = _spec(request.param)
    g = load_graph_from_spec(spec, use_cache=False)
    mesh = make_mesh(len(jax.devices()))
    return spec, g, ShardedGraph(g, mesh, wdtype=np.float64)


def _validate(spec, g, algo, values, **kw):
    golden = FIXTURES / f"{spec.name}-{ALGO_SUFFIX[algo]}"
    result = AlgorithmResult(algo, values, **kw)
    ok, msg = validate_result(result, g, str(golden))
    assert ok, f"{spec.name}/{algo} (distributed): {msg}"


def test_pr_dist(sharded):
    spec, g, sg = sharded
    p = spec.params["pr"]
    ranks = dist.pr_dist(sg, p.damping_factor, p.num_iterations, dtype=np.float64)
    _validate(spec, g, "pr", ranks)


def test_bfs_dist(sharded):
    spec, g, sg = sharded
    src = g.dense_source(spec.params["bfs"].source_vertex)
    levels, _ = dist.bfs_dist(sg, src)
    levels = levels.astype(np.int64)
    levels[levels == INT32_INF] = UNREACHABLE
    _validate(spec, g, "bfs", levels)


def test_sssp_dist(sharded):
    spec, g, sg = sharded
    src = g.dense_source(spec.params["sssp"].source_vertex)
    d, _ = dist.sssp_dist(sg, src)
    _validate(spec, g, "sssp", d)


def test_wcc_dist(sharded):
    spec, g, sg = sharded
    labels, _ = dist.wcc_dist(sg)
    _validate(spec, g, "wcc", g.mapping[labels])


def test_cdlp_dist(sharded):
    spec, g, sg = sharded
    labels, _ = dist.cdlp_dist(sg, spec.params["cdlp"].max_iterations)
    _validate(spec, g, "cdlp", g.mapping[labels])


def test_lcc_dist(sharded):
    spec, g, sg = sharded
    coeff = dist.lcc_dist(sg)
    _validate(spec, g, "lcc", coeff)


def test_dispatch_all_six(sharded):
    """run_algorithm with num_devices > 1 routes every algorithm through
    the mesh and still validates."""
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.harness.validator import validate_result

    spec, g, _ = sharded
    cfg = PlatformConfig(num_devices=len(jax.devices()), precision="float64")
    for algo in spec.algorithms:
        res = run_algorithm(algo, g, spec.params.get(algo), cfg)
        golden = FIXTURES / f"{spec.name}-{ALGO_SUFFIX[algo]}"
        ok, msg = validate_result(res, g, str(golden))
        assert ok, f"{spec.name}/{algo} dispatch: {msg}"


@pytest.mark.parametrize("directed", [False, True])
def test_cdlp_slab_dist_heavy_tail(directed):
    """The production distributed CDLP (per-bucket row split + heavy-tail
    stream) matches the single-chip slab kernel exactly — tiny buckets
    force rows through the heavy stream_minmode path."""
    from graphtpu.algorithms.cdlp import build_incidence
    from graphtpu.ops.minmode import cdlp_slab_run
    from graphtpu.parallel.slab_cdlp import cdlp_slab_dist
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(10, 8, directed=directed, seed=7)
    mesh = make_mesh(len(jax.devices()))
    sg = ShardedGraph(g, mesh)
    labels, it = cdlp_slab_dist(sg, 10, buckets=(4, 8, 16, 32))
    centers, neigh = build_incidence(g)
    deg = np.bincount(centers, minlength=g.n)
    ref, it_ref = cdlp_slab_run(g, centers, neigh, deg, 10, PlatformConfig())
    np.testing.assert_array_equal(labels, np.asarray(ref))
    assert it == int(it_ref)


@pytest.mark.parametrize(
    "caps",
    [
        {},  # defaults: push handles everything at this scale
        # tiny push caps: every level runs the truncated bottom-up
        dict(bfs_frontier_rows=2, bfs_frontier_edges=4, bfs_bu_rows=512, bfs_bu_edges=4096),
        # bottom-up aborts too: dense fallback takes every heavy level
        dict(bfs_frontier_rows=2, bfs_frontier_edges=4, bfs_bu_rows=1, bfs_bu_edges=1),
        # mixed: phases hand over mid-traversal
        dict(bfs_frontier_rows=64, bfs_frontier_edges=256, bfs_bu_rows=32, bfs_bu_edges=512),
    ],
)
def test_bfs_adaptive_dist_phase_matrix(caps):
    """The distributed three-phase BFS matches the single-chip adaptive
    kernel under every phase regime (capacities force push-only,
    bottom-up, dense-fallback, and mixed traversals)."""
    from graphtpu.algorithms.bfs import bfs_adaptive_run
    from graphtpu.parallel.adaptive_bfs import bfs_adaptive_dist
    from graphtpu.utils.synth import rmat_graph

    mesh = make_mesh(len(jax.devices()))
    cfg = PlatformConfig(**caps)
    for directed in (False, True):
        g = rmat_graph(9, 8, directed=directed, seed=7)
        sg = ShardedGraph(g, mesh)
        ref = np.asarray(bfs_adaptive_run(g, 0, PlatformConfig())[0])
        levels, _ = bfs_adaptive_dist(sg, 0, cfg)
        np.testing.assert_array_equal(levels, ref)


@pytest.mark.parametrize(
    "caps",
    [
        {},  # wcc_impl defaults to auto -> the slab-adaptive variant
        # tiny caps: heavy rounds hit the slab + pointer-jumping fallback
        dict(wcc_frontier_rows=16, wcc_frontier_edges=64),
        # the edge-stream full-step arm stays selectable and correct
        dict(wcc_impl="adaptive"),
        dict(wcc_impl="adaptive", wcc_frontier_rows=16, wcc_frontier_edges=64),
    ],
)
def test_wcc_adaptive_dist_matches_single_chip(caps):
    """The distributed adaptive WCC (slab-adaptive default AND the
    edge-stream arm) produces the same min-vertex-id component labels as
    the single-chip kernel."""
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.parallel.adaptive_wcc import wcc_adaptive_dist
    from graphtpu.utils.config import AlgorithmParams
    from graphtpu.utils.synth import rmat_graph

    mesh = make_mesh(len(jax.devices()))
    cfg = PlatformConfig(**caps)
    for directed in (False, True):
        g = rmat_graph(9, 8, directed=directed, seed=7)
        sg = ShardedGraph(g, mesh)
        single = run_algorithm("wcc", g, AlgorithmParams(), PlatformConfig())
        labels, _ = wcc_adaptive_dist(sg, cfg)
        np.testing.assert_array_equal(g.mapping[labels], single.values)


@pytest.mark.parametrize("directed", [False, True])
def test_pr_slab_dist_matches_single_chip(directed):
    """The distributed slab PR (bucket-split pull plan) is bit-identical
    to the single-chip production PR (same per-row summation order)."""
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.parallel.slab_pr import pr_slab_dist
    from graphtpu.utils.config import AlgorithmParams
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(9, 8, directed=directed, seed=7)
    sg = ShardedGraph(g, make_mesh(len(jax.devices())), wdtype=np.float64)
    ranks = pr_slab_dist(sg, 0.85, 10, dtype=np.float64)
    single = run_algorithm(
        "pr",
        g,
        AlgorithmParams(damping_factor=0.85, num_iterations=10),
        PlatformConfig(precision="float64"),
    )
    np.testing.assert_array_equal(ranks, single.values)


@pytest.mark.parametrize(
    "caps",
    [
        {},  # default two-tier ladder (1/8 budgets under the configured)
        # tiny caps: heavy rounds hit the dense min.plus fallback
        dict(sssp_frontier_rows=8, sssp_frontier_edges=32),
        # explicit multi-tier ladder (sssp-tiers config contract)
        dict(sssp_tiers="64,512,4096"),
    ],
)
def test_sssp_adaptive_dist_matches_single_chip(caps):
    """The distributed changed-set Bellman-Ford matches the single-chip
    adaptive kernel bit-for-bit (unique min.plus fixed point; identical
    per-path accumulation order)."""
    from graphtpu.algorithms.sssp import sssp_adaptive_run
    from graphtpu.parallel.adaptive_sssp import sssp_adaptive_dist
    from graphtpu.utils.synth import rmat_graph

    mesh = make_mesh(len(jax.devices()))
    cfg = PlatformConfig(**caps)
    for directed in (False, True):
        g = rmat_graph(9, 8, directed=directed, seed=7, weighted=True)
        sg = ShardedGraph(g, mesh, wdtype=np.float64)
        ref, _ = sssp_adaptive_run(g, 0, PlatformConfig(), dtype=np.float64)
        d, _ = sssp_adaptive_dist(sg, 0, cfg)
        np.testing.assert_array_equal(d, ref)


@pytest.mark.parametrize("directed", [False, True])
def test_lcc_oriented_dist_matches_single_chip(directed):
    """The production distributed LCC (oriented wedges, bucket columns
    split across the mesh, replicated edge hash) matches the single-chip
    oriented kernel bit-for-bit."""
    from graphtpu.ops.triangles import lcc_oriented
    from graphtpu.parallel.wedge_lcc import lcc_oriented_dist
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(10, 8, directed=directed, seed=7)
    mesh = make_mesh(len(jax.devices()))
    sg = ShardedGraph(g, mesh)
    np.testing.assert_array_equal(lcc_oriented_dist(sg), lcc_oriented(g))


def test_lcc_dist_sweep_impl_selectable(sharded):
    """lcc_impl = "sweep" keeps the membership-sweep oracle available."""
    spec, g, sg = sharded
    coeff = dist.lcc_dist(sg, PlatformConfig(lcc_impl="sweep"))
    _validate(spec, g, "lcc", coeff)


def test_cdlp_dist_sort_impl_selectable(sharded):
    """cdlp_impl = "sort" keeps the per-shard sort formulation available."""
    spec, g, sg = sharded
    cfg = PlatformConfig(cdlp_impl="sort")
    labels, _ = dist.cdlp_dist(sg, spec.params["cdlp"].max_iterations, cfg)
    _validate(spec, g, "cdlp", g.mapping[labels])


def test_dist_matches_single_chip_on_random_graph():
    """Cross-check distributed vs single-chip kernels on a synthetic graph
    big enough that every device block is non-trivially populated."""
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.utils.config import AlgorithmParams, PlatformConfig

    g = uniform_graph(5000, 40000, directed=True, weighted=True, seed=3)
    mesh = make_mesh(len(jax.devices()))
    sg = ShardedGraph(g, mesh, wdtype=np.float64)
    cfg = PlatformConfig(precision="float64")

    ranks = dist.pr_dist(sg, 0.85, 10, dtype=np.float64)
    single = run_algorithm(
        "pr", g, AlgorithmParams(damping_factor=0.85, num_iterations=10), cfg
    )
    np.testing.assert_allclose(ranks, single.values, rtol=1e-9)

    labels, _ = dist.cdlp_dist(sg, 5)
    single = run_algorithm("cdlp", g, AlgorithmParams(max_iterations=5))
    np.testing.assert_array_equal(g.mapping[labels], single.values)

    dd, _ = dist.sssp_dist(sg, 0)
    single = run_algorithm("sssp", g, AlgorithmParams(source_vertex=0), cfg)
    np.testing.assert_allclose(dd, single.values, rtol=1e-12)


def test_lcc_dist_probe_modes(monkeypatch):
    """The distributed wedge LCC honors the GRAPHTPU_LCC_PROBE knob:
    square (pairs=None through shard_map) and pairs-sorted both match the
    pair-list default bit-for-bit."""
    from graphtpu.ops.triangles import lcc_oriented
    from graphtpu.parallel.wedge_lcc import lcc_oriented_dist
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(8, 8, directed=False, seed=7)
    ref = lcc_oriented(rmat_graph(8, 8, directed=False, seed=7))
    sg = ShardedGraph(g, make_mesh(len(jax.devices())))
    for mode in ("square", "pairs-sorted"):
        monkeypatch.setenv("GRAPHTPU_LCC_PROBE", mode)
        np.testing.assert_array_equal(lcc_oriented_dist(sg), ref)


def test_dist_stats_phase_counters():
    """The distributed WCC slab and tiered SSSP report executed-phase
    counters (with_stats) consistent with their round totals — the
    executed-volume accounting contract the single-chip kernels keep."""
    from graphtpu.parallel.adaptive_sssp import sssp_adaptive_dist
    from graphtpu.parallel.adaptive_wcc import wcc_adaptive_dist
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(9, 8, directed=False, seed=3, weighted=True)
    sg = ShardedGraph(g, make_mesh(len(jax.devices())), wdtype=np.float64)

    labels, it, wstats = wcc_adaptive_dist(sg, None, with_stats=True)
    assert wstats["impl"] == "slab"
    assert wstats["full_steps"] + wstats["active_steps"] == it
    assert labels.shape[0] == g.n

    d, rounds, sstats = sssp_adaptive_dist(sg, 0, None, with_stats=True)
    assert sum(sstats["tier_steps"].values()) + sstats["full_steps"] == rounds
    assert sstats["active_steps"] == rounds - sstats["full_steps"]
    assert d.shape[0] == g.n and d[0] == 0.0
