"""Slab SpMV vs segment-op SpMV parity, and PR slab-impl golden validation."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.core.semiring import MIN_PLUS, PLUS_SECOND, PLUS_TIMES
from graphtpu.core.spops import spmv
from graphtpu.ops.spmv import build_pull_plan, slab_spmv
from graphtpu.utils.synth import rmat_graph, uniform_graph

from conftest import FIXTURES


@pytest.mark.parametrize("semiring", [PLUS_TIMES, MIN_PLUS, PLUS_SECOND])
def test_slab_spmv_matches_segment_spmv(semiring):
    g = rmat_graph(9, 10, directed=True, weighted=True, seed=5)
    x = jnp.asarray(np.random.default_rng(0).random(g.n).astype(np.float32))
    coo = g.device_pull(wdtype=np.float32)
    y_seg = spmv(semiring, coo.src, coo.dst, coo.w, x, g.n)
    plan = build_pull_plan(g, wdtype=np.float32)
    y_slab = slab_spmv(semiring, plan, x, g.n)
    np.testing.assert_allclose(np.asarray(y_slab), np.asarray(y_seg), rtol=1e-5)


def test_slab_spmv_heavy_tail():
    g = uniform_graph(200, 20000, directed=True, weighted=True, seed=1)
    x = jnp.asarray(np.random.default_rng(1).random(g.n).astype(np.float64))
    coo = g.device_pull(wdtype=np.float64)
    y_seg = spmv(PLUS_TIMES, coo.src, coo.dst, coo.w, x, g.n)
    plan = build_pull_plan(g, wdtype=np.float64, buckets=(4, 16))  # force heavy path
    assert plan.heavy_rows is not None
    y_slab = slab_spmv(PLUS_TIMES, plan, x, g.n)
    np.testing.assert_allclose(np.asarray(y_slab), np.asarray(y_seg), rtol=1e-12)


def test_pr_slab_impl_validates():
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.harness.validator import validate_result
    from graphtpu.ingest.loader import load_graph_from_spec
    from graphtpu.utils.config import GraphSpec, PlatformConfig

    spec = GraphSpec.from_properties(FIXTURES / "example-directed.properties")
    g = load_graph_from_spec(spec, use_cache=False)
    cfg = PlatformConfig(spmv_impl="slab")
    res = run_algorithm("pr", g, spec.params["pr"], cfg)
    ok, msg = validate_result(res, g, str(FIXTURES / "example-directed-PR"))
    assert ok, msg


def test_pr_slab_matches_xla_impl():
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.utils.config import AlgorithmParams, PlatformConfig

    g = rmat_graph(10, 8, directed=True, seed=11)
    params = AlgorithmParams(damping_factor=0.85, num_iterations=12)
    r_xla = run_algorithm("pr", g, params, PlatformConfig(precision="float64"))
    r_slab = run_algorithm(
        "pr", g, params, PlatformConfig(precision="float64", spmv_impl="slab")
    )
    np.testing.assert_allclose(r_slab.values, r_xla.values, rtol=1e-12)
