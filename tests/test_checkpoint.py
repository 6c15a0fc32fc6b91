"""Sharded partition checkpoint: save/load roundtrip + skip-if-exists."""

import numpy as np
import jax

from graphtpu.parallel import ShardedGraph, make_mesh
from graphtpu.parallel import checkpoint as ckpt
from graphtpu.parallel.algorithms import pr_dist
from graphtpu.utils.synth import uniform_graph


def test_sharded_checkpoint_roundtrip(tmp_path):
    g = uniform_graph(2000, 16000, directed=True, seed=5)
    mesh = make_mesh(len(jax.devices()))
    sg = ShardedGraph(g, mesh, wdtype=np.float32)
    ranks_before = pr_dist(sg, 0.85, 5)

    assert not ckpt.exists(tmp_path, "u", sg.num_devices)
    d = ckpt.save_pull(sg, tmp_path, "u")
    assert ckpt.exists(tmp_path, "u", sg.num_devices)
    assert (d / "shard-0.npz").exists()

    # fresh ShardedGraph: load the partition instead of rebuilding
    sg2 = ShardedGraph(g, mesh, wdtype=np.float32)
    coo = ckpt.load_pull(sg2, tmp_path, "u")
    assert coo is not None
    np.testing.assert_array_equal(np.asarray(coo.src), np.asarray(sg.pull().src))
    np.testing.assert_array_equal(
        np.asarray(coo.dst_local), np.asarray(sg.pull().dst_local)
    )
    ranks_after = pr_dist(sg2, 0.85, 5)
    np.testing.assert_allclose(ranks_after, ranks_before, rtol=1e-6)


def test_checkpoint_incompatible_rejected(tmp_path):
    g = uniform_graph(1000, 4000, directed=True, seed=6)
    mesh = make_mesh(len(jax.devices()))
    sg = ShardedGraph(g, mesh)
    ckpt.save_pull(sg, tmp_path, "v")

    g2 = uniform_graph(1500, 4000, directed=True, seed=6)  # different n
    sg2 = ShardedGraph(g2, mesh)
    assert ckpt.load_pull(sg2, tmp_path, "v") is None


def test_dispatch_uses_checkpoint_on_repeat_run(tmp_path, monkeypatch):
    """Production wiring: a second distributed run of a named graph must
    restore the partition from the sharded checkpoint instead of
    repartitioning (VERDICT round 1, item 5)."""
    from graphtpu.algorithms.common import run_algorithm
    from graphtpu.ingest.loader import load_graph_from_spec
    from graphtpu.parallel import dispatch
    from graphtpu.parallel.partition import ShardedGraph
    from graphtpu.utils.config import GraphSpec, PlatformConfig
    from conftest import FIXTURES

    spec = GraphSpec.from_properties(FIXTURES / "example-directed.properties")
    cfg = PlatformConfig(
        intermediate_dir=str(tmp_path), num_devices=len(jax.devices())
    )
    g = load_graph_from_spec(spec, intermediate_dir=str(tmp_path))
    assert g.name == "example-directed"

    params = spec.params["pr"]
    r1 = run_algorithm("pr", g, params, cfg)
    # production PR is the distributed slab plan — its plan checkpoint
    # (not the pull COO) is the persisted partition
    assert ckpt.plan_exists(tmp_path, "example-directed", cfg.num_devices, "pr-pull")
    c1 = run_algorithm("cdlp", g, spec.params["cdlp"], cfg)
    assert ckpt.plan_exists(
        tmp_path, "example-directed", cfg.num_devices, "cdlp-incidence"
    )

    # fresh platform state: drop the in-memory sharded views, reload the
    # graph, and forbid repartitioning — the checkpoint must carry the run
    dispatch.purge_sharded(g)
    g2 = load_graph_from_spec(spec, intermediate_dir=str(tmp_path))

    def _no_rebuild(*a, **k):
        raise AssertionError("repartitioned despite existing checkpoint")

    from graphtpu.parallel import slab_cdlp, slab_pr

    monkeypatch.setattr(ShardedGraph, "_build_pull", _no_rebuild)
    monkeypatch.setattr(slab_pr, "build_dist_slab_plan_from", _no_rebuild)
    monkeypatch.setattr(slab_cdlp, "build_dist_slab_plan", _no_rebuild)
    r2 = run_algorithm("pr", g2, params, cfg)
    np.testing.assert_allclose(r2.values, r1.values, rtol=1e-6)
    c2 = run_algorithm("cdlp", g2, spec.params["cdlp"], cfg)
    np.testing.assert_array_equal(c2.values, c1.values)


def test_plan_checkpoint_invalidated_by_bucket_policy(tmp_path, monkeypatch):
    """Flipping the bucket env knobs must reject (and rebuild) a saved
    plan instead of silently reusing the other A/B arm's plan."""
    import jax

    from graphtpu.parallel import checkpoint as ckpt
    from graphtpu.parallel import ShardedGraph, make_mesh
    from graphtpu.parallel.slab_pr import pr_slab_dist
    from graphtpu.utils.synth import uniform_graph

    g = uniform_graph(200, 1600, directed=True, seed=4)
    g.name = "policykey"
    sg = ShardedGraph(g, make_mesh(len(jax.devices())))
    sg.ckpt = (str(tmp_path), "policykey")
    pr_slab_dist(sg, 0.85, 2)  # builds + saves the auto-policy plan
    assert ckpt.plan_exists(tmp_path, "policykey", sg.num_devices, "pr-pull")

    # same policy -> loadable; different bucket budget -> rejected
    assert ckpt.load_plan(tmp_path, "policykey", "pr-pull", mesh=sg.mesh,
                          n=sg.n, buckets=None) is not None
    monkeypatch.setenv("GRAPHTPU_SLAB_BUCKET_K", "3")
    assert ckpt.load_plan(tmp_path, "policykey", "pr-pull", mesh=sg.mesh,
                          n=sg.n, buckets=None) is None


def test_symmetrized_pull_checkpoint(tmp_path):
    """Directed WCC's symmetrized partition persists under <name>-sym and
    is restored instead of repartitioning."""
    import jax

    from graphtpu.parallel import ShardedGraph, make_mesh
    from graphtpu.utils.synth import uniform_graph

    g = uniform_graph(300, 2400, directed=True, seed=9)
    g.name = "symck"
    sg = ShardedGraph(g, make_mesh(len(jax.devices())))
    sg.ckpt = (str(tmp_path), "symck")
    coo1 = sg.pull_symmetrized()
    assert (tmp_path / "symck-sym" / f"shards-{sg.num_devices}").exists()

    # fresh sharded view: restore must not rebuild
    sg2 = ShardedGraph(g, make_mesh(len(jax.devices())))
    sg2.ckpt = (str(tmp_path), "symck")
    import graphtpu.parallel.partition as part

    orig = part.ShardedGraph._build_pull

    def _no_rebuild(self, graph):
        raise AssertionError("repartitioned despite existing sym checkpoint")

    part.ShardedGraph._build_pull = _no_rebuild
    try:
        coo2 = sg2.pull_symmetrized()
    finally:
        part.ShardedGraph._build_pull = orig
    import numpy as np

    np.testing.assert_array_equal(np.asarray(coo1.src), np.asarray(coo2.src))
    np.testing.assert_array_equal(np.asarray(coo1.valid), np.asarray(coo2.valid))
