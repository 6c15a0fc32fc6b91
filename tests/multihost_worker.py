"""Worker process for the 2-process multi-host proof test.

Launched twice by tests/test_multihost.py (localhost coordinator, 4
virtual CPU devices per process -> 8 global). Runs all six distributed
algorithms on the full global mesh through multihost.initialize and
process-spanning shard construction (partition.put_sharded), then rank 0
cross-checks against the single-chip kernels and prints MULTIHOST_OK.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from graphtpu.parallel import multihost  # noqa: E402


def main() -> None:
    assert multihost.initialize(), "multi-host env config missing"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from graphtpu.parallel import ShardedGraph, make_mesh
    from graphtpu.parallel import algorithms as dist
    from graphtpu.utils.synth import uniform_graph

    # deterministic synth — every process builds the identical host graph
    g = uniform_graph(2000, 16000, directed=True, weighted=True, seed=5)
    mesh = make_mesh(0)  # all 8 global devices, spanning both processes
    sg = ShardedGraph(g, mesh, wdtype=np.float64)

    ranks = dist.pr_dist(sg, 0.85, 10, dtype=np.float64)
    labels, _ = dist.cdlp_dist(sg, 5)
    bfs_levels, _ = dist.bfs_dist(sg, 0)
    sssp_dist_res, _ = dist.sssp_dist(sg, 0)
    wcc_labels, _ = dist.wcc_dist(sg)
    lcc_coeff = dist.lcc_dist(sg)

    if multihost.is_primary():
        from graphtpu.algorithms.common import run_algorithm
        from graphtpu.utils.config import AlgorithmParams, PlatformConfig

        single_pr = run_algorithm(
            "pr",
            g,
            AlgorithmParams(damping_factor=0.85, num_iterations=10),
            PlatformConfig(precision="float64"),
        )
        np.testing.assert_allclose(ranks, single_pr.values, rtol=1e-9)
        single_cdlp = run_algorithm("cdlp", g, AlgorithmParams(max_iterations=5))
        np.testing.assert_array_equal(g.mapping[labels], single_cdlp.values)

        cfg = PlatformConfig()
        params_src0 = AlgorithmParams(source_vertex=int(g.mapping[0]))
        single_bfs = run_algorithm("bfs", g, params_src0, cfg)
        # serializer turns INT32_INF into int64-max; compare reachable +
        # unreachable classes exactly
        from graphtpu.core.types import INT32_INF, UNREACHABLE

        got = np.where(bfs_levels == INT32_INF, UNREACHABLE, bfs_levels)
        np.testing.assert_array_equal(got, single_bfs.values)

        single_sssp = run_algorithm("sssp", g, params_src0, cfg)
        np.testing.assert_allclose(
            np.asarray(sssp_dist_res, dtype=np.float64),
            single_sssp.values,
            rtol=1e-5,
        )

        single_wcc = run_algorithm("wcc", g, AlgorithmParams(), cfg)
        # component ids are representative-based on both sides: compare
        # the partitions, not the representative values
        def canon(lbl):
            _, inv = np.unique(lbl, return_inverse=True)
            first = {}
            out = np.empty_like(inv)
            for i, c in enumerate(inv):
                out[i] = first.setdefault(int(c), i)
            return out

        np.testing.assert_array_equal(canon(wcc_labels), canon(single_wcc.values))

        single_lcc = run_algorithm("lcc", g, AlgorithmParams(), cfg)
        np.testing.assert_allclose(
            np.asarray(lcc_coeff, dtype=np.float64), single_lcc.values, rtol=1e-5
        )
        print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
