"""Distributed slab PageRank — the production multi-chip PR path.

The single-chip production PR runs the pull sum over a degree-bucketed
slab plan (graphtpu/ops/spmv.py slab_spmv — dense per-bucket gathers +
row sums, measured ~3x the scan path's nnz/s). This module distributes
THAT formulation by reusing the bucket-split machinery of
parallel/slab_cdlp.py: each device owns 1/D of every in-degree bucket
(skew balances by construction), sums its slab columns, and one tiled
all_gather + static inverse permutation re-assemble the pulled vector.
Dangling-mass redistribution and the teleport term stay replicated, as
in LAGr_PageRankGX (pr.cpp:58-63 semantics).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from graphtpu.ops.gather import table_gather
from graphtpu.ops.scan_reduce import seg_sum_scan
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.slab_cdlp import DistSlabPlan, build_dist_slab_plan_from


def _make_pull_step(mesh, num_buckets: int, with_heavy: bool):
    """shard_map'd slab pull sum: per-bucket gather + column sum, heavy
    stream via the two-level prefix scan, one tiled all_gather."""

    def block(slabs, heavy, x):
        parts = []
        for s in slabs:
            s0 = s[0]
            vals = jnp.where(
                s0 >= 0, table_gather(x, jnp.maximum(s0, 0)), jnp.zeros((), x.dtype)
            )
            parts.append(jnp.sum(vals, axis=0, dtype=x.dtype))
        if heavy:
            nb, ip = heavy[1][0], heavy[2][0]
            h_dev = ip.shape[0] - 2
            # padding edges live in the trailing junk segment (sliced off)
            vals = table_gather(x, nb)
            parts.append(
                seg_sum_scan(vals, ip, out_dtype=x.dtype)[:h_dev]
            )
        local = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        return jax.lax.all_gather(local, ROWS_AXIS, tiled=True)

    slab_specs = tuple(P(ROWS_AXIS, None, None) for _ in range(num_buckets))
    heavy_specs = tuple(P(ROWS_AXIS, None) for _ in range(3)) if with_heavy else ()
    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(slab_specs, heavy_specs, P()),
        out_specs=P(),
        check_vma=False,
    )


@partial(jax.jit, static_argnames=("mesh", "n", "num_iterations"))
def pr_slab_dist_kernel(plan: DistSlabPlan, out_deg, damping, mesh, n, num_iterations):
    """Graphalytics PageRank over the distributed slab pull plan.
    `out_deg` is the [n] OUT-degree (the plan buckets IN-edges)."""
    heavy = plan.heavy if plan.heavy is not None else ()
    step = _make_pull_step(mesh, len(plan.bucket_slabs), bool(heavy))
    dtype = damping.dtype
    inv_n = jnp.asarray(1.0 / n, dtype)
    teleport = (1.0 - damping) * inv_n
    is_dangling = out_deg == 0
    safe_deg = jnp.where(is_dangling, 1, out_deg).astype(dtype)
    inv_deg = jnp.where(is_dangling, 0.0, 1.0 / safe_deg)
    zero = jnp.zeros((), dtype)

    r0 = jnp.full((n,), inv_n, dtype=dtype)

    def body(_, r):
        gathered = step(plan.bucket_slabs, heavy, r * inv_deg)
        pulled = jnp.where(
            plan.has_neighbors, table_gather(gathered, plan.inv_perm), zero
        )
        dangling_mass = jnp.sum(jnp.where(is_dangling, r, 0.0))
        return teleport + damping * (pulled + dangling_mass * inv_n)

    return jax.lax.fori_loop(0, num_iterations, body, r0)


def pr_slab_dist(sg, damping: float, num_iterations: int, dtype=np.float32):
    """Entry point: distributed slab PR on a ShardedGraph. Returns ranks
    [n] as a host array."""
    from graphtpu.parallel.checkpoint import cached_plan

    def build():
        src, dst, _ = sg.graph.pull_arrays()
        return build_dist_slab_plan_from(
            dst.astype(np.int64), src.astype(np.int32), sg.n, sg.mesh, None
        )

    plan = cached_plan(sg, "_dist_pr_plan", "pr-pull", build)
    from graphtpu.parallel.partition import put_sharded

    out_deg = put_sharded(sg.graph.out_degree.astype(np.int32), sg.replicated)
    r = pr_slab_dist_kernel(
        plan,
        out_deg,
        jnp.asarray(damping, dtype),
        sg.mesh,
        sg.n,
        int(num_iterations),
    )
    return np.asarray(r)
