"""Distributed (multi-chip) algorithm loops over a row-partitioned mesh.

Every loop has the same shape as its single-chip sibling in
graphtpu/algorithms/ — identical semantics, validated against the same
golden files — but the per-iteration SpMV runs under `jax.shard_map`:
each device reduces the edges targeting its row block, then the dense
iterate is re-replicated with one tiled `all_gather` over the mesh axis
(the ICI collective replacing the reference's global-memory label array,
cdlp_kernel.cu:1195-1196). Convergence flags come out of the replicated
dense compute, so no extra psum is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from graphtpu.core.types import INT32_INF
from graphtpu.ops.gather import table_gather
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import ShardedCOO, ShardedGraph, ShardedIncidence

_EDGE_SPECS = (P(ROWS_AXIS, None),) * 4


def _spmv_block(segment_reduce, mul, identity):
    """Per-device body: gather + fused multiply + sorted segment reduce over
    the local row block, then tiled all_gather back to a replicated vector."""

    def block(src, dst_local, w, valid, x, rows_per_dev):
        terms = mul(w[0], table_gather(x, src[0]))
        terms = jnp.where(valid[0], terms, identity(terms.dtype))
        y = segment_reduce(
            terms, dst_local[0], num_segments=rows_per_dev, indices_are_sorted=True
        )
        return jax.lax.all_gather(y, ROWS_AXIS, tiled=True)

    return block


def _shard_spmv(mesh, rows_per_dev, segment_reduce, mul, identity):
    body = _spmv_block(segment_reduce, mul, identity)
    return jax.shard_map(
        lambda s, d, w, v, x: body(s, d, w, v, x, rows_per_dev),
        mesh=mesh,
        in_specs=_EDGE_SPECS + (P(),),
        out_specs=P(),
        check_vma=False,
    )


def _second(w, x):
    return x


def _plus(w, x):
    return w + x


# --------------------------------------------------------------------- PR


@partial(jax.jit, static_argnames=("mesh", "rows_per_dev", "n", "num_iterations"))
def pr_dist_kernel(coo: ShardedCOO, out_deg, damping, mesh, rows_per_dev, n, num_iterations):
    """Graphalytics PageRank (see graphtpu/algorithms/pr.py) with the pull
    SpMV sharded over the mesh. `out_deg` is padded/replicated [n_pad];
    padding rows have degree 0 but are excluded from n and dangling mass."""
    dtype = damping.dtype
    n_pad = out_deg.shape[0]
    inv_n = jnp.asarray(1.0 / n, dtype)
    teleport = (1.0 - damping) * inv_n
    in_range = jnp.arange(n_pad, dtype=jnp.int32) < n
    is_dangling = (out_deg == 0) & in_range
    safe_deg = jnp.where(out_deg == 0, 1, out_deg).astype(dtype)
    inv_deg = jnp.where(out_deg == 0, 0.0, 1.0 / safe_deg)

    spmv = _shard_spmv(
        mesh, rows_per_dev, jax.ops.segment_sum, _second, lambda dt: jnp.zeros((), dt)
    )

    r0 = jnp.where(in_range, inv_n, 0.0).astype(dtype)

    def body(_, r):
        pulled = spmv(coo.src, coo.dst_local, coo.w, coo.valid, r * inv_deg)
        dangling_mass = jnp.sum(jnp.where(is_dangling, r, 0.0))
        return jnp.where(in_range, teleport + damping * (pulled + dangling_mass * inv_n), 0.0)

    return jax.lax.fori_loop(0, num_iterations, body, r0)


def pr_dist(sg: ShardedGraph, damping: float, num_iterations: int, dtype=np.float32, cfg=None):
    """Distributed PageRank. Default = the slab pull plan split per
    bucket across the mesh (parallel/slab_pr.py — the production
    formulation); `pr_impl = "segment"` keeps the segment-sum loop."""
    if (getattr(cfg, "pr_impl", "") or "slab") != "segment":
        from graphtpu.parallel.slab_pr import pr_slab_dist

        return pr_slab_dist(sg, damping, num_iterations, dtype=dtype)
    coo = sg.pull()
    out_deg = sg.out_degree_padded()
    r = pr_dist_kernel(
        coo,
        out_deg,
        jnp.asarray(damping, dtype),
        sg.mesh,
        sg.rows_per_dev,
        sg.n,
        int(num_iterations),
    )
    return np.asarray(r)[: sg.n]


# --------------------------------------------------------------------- BFS


@partial(jax.jit, static_argnames=("mesh", "rows_per_dev", "n"))
def bfs_dist_kernel(coo: ShardedCOO, source, mesh, rows_per_dev, n):
    n_pad = coo.src.shape[0] * rows_per_dev
    spmv = _shard_spmv(
        mesh, rows_per_dev, jax.ops.segment_max, _second, lambda dt: jnp.zeros((), dt)
    )
    levels0 = jnp.full((n_pad,), INT32_INF, dtype=jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros((n_pad,), dtype=jnp.int32).at[source].set(1)

    def cond(state):
        level, levels, frontier, nonempty = state
        return nonempty & (level < n)

    def body(state):
        level, levels, frontier, _ = state
        reached = spmv(coo.src, coo.dst_local, coo.w, coo.valid, frontier)
        new_frontier = jnp.where(levels == INT32_INF, reached, 0)
        levels = jnp.where(new_frontier == 1, level + 1, levels)
        return level + 1, levels, new_frontier, jnp.any(new_frontier == 1)

    level, levels, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), levels0, frontier0, jnp.bool_(True))
    )
    return levels, level


def bfs_dist(sg: ShardedGraph, source_dense: int, cfg=None):
    """Distributed BFS. Default = the three-phase adaptive kernel
    (parallel/adaptive_bfs.py); `bfs_impl = "dense"` keeps the per-level
    full-edge pull loop."""
    if (getattr(cfg, "bfs_impl", "") or "adaptive") != "dense":
        from graphtpu.parallel.adaptive_bfs import bfs_adaptive_dist

        return bfs_adaptive_dist(sg, source_dense, cfg)
    coo = sg.pull()
    levels, it = bfs_dist_kernel(coo, jnp.int32(source_dense), sg.mesh, sg.rows_per_dev, sg.n)
    return np.asarray(levels)[: sg.n], int(it)


# --------------------------------------------------------------------- SSSP


@partial(jax.jit, static_argnames=("mesh", "rows_per_dev", "n"))
def sssp_dist_kernel(coo: ShardedCOO, source, mesh, rows_per_dev, n):
    n_pad = coo.src.shape[0] * rows_per_dev
    dtype = coo.w.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    spmv = _shard_spmv(
        mesh, rows_per_dev, jax.ops.segment_min, _plus, lambda dt: jnp.asarray(jnp.inf, dt)
    )
    dist0 = jnp.full((n_pad,), inf, dtype=dtype).at[source].set(0.0)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        dist, _, it = state
        relaxed = spmv(coo.src, coo.dst_local, coo.w, coo.valid, dist)
        new = jnp.minimum(dist, relaxed)
        return new, jnp.any(new < dist), it + 1

    dist, _, it = jax.lax.while_loop(cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist, it


def sssp_dist(sg: ShardedGraph, source_dense: int, cfg=None):
    """Distributed SSSP. Default = the changed-set adaptive kernel
    (parallel/adaptive_sssp.py); `sssp_impl = "dense"` keeps the
    per-round full-edge min.plus loop."""
    if (getattr(cfg, "sssp_impl", "") or "adaptive") != "dense":
        from graphtpu.parallel.adaptive_sssp import sssp_adaptive_dist

        return sssp_adaptive_dist(sg, source_dense, cfg)
    coo = sg.pull()
    dist, it = sssp_dist_kernel(coo, jnp.int32(source_dense), sg.mesh, sg.rows_per_dev, sg.n)
    return np.asarray(dist, dtype=np.float64)[: sg.n], int(it)


# --------------------------------------------------------------------- WCC


@partial(jax.jit, static_argnames=("mesh", "rows_per_dev", "n"))
def wcc_dist_kernel(coo: ShardedCOO, mesh, rows_per_dev, n):
    n_pad = coo.src.shape[0] * rows_per_dev
    spmv = _shard_spmv(
        mesh,
        rows_per_dev,
        jax.ops.segment_min,
        _second,
        lambda dt: jnp.asarray(jnp.iinfo(dt).max if jnp.issubdtype(dt, jnp.integer) else jnp.inf, dt),
    )
    labels0 = jnp.arange(n_pad, dtype=jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        labels, _, it = state
        neigh_min = spmv(coo.src, coo.dst_local, coo.w, coo.valid, labels)
        new = jnp.minimum(labels, neigh_min)
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, it


def wcc_dist(sg: ShardedGraph, cfg=None):
    """Distributed WCC. Default = the convergence-adaptive kernel
    (parallel/adaptive_wcc.py); `wcc_impl = "dense"` keeps the per-round
    full-edge min-propagation loop."""
    if (getattr(cfg, "wcc_impl", "") or "adaptive") != "dense":
        from graphtpu.parallel.adaptive_wcc import wcc_adaptive_dist

        return wcc_adaptive_dist(sg, cfg)
    coo = sg.pull_symmetrized()
    labels, it = wcc_dist_kernel(coo, sg.mesh, sg.rows_per_dev, sg.n)
    return np.asarray(labels)[: sg.n], int(it)


# --------------------------------------------------------------------- CDLP


@partial(jax.jit, static_argnames=("mesh", "rows_per_dev", "n", "itermax"))
def cdlp_dist_kernel(inc: ShardedIncidence, deg, mesh, rows_per_dev, n, itermax):
    """Min-mode label propagation with the sort + run-length scan running
    per device over its center block (each device sorts only its incidence
    shard — the distributed analogue of LAGraph_cdlp.c:286's global sort)."""
    from graphtpu.algorithms.cdlp import _run_extents

    n_pad = deg.shape[0]
    has_neighbors = deg > 0
    labels0 = jnp.arange(n_pad, dtype=jnp.int32)

    def block(center_local, neigh, valid, labels):
        centers, neigh, valid = center_local[0], neigh[0], valid[0]
        my_block = jax.lax.axis_index(ROWS_AXIS) * rows_per_dev
        lab = jnp.where(valid, table_gather(labels, neigh), INT32_INF)
        c_s, l_s = jax.lax.sort((centers, lab), num_keys=2)
        counts = _run_extents(c_s, l_s)
        counts = jnp.where(l_s == INT32_INF, 0, counts)
        max_count = jax.ops.segment_max(
            counts, c_s, num_segments=rows_per_dev + 1, indices_are_sorted=True
        )
        is_best = (counts == max_count[c_s]) & (l_s != INT32_INF)
        best = jax.ops.segment_min(
            jnp.where(is_best, l_s, INT32_INF),
            c_s,
            num_segments=rows_per_dev + 1,
            indices_are_sorted=True,
        )[:rows_per_dev]
        local_old = jax.lax.dynamic_slice(labels, (my_block,), (rows_per_dev,))
        local_has = jax.lax.dynamic_slice(has_neighbors, (my_block,), (rows_per_dev,))
        new_local = jnp.where(local_has, best, local_old)
        return jax.lax.all_gather(new_local, ROWS_AXIS, tiled=True)

    step = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 3 + (P(),),
        out_specs=P(),
        check_vma=False,
    )

    def cond(state):
        _, changed, it = state
        return changed & (it < itermax)

    def body(state):
        labels, _, it = state
        new = step(inc.center_local, inc.neigh, inc.valid, labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, it


def cdlp_dist(sg: ShardedGraph, itermax: int, cfg=None):
    """Distributed CDLP. Default = the production slab min-mode kernel
    split per degree bucket across the mesh (parallel/slab_cdlp.py);
    `cdlp_impl = "sort"` keeps the per-shard sort formulation."""
    impl = getattr(cfg, "cdlp_impl", "") or "slab"
    if impl != "sort":
        from graphtpu.parallel.slab_cdlp import cdlp_slab_dist

        buckets = (
            tuple(cfg.slab_buckets)
            if cfg is not None and getattr(cfg, "slab_buckets", None)
            else None
        )
        return cdlp_slab_dist(sg, itermax, buckets)
    inc = sg.incidence()
    deg = sg.incidence_degree_padded()
    labels, it = cdlp_dist_kernel(inc, deg, sg.mesh, sg.rows_per_dev, sg.n, int(itermax))
    return np.asarray(labels)[: sg.n], int(it)


# --------------------------------------------------------------------- LCC


def lcc_dist(sg: ShardedGraph, cfg=None):
    """Distributed LCC. Default = the oriented-wedge plan with bucket
    columns split across the mesh (parallel/wedge_lcc.py — the scalable
    path); falls back to the membership sweep below when the wedge plan's
    bucket capacity is exceeded or `lcc_impl = "sweep"` is set."""
    impl = getattr(cfg, "lcc_impl", "") or "auto"
    if impl != "sweep":
        from graphtpu.ops.triangles import WedgeCapacityError
        from graphtpu.parallel.wedge_lcc import lcc_oriented_dist

        try:
            return lcc_oriented_dist(
                sg, cache_dir=getattr(cfg, "intermediate_dir", None)
            )
        except WedgeCapacityError:
            if impl == "oriented":
                raise
            from graphtpu.utils.logging import get_logger

            get_logger("dist").warning(
                "wedge-plan capacity exceeded; falling back to membership sweep"
            )
    return _lcc_dist_sweep(sg)


def _lcc_dist_sweep(sg: ShardedGraph):
    """Membership-sweep distributed LCC: the A-edge sweep list is split
    evenly across the mesh (the CSR structure S is replicated — it is
    read-only and the sweep is the dominant cost); per-device partial
    numerators are combined with one psum. Retained as the oracle
    (`lcc_impl = "sweep"`); infeasible at graph scale."""
    from graphtpu.algorithms.lcc import _lcc_bucket_sweep, _bucket_bounds, _CHUNK, prepare_lcc

    graph = sg.graph
    n = graph.n
    mesh = sg.mesh
    num_devices = sg.num_devices
    s_indptr, s_dst, s_deg, c, o, dc = prepare_lcc(graph)
    max_deg = int(s_deg.max()) if n else 0
    search_iters = max(1, int(np.ceil(np.log2(max(max_deg, 2) + 1))))

    indptr_d = sg.put_replicated(s_indptr)
    col_d = sg.put_replicated(s_dst)
    numerator = sg.put_replicated(np.zeros(n, dtype=np.int32))

    import jax as _jax
    from jax.sharding import NamedSharding

    edge_sharding = NamedSharding(mesh, P(ROWS_AXIS, None))

    for pad in _bucket_bounds(max_deg):
        lo_bound = 0 if pad == 16 else pad // 8
        sel = (dc > lo_bound) & (dc <= pad) if pad > 16 else dc <= pad
        cnt = int(sel.sum())
        if cnt == 0:
            continue
        per_dev = -(-cnt // (num_devices * _CHUNK)) * _CHUNK
        cb = np.full((num_devices, per_dev), -1, dtype=np.int32)
        ob = np.full((num_devices, per_dev), -1, dtype=np.int32)
        flat_c, flat_o = c[sel], o[sel]
        for d in range(num_devices):
            part = flat_c[d * per_dev : (d + 1) * per_dev]
            cb[d, : part.shape[0]] = part
            ob[d, : part.shape[0]] = flat_o[d * per_dev : (d + 1) * per_dev]
        from graphtpu.parallel.partition import put_sharded

        cb_d = put_sharded(cb, edge_sharding)
        ob_d = put_sharded(ob, edge_sharding)

        def bucket_block(num, indptr, col, cdev, odev, pad=pad):
            local = _lcc_bucket_sweep(
                jnp.zeros_like(num), indptr, col, cdev[0], odev[0], pad, search_iters
            )
            return num + _jax.lax.psum(local, ROWS_AXIS)

        step = _jax.shard_map(
            bucket_block,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(ROWS_AXIS, None), P(ROWS_AXIS, None)),
            out_specs=P(),
            check_vma=False,
        )
        numerator = step(numerator, indptr_d, col_d, cb_d, ob_d)

    num = np.asarray(numerator, dtype=np.float64)
    d = s_deg.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(denom > 0, num / denom, 0.0)
    return coeff
