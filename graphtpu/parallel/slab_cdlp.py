"""Distributed slab min-mode CDLP — the production multi-chip path.

The single-chip production CDLP (graphtpu/ops/minmode.py) buckets rows by
degree into padded-ELL slabs and computes the smallest-most-frequent
neighbor label with vectorized row sorts. This module distributes THAT
kernel instead of the naive sort formulation the first multi-chip loop
used (the distributed analogue of the reference fork running its tuned
CUDA kernels rather than LAGraph's sort, cdlp_kernel.cu:1219-1312):

* one GLOBAL slab plan is built on the host, then every bucket's rows are
  split EVENLY across the mesh — each device gets 1/D of every degree
  bucket, so power-law skew balances by construction (no device inherits
  all the hubs the way a contiguous row partition would);
* under `shard_map` each device runs the same per-bucket minmode and
  heavy-tail stream kernels as the single-chip path on its slice and
  emits one locally-concatenated result block of static length L;
* a single tiled `all_gather` re-replicates the [D*L] concat over ICI,
  and a host-built static inverse permutation assembles it back to vertex
  order — one gather, no scatters, exactly like slab.assemble;
* zero-incidence rows keep their labels via the replicated
  `has_neighbors` mask; fixed-point early exit matches
  LAGraph_cdlp.c:328-332.

Communication per iteration is one all_gather of ~n labels — the same
volume as the sort-based loop, but the compute between collectives is
the measured-fast slab kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.core.types import INT32_INF
from graphtpu.ops.gather import table_gather
from graphtpu.ops.minmode import _slab_minmode, stream_minmode
from graphtpu.ops.scan_reduce import seg_min_scan
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import put_sharded

from graphtpu.parallel.partition import (  # noqa: E402
    EDGE_ALIGN as _EDGE_ALIGN,
    _round_up,
)


def _col_align(r_dev: int) -> int:
    """Pad each device's bucket column count: lane-tile multiples for big
    buckets, minimal padding for micro-fixture-sized ones."""
    return _round_up(r_dev, 128 if r_dev > 64 else 8)


class DistSlabPlan(NamedTuple):
    """Host-built static plan. Device arrays are sharded on axis 0."""

    bucket_slabs: Tuple[jax.Array, ...]  # each [D, W, R_dev] int32, -1 pad
    heavy: Optional[tuple]               # (centers [D,M], neigh [D,M], indptr [D,H_dev+2])
    inv_perm: jax.Array                  # [n] int32 into the gathered [D*L] concat
    has_neighbors: jax.Array             # [n] bool — rows with incidence entries


def build_dist_slab_plan(graph, mesh, buckets=None) -> DistSlabPlan:
    """CDLP incidence slab plan split per bucket across the mesh."""
    from graphtpu.algorithms.cdlp import build_incidence

    centers, neigh = build_incidence(graph)
    return build_dist_slab_plan_from(centers, neigh, graph.n, mesh, buckets)


def build_dist_slab_plan_from(
    centers, neigh, n, mesh, buckets=None
) -> DistSlabPlan:
    """Generic bucket-split slab plan over a center-sorted (centers,
    neigh) stream — shared by distributed CDLP (incidence) and the slab
    PR pull plan (in-edges)."""
    from graphtpu.ops.slab import resolve_buckets

    num_devices = int(mesh.devices.size)
    deg = np.bincount(centers, minlength=n).astype(np.int64)
    buckets = resolve_buckets(deg, buckets)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])

    edge_sharding3 = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    edge_sharding2 = NamedSharding(mesh, P(ROWS_AXIS, None))
    replicated = NamedSharding(mesh, P())

    slabs = []
    # (sel, r_dev) per bucket for the assembly permutation
    layout = []
    prev = 0
    for w in buckets:
        sel = np.nonzero((deg > prev) & (deg <= w))[0]
        prev = w
        if sel.size == 0:
            continue
        r = sel.shape[0]
        r_dev = _col_align(-(-r // num_devices))
        r_tot = r_dev * num_devices
        starts = indptr[sel]
        degs = deg[sel]
        offs = np.arange(w)
        pos = starts[:, None] + offs[None, :]
        mask = offs[None, :] < degs[:, None]
        slab = np.full((r_tot, w), -1, dtype=np.int32)
        slab[:r][mask] = neigh[pos[mask]]
        # [r_tot, W] -> [W, r_tot] -> [W, D, r_dev] -> [D, W, r_dev]
        dev_slab = np.ascontiguousarray(
            slab.T.reshape(w, num_devices, r_dev).transpose(1, 0, 2)
        )
        slabs.append(put_sharded(dev_slab, edge_sharding3))
        layout.append((sel, r_dev))

    heavy = None
    heavy_layout = None
    heavy_sel = np.nonzero(deg > buckets[-1])[0]
    h_dev = 0
    if heavy_sel.size:
        h = heavy_sel.shape[0]
        h_dev = -(-h // num_devices)
        # per-device edge stream sizes (padded heavy rows contribute 0)
        dev_edges = [
            int(deg[heavy_sel[d * h_dev : (d + 1) * h_dev]].sum())
            for d in range(num_devices)
        ]
        m_dev = max(_round_up(max(dev_edges), _EDGE_ALIGN), _EDGE_ALIGN)
        c_loc = np.full((num_devices, m_dev), h_dev, dtype=np.int32)
        nb = np.zeros((num_devices, m_dev), dtype=np.int32)
        ip = np.zeros((num_devices, h_dev + 2), dtype=np.int32)
        for d in range(num_devices):
            rows = heavy_sel[d * h_dev : (d + 1) * h_dev]
            local_deg = np.zeros(h_dev, dtype=np.int64)
            local_deg[: rows.shape[0]] = deg[rows]
            ip[d, 1 : h_dev + 1] = np.cumsum(local_deg)
            ip[d, h_dev + 1] = m_dev  # trailing junk segment holds the padding
            cursor = 0
            for k, row in enumerate(rows):
                s, c = int(indptr[row]), int(deg[row])
                c_loc[d, cursor : cursor + c] = k
                nb[d, cursor : cursor + c] = neigh[s : s + c]
                cursor += c
        heavy = (
            put_sharded(c_loc, edge_sharding2),
            put_sharded(nb, edge_sharding2),
            put_sharded(ip, edge_sharding2),
        )
        heavy_layout = (heavy_sel, h_dev)

    # per-device concat length and assembly permutation
    l_local = sum(r_dev for _, r_dev in layout) + h_dev
    inv_perm = np.zeros(n, dtype=np.int32)
    off = 0
    for sel, r_dev in layout:
        j = np.arange(sel.shape[0], dtype=np.int64)
        d = j // r_dev
        inv_perm[sel] = (d * l_local + off + (j % r_dev)).astype(np.int32)
        off += r_dev
    if heavy_layout is not None:
        sel, hd = heavy_layout
        k = np.arange(sel.shape[0], dtype=np.int64)
        d = k // hd
        inv_perm[sel] = (d * l_local + off + (k % hd)).astype(np.int32)

    return DistSlabPlan(
        tuple(slabs),
        heavy,
        put_sharded(inv_perm, replicated),
        put_sharded(deg > 0, replicated),
    )


def _make_step(mesh, num_buckets: int, with_heavy: bool, first,
               reduce: str = "minmode"):
    """shard_map'd per-device step: per-bucket reductions + heavy
    stream, one tiled all_gather of the local concat. `first`: "min"
    (duplicate-free gather-free iter0 — shared by CDLP's undirected
    iter0 AND the WCC slab kernel's identity-labels iter0), "mode"
    (gather-free full min-mode iter0 on the stored ids), or falsy (full
    step). `reduce` selects the full-step reduction: "minmode" (CDLP's
    smallest-most-frequent) or "min" (WCC's neighbor-label minimum —
    gather + axis-min / segment-min scan)."""

    def block(slabs, heavy, labels):
        n = labels.shape[0]
        parts = []
        for s in slabs:
            s0 = s[0]
            if first == "min":
                # duplicate-free incidence: mode == min neighbor id, no gather
                parts.append(jnp.min(jnp.where(s0 >= 0, s0, INT32_INF), axis=0))
            elif first == "mode":
                from graphtpu.ops.minmode import _rowwise_minmode

                parts.append(
                    _rowwise_minmode(jnp.where(s0 >= 0, s0, INT32_INF))
                )
            elif reduce == "min":
                vals = jnp.where(
                    s0 >= 0,
                    table_gather(labels, jnp.maximum(s0, 0)),
                    INT32_INF,
                )
                parts.append(jnp.min(vals, axis=0))
            else:
                parts.append(_slab_minmode(labels, s0))
        if heavy:
            c, nb, ip = heavy[0][0], heavy[1][0], heavy[2][0]
            h_dev = ip.shape[0] - 2
            if first == "min":
                hout = seg_min_scan(nb, c, ip, jnp.int32(INT32_INF))[:h_dev]
            elif first == "mode":
                hout = stream_minmode(None, c, nb, ip, n, identity=True)[:h_dev]
            elif reduce == "min":
                hout = seg_min_scan(
                    table_gather(labels, nb), c, ip, jnp.int32(INT32_INF)
                )[:h_dev]
            else:
                hout = stream_minmode(labels, c, nb, ip, n)[:h_dev]
            parts.append(hout)
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


@partial(jax.jit, static_argnames=("mesh", "itermax", "first_iter_min"))
def cdlp_slab_dist_kernel(plan: DistSlabPlan, labels0, mesh, itermax, first_iter_min):
    heavy = plan.heavy if plan.heavy is not None else ()

    def assemble(gathered, labels):
        new = table_gather(gathered, plan.inv_perm)
        return jnp.where(plan.has_neighbors, new, labels)

    start = jnp.int32(0)
    labels_init = labels0
    if itermax >= 1:
        step0 = _make_step(
            mesh, len(plan.bucket_slabs), bool(heavy),
            first="min" if first_iter_min else "mode",
        )
        labels_init = assemble(step0(plan.bucket_slabs, heavy, labels0), labels0)
        start = jnp.int32(1)

    step = _make_step(mesh, len(plan.bucket_slabs), bool(heavy), first=False)

    def cond(state):
        _, changed, it = state
        return changed & (it < itermax)

    def body(state):
        labels, _, it = state
        new = assemble(step(plan.bucket_slabs, heavy, labels), labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels_init, jnp.bool_(True), start)
    )
    return labels, it


jax.tree_util.register_pytree_node(
    DistSlabPlan,
    lambda p: (tuple(p), None),
    lambda _, c: DistSlabPlan(*c),
)


def cdlp_slab_dist(sg, itermax: int, buckets=None):
    """Entry point: distributed slab CDLP on a ShardedGraph. Returns
    (labels [n] np.int32, iterations)."""
    from graphtpu.ops.slab import bucket_policy_key
    from graphtpu.parallel.checkpoint import cached_plan

    bkey = bucket_policy_key(buckets)
    if getattr(sg, "_dist_slab_buckets", None) != bkey:
        sg._dist_slab_plan = None  # bucket policy changed: invalidate memo
    plan = cached_plan(
        sg, "_dist_slab_plan", "cdlp-incidence",
        lambda: build_dist_slab_plan(sg.graph, sg.mesh, buckets),
        buckets=buckets,
    )
    sg._dist_slab_buckets = bkey
    labels0 = jnp.arange(sg.n, dtype=jnp.int32)
    if not plan.bucket_slabs and plan.heavy is None:
        return np.arange(sg.n, dtype=np.int32), 0
    labels, it = cdlp_slab_dist_kernel(
        plan, labels0, sg.mesh, int(itermax), not sg.graph.directed
    )
    return np.asarray(labels), int(it)
