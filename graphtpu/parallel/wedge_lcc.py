"""Distributed oriented-wedge LCC — the scalable multi-chip path.

Replaces the membership-sweep distributed LCC (Σ min(du, dw) probes —
the formulation that could not finish at graph scale even single-chip)
with the degree-oriented wedge plan (graphtpu/ops/triangles.py, the TPU
counterpart of LAGraph_lcc's masked SpGEMM, lcc.cpp:61-70):

* the host wedge plan (rank relabel, orientation, degree buckets, edge
  hash) is built once and shared with the single-chip path;
* every wedge bucket's columns (= center rows) are split evenly across
  the mesh, so each device probes 1/D of every bucket's pair square —
  degree skew balances by construction;
* the edge-membership hash table is REPLICATED (read-only; ~1 GB at
  RMAT s20/ef32 against ~16 GB HBM per chip) — each probe stays one
  local row gather, no cross-chip traffic in the hot loop;
* apex (u) credits ride one tiled all_gather per bucket; edge (x/y)
  credits are aggregated per device over its OWN slab entries with the
  head-sorted segment-sum and combined with one psum — the only
  collectives in the whole computation.

Per-device dispatches are capped (the TPU worker watchdog kills
minutes-long kernels), slicing bucket columns when needed.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.ops.gather import table_gather
from graphtpu.ops.scan_reduce import seg_sum_scan
from graphtpu.ops.triangles import (
    WedgePlan,
    _patch_spilled,
    _wedge_bucket,
    _wedge_bucket_rowblock,
    prepare_wedge_plan,
)
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import put_sharded

# pair-square probes per device per dispatch (watchdog bound)
_MAX_DISPATCH_PAIRS = 1 << 30


from graphtpu.parallel.partition import _round_up  # noqa: E402


@partial(
    jax.jit, static_argnames=("mesh", "id_bits", "chunk_cols", "sort_probes")
)
def _dist_wedge_bucket(
    slab, mslab, ehash, mesh, id_bits, chunk_cols, pairs=None, sort_probes=False
):
    """One sharded bucket slice: per-device probes — the upper-triangle
    pair list when `pairs` is given (half the table gathers, same as the
    single-chip default), else the full pair square. Returns (u credits
    all_gathered [D*R_dev], edge credits sharded [D, W, R_dev])."""

    def block(s, m, eh, pr):
        u, e = _wedge_bucket(
            s[0], m[0], eh, id_bits, chunk_cols, pr, sort_probes=sort_probes
        )
        return jax.lax.all_gather(u, ROWS_AXIS, tiled=True), e[None]

    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS, None, None),
            P(ROWS_AXIS, None, None),
            P(),
            P(),
        ),
        out_specs=(P(), P(ROWS_AXIS, None, None)),
        check_vma=False,
    )(slab, mslab, ehash, pairs)


@partial(
    jax.jit, static_argnames=("mesh", "id_bits", "rc", "pc", "sort_probes")
)
def _dist_wedge_bucket_rowblock(
    slab, mslab, ehash, ii_pad, jj_pad, mesh, id_bits, rc, pc,
    sort_probes=False,
):
    """Sharded row-blocked pair-chunk bucket (ops/triangles.py
    _wedge_bucket_rowblock per device slice) — same full-lane tiling fix
    as single-chip; the row axis is already the sharded axis."""

    def block(s, m, eh, ii, jj):
        u, e = _wedge_bucket_rowblock(
            s[0], m[0], eh, id_bits, ii, jj, rc, pc, sort_probes=sort_probes
        )
        return jax.lax.all_gather(u, ROWS_AXIS, tiled=True), e[None]

    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS, None, None),
            P(ROWS_AXIS, None, None),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(), P(ROWS_AXIS, None, None)),
        check_vma=False,
    )(slab, mslab, ehash, ii_pad, jj_pad)


@partial(jax.jit, static_argnames=("mesh", "n"))
def _dist_head_bookkeeping(slabs, mesh, n):
    """Per-device head-credit bookkeeping, entirely on device (the host
    version D2H-copied every slab and argsorted per device — minutes of
    single-core work at graph scale). Every slab position (including
    padding — padding credits are provably zero, see left-packing note in
    ops/triangles.py) maps to one entry: head id (padding → n, the junk
    segment) and its flat position in the device-local credit concat.
    One (head, pos) sort + an n+2-boundary searchsorted per device yield
    the head-ordered gather permutation and the segment indptr."""

    def block(slabs):
        parts = [
            jnp.where(s[0] >= 0, s[0], n).reshape(-1) for s in slabs
        ]
        heads = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        pos = jnp.arange(heads.shape[0], dtype=jnp.int32)
        heads_s, pos_s = jax.lax.sort((heads, pos), num_keys=1)
        hip = jnp.searchsorted(
            heads_s, jnp.arange(n + 2, dtype=heads_s.dtype)
        ).astype(jnp.int32)
        return pos_s[None], hip[None]

    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(tuple(P(ROWS_AXIS, None, None) for _ in slabs),),
        out_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None)),
        check_vma=False,
    )(slabs)


@partial(jax.jit, static_argnames=("mesh", "n"))
def _dist_aggregate_heads(e_creds, pos, hip, mesh, n):
    """Per-device head-sorted segment-sum of that device's slab-entry
    credits, combined across the mesh with one psum. `pos` is already
    head-ordered (from _dist_head_bookkeeping); padding entries carry
    zero credit and live in the trailing junk segment (head == n)."""

    def block(es, pos_d, hip_d):
        flat = jnp.concatenate([e[0].reshape(-1) for e in es])
        ordered = table_gather(flat, pos_d[0])
        part = seg_sum_scan(
            ordered.astype(jnp.float32), hip_d[0], out_dtype=jnp.float64
        )[:n]
        return jax.lax.psum(part, ROWS_AXIS)

    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(
            tuple(P(ROWS_AXIS, None, None) for _ in e_creds),
            P(ROWS_AXIS, None),
            P(ROWS_AXIS, None),
        ),
        out_specs=P(),
        check_vma=False,
    )(e_creds, pos, hip)


def lcc_oriented_dist_numerator(plan: WedgePlan, mesh) -> np.ndarray:
    """Triangle-credit numerator per RANKED vertex id, computed over the
    mesh. Mirrors lcc_oriented_numerator's credit accounting exactly."""
    import os as _os

    n = plan.n
    num_devices = int(mesh.devices.size)
    sharding3 = NamedSharding(mesh, P(ROWS_AXIS, None, None))

    numerator_ranked = np.zeros(n, dtype=np.int64)
    e_creds = []
    dev_slabs = []
    # same probe-mode knob as the single-chip path (rowblock by default)
    probe_mode = _os.environ.get("GRAPHTPU_LCC_PROBE", "rowblock")
    sort_probes = probe_mode.endswith("-sorted")
    pair_cache: dict = {}

    for b in plan.buckets:
        slab_np = np.asarray(b.slab)    # [W, r_pad]
        mslab_np = np.asarray(b.mslab)
        w, r_pad = slab_np.shape
        r_dev = _round_up(-(-r_pad // num_devices), b.chunk_cols)
        r_tot = r_dev * num_devices
        if r_tot != r_pad:
            slab_np = np.pad(slab_np, ((0, 0), (0, r_tot - r_pad)), constant_values=-1)
            mslab_np = np.pad(mslab_np, ((0, 0), (0, r_tot - r_pad)))
        dev_slab = put_sharded(
            np.ascontiguousarray(
                slab_np.reshape(w, num_devices, r_dev).transpose(1, 0, 2)
            ),
            sharding3,
        )
        dev_mslab = put_sharded(
            np.ascontiguousarray(
                mslab_np.reshape(w, num_devices, r_dev).transpose(1, 0, 2)
            ),
            sharding3,
        )
        dev_slabs.append(dev_slab)

        from graphtpu.ops.triangles import bucket_probe_schedule

        use_rowblock, rc, pc, pairs, rpd = bucket_probe_schedule(
            b, probe_mode, _MAX_DISPATCH_PAIRS, pair_cache
        )

        # probe, slicing columns to bound per-device dispatch size
        u_full = np.zeros(r_tot, dtype=np.int64)
        e_parts = []
        for s0 in range(0, r_dev, rpd):
            s1 = min(s0 + rpd, r_dev)
            sl = jax.lax.slice_in_dim(dev_slab, s0, s1, axis=2)
            ml = jax.lax.slice_in_dim(dev_mslab, s0, s1, axis=2)
            if use_rowblock:
                u_g, e_g = _dist_wedge_bucket_rowblock(
                    sl, ml, plan.ehash, *pairs, mesh, plan.id_bits, rc, pc,
                    sort_probes=sort_probes,
                )
            else:
                u_g, e_g = _dist_wedge_bucket(
                    sl, ml, plan.ehash, mesh, plan.id_bits, rc, pairs,
                    sort_probes=sort_probes,
                )
            u_np = np.asarray(u_g).reshape(num_devices, s1 - s0)
            for d in range(num_devices):
                u_full[d * r_dev + s0 : d * r_dev + s1] += u_np[d]
            e_parts.append(e_g)
        e_creds.append(
            e_parts[0] if len(e_parts) == 1 else jnp.concatenate(e_parts, axis=2)
        )
        numerator_ranked[b.rows] += u_full[: b.r_real]

    if e_creds:
        pos, hip = _dist_head_bookkeeping(tuple(dev_slabs), mesh, n)
        head_cred = _dist_aggregate_heads(tuple(e_creds), pos, hip, mesh, n)
        numerator_ranked += np.asarray(head_cred).astype(np.int64)

    _patch_spilled(plan, numerator_ranked)
    return numerator_ranked


def lcc_oriented_dist(sg, cache_dir=None) -> np.ndarray:
    """Local clustering coefficients (float64 per ORIGINAL vertex id)
    over the ShardedGraph's mesh. The wedge plan is memoized on the
    underlying Graph, shared with the single-chip path; with `cache_dir`
    the oriented edge list persists across runs (same contract as
    lcc_oriented)."""
    graph = sg.graph
    plan = getattr(graph, "_wedge_plan", None)
    if plan is None:
        plan = prepare_wedge_plan(graph, cache_dir=cache_dir)
        graph._wedge_plan = plan
    num_ranked = lcc_oriented_dist_numerator(plan, sg.mesh)
    num = num_ranked[plan.rank].astype(np.float64)
    d = plan.deg_s.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, num / denom, 0.0)
