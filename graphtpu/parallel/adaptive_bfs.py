"""Distributed direction-optimizing BFS — the production multi-chip path.

The first multi-chip BFS (parallel/algorithms.bfs_dist_kernel) runs a
dense full-edge pull step every level. This module distributes the
single-chip three-phase adaptive kernel (graphtpu/algorithms/bfs.py, the
TPU counterpart of LAGr_BreadthFirstSearch's push/pull switching,
bfs.cpp:76-80) instead:

* push — small frontiers: each device compacts the frontier rows it
  owns, expands them through its LOCAL push-CSR shard with the frontier
  engine, scatters claims into an [n_pad] mask, and one psum merges the
  claims (any device's sources can reach any destination);
* truncated bottom-up — heavy levels: each device probes only the first
  `t_trunc` in-neighbors of its unvisited rows against the replicated
  frontier mask, rechecks the rows the probe missed through its local
  pull-CSR shard, and the per-device level slices are re-replicated by
  one tiled all_gather; a psum-reduced all-devices-fit flag aborts the
  level globally when any device's residual overflows;
* dense pull fallback — the sharded full-edge segment-max step.

Levels stay replicated; all static shapes; the whole traversal is ONE
jit dispatch (per-level host round-trips are fatal through the TPU
relay). Phase loops are sequential nested while_loops — a lax.cond in a
loop body schedules both branches per iteration on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.core.types import INT32_INF
from graphtpu.ops.frontier import compact, expand, frontier_deg_sum
from graphtpu.ops.gather import table_gather
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import put_sharded

from graphtpu.algorithms.bfs import BFS_TRUNC  # shared probe-depth default (t=2)

from graphtpu.parallel.partition import (  # noqa: E402
    EDGE_ALIGN as _EDGE_ALIGN,
    _round_up,
)


def _local_csr(indptr: np.ndarray, streams, n_pad: int, r: int, d: int):
    """Per-device local CSR slices for rows [k*r, (k+1)*r) of a global
    CSR padded to n_pad rows: ((R+1) indptr, (R+1) deg, one padded
    [D, M] block per edge stream in `streams`)."""
    ip = np.zeros(n_pad + 1, dtype=np.int64)
    ip[: indptr.shape[0]] = indptr
    ip[indptr.shape[0] :] = indptr[-1]
    deg = np.diff(ip)
    m_dev = max(
        _round_up(int(max(ip[(k + 1) * r] - ip[k * r] for k in range(d))), _EDGE_ALIGN),
        _EDGE_ALIGN,
    )
    l_ip = np.zeros((d, r + 1), dtype=np.int32)
    l_deg = np.zeros((d, r + 1), dtype=np.int32)
    l_streams = [np.zeros((d, m_dev), dtype=s.dtype) for s in streams]
    for k in range(d):
        lo, hi = k * r, (k + 1) * r
        l_ip[k] = (ip[lo : hi + 1] - ip[lo]).astype(np.int32)
        l_deg[k, :r] = deg[lo:hi].astype(np.int32)
        for s, out in zip(streams, l_streams):
            seg = s[ip[lo] : ip[hi]]
            out[k, : seg.shape[0]] = seg
    return (l_ip, l_deg, *l_streams)


def _build_prep(sg, t_trunc: int = BFS_TRUNC):
    """Device-resident per-shard arrays for the adaptive kernel, cached
    on the ShardedGraph per probe depth."""
    cached = getattr(sg, "_bfs_adaptive_prep", None)
    if cached is not None and cached[0] == t_trunc:
        return cached[1]
    g = sg.graph
    n, n_pad, r, d = g.n, sg.n_pad, sg.rows_per_dev, sg.num_devices
    mesh = sg.mesh
    s2 = NamedSharding(mesh, P(ROWS_AXIS, None))
    rep = NamedSharding(mesh, P())

    push_ip, push_deg, push_dst = _local_csr(
        g.indptr.astype(np.int64), [g.dst.astype(np.int32)], n_pad, r, d
    )
    pull_ip, pull_deg, pull_src = _local_csr(
        g.pull_indptr.astype(np.int64), [g.pull_arrays()[0].astype(np.int32)], n_pad, r, d
    )

    # truncated bottom-up probe table per device, [D, T*R]:
    # trunc[k, t*R + row] = row's t-th smallest-id in-neighbor (global),
    # sentinel n_pad past the row's degree (frontier mask padded at n_pad)
    psrc = g.pull_arrays()[0]
    pdeg = np.diff(g.pull_indptr).astype(np.int64)
    offs = np.arange(t_trunc, dtype=np.int64)
    pos = g.pull_indptr[:-1, None] + offs[None, :]
    valid = offs[None, :] < pdeg[:, None]
    trunc = np.full((n_pad, t_trunc), n_pad, dtype=np.int32)
    trunc[:n][valid] = psrc[np.minimum(pos, max(len(psrc) - 1, 0))[valid]]
    # [n_pad, T] -> per device [T, R] flattened
    trunc_d = np.ascontiguousarray(
        trunc.reshape(d, r, t_trunc).transpose(0, 2, 1).reshape(d, t_trunc * r)
    )

    out_deg = np.zeros(n_pad + 1, dtype=np.int32)
    out_deg[:n] = np.diff(g.indptr).astype(np.int32)

    prep = {
        "push": (put_sharded(push_ip, s2), put_sharded(push_deg, s2), put_sharded(push_dst, s2)),
        "pull": (put_sharded(pull_ip, s2), put_sharded(pull_deg, s2), put_sharded(pull_src, s2)),
        "trunc": put_sharded(trunc_d, s2),
        "gdeg_pad": put_sharded(out_deg, rep),
    }
    sg._bfs_adaptive_prep = (t_trunc, prep)
    return prep


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_per_dev", "n", "t_trunc", "tiers", "k_bu", "e_bu"
    ),
)
def _bfs_adaptive_dist_kernel(
    push, pull, trunc, gdeg_pad, coo, source,
    mesh, rows_per_dev, n, t_trunc, tiers, k_bu, e_bu,
):
    n_pad = gdeg_pad.shape[0] - 1
    r = rows_per_dev
    gdeg_n = gdeg_pad[:-1]

    # ---- collective steps --------------------------------------------------

    def make_push_block(k_cap, e_cap):
        def push_block(pi, pdeg, pdst, levels, level):
            my = jax.lax.axis_index(ROWS_AXIS) * r
            lv_local = jax.lax.dynamic_slice(levels, (my,), (r,))
            ids_l, _ = compact(lv_local == level, k_cap)
            exp = expand(ids_l, pdeg[0], pi[0], pdst[0], e_cap,
                         with_row_ids=False)
            unvis = table_gather(levels, exp.neigh) == INT32_INF
            idx = jnp.where(exp.valid & unvis, exp.neigh, jnp.int32(n_pad))
            claims = (
                jnp.zeros((n_pad,), jnp.int32).at[idx].set(1, mode="drop")
            )
            return jax.lax.psum(claims, ROWS_AXIS)

        return jax.shard_map(
            push_block,
            mesh=mesh,
            in_specs=((P(ROWS_AXIS, None),) * 3 + (P(), P())),
            out_specs=P(),
            check_vma=False,
        )

    # one shard_mapped push step per ladder tier — claims apply through a
    # dense mask, so tier steps never abort on output size; tiers only
    # bound the per-device expansion cost (round-3 single-chip design)
    push_sms = [make_push_block(k, e) for (k, e) in tiers]

    def bu_block(tr, qi, qdeg, qsrc, levels, level):
        my = jax.lax.axis_index(ROWS_AXIS) * r
        fmask_pad = jnp.concatenate(
            [(levels == level).astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        hit = jnp.max(table_gather(fmask_pad, tr[0]).reshape(t_trunc, r), axis=0)
        lv_local = jax.lax.dynamic_slice(levels, (my,), (r,))
        unvis = lv_local == INT32_INF
        qdeg_l = qdeg[0]
        claim_trunc = unvis & (hit == 1)
        resid = unvis & (qdeg_l[:r] > t_trunc) & (hit == 0)
        rids, rcnt = compact(resid, k_bu)
        fe_r = frontier_deg_sum(rids, qdeg_l)
        ok_l = (rcnt <= k_bu) & (fe_r <= e_bu)
        # global abort: the level applies only if EVERY device fits
        ok = jax.lax.psum(ok_l.astype(jnp.int32), ROWS_AXIS) == mesh.devices.size
        exp = expand(rids, qdeg_l, qi[0], qsrc[0], e_bu,
                     with_row_ids=False)
        rhit = (
            exp.valid & (table_gather(fmask_pad, exp.neigh) == 1)
        ).astype(jnp.int32)
        cs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(rhit, dtype=jnp.int32)]
        )
        seg_hits = table_gather(cs, exp.seg_starts[1:]) - table_gather(
            cs, exp.seg_starts[:-1]
        )
        claimed = jnp.where(seg_hits > 0, rids, jnp.int32(r))
        updated = jnp.where(claim_trunc, level + 1, lv_local)
        updated = updated.at[claimed].set(level + 1, mode="drop")
        new_local = jnp.where(ok, updated, lv_local)
        return jax.lax.all_gather(new_local, ROWS_AXIS, tiled=True), ok

    bu_step_sm = jax.shard_map(
        bu_block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 4 + (P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def dense_block(src, dst_local, w, valid, levels, level):
        fmask = (levels == level).astype(jnp.int32)
        active = jnp.where(valid[0], table_gather(fmask, src[0]), 0)
        reached = jax.ops.segment_max(
            active, dst_local[0], num_segments=r, indices_are_sorted=True
        )
        return jax.lax.all_gather(reached, ROWS_AXIS, tiled=True)

    dense_step_sm = jax.shard_map(
        dense_block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 4 + (P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    # ---- replicated helpers ------------------------------------------------

    T = len(tiers)
    BU, DENSE = T, T + 1

    def first_fit(cnt, fe):
        ff = jnp.int32(BU)
        for i in range(T - 1, -1, -1):
            k_i, e_i = tiers[i]
            ff = jnp.where((cnt <= k_i) & (fe <= e_i), jnp.int32(i), ff)
        return ff

    def status(levels, level):
        fmask = levels == level
        cnt = jnp.sum(fmask, dtype=jnp.int32)
        fe = jnp.sum(jnp.where(fmask, gdeg_n, 0), dtype=jnp.int32)
        return cnt, fe

    # ---- phase steps: state (levels, cnt, fe, min_tier, level) -------------

    def make_push_step(i):
        sm = push_sms[i]

        def push_step(s):
            levels, _, _, _, level = s
            claims = sm(*push, levels, level)
            # psum SUMS per-device claim masks — a vertex reached from
            # sources on several devices carries a count > 1
            levels = jnp.where(
                (claims >= 1) & (levels == INT32_INF), level + 1, levels
            )
            ncnt, nfe = status(levels, level + 1)
            return levels, ncnt, nfe, jnp.int32(0), level + 1

        return push_step

    def bu_step(s):
        levels, cnt, fe, _, level = s
        new_levels, ok = bu_step_sm(trunc, *pull, levels, level)
        levels = jnp.where(ok, new_levels, levels)
        ncnt, nfe = status(levels, level + 1)
        return (
            levels,
            jnp.where(ok, ncnt, cnt),
            jnp.where(ok, nfe, fe),
            jnp.where(ok, jnp.int32(0), jnp.int32(DENSE)),
            level + jnp.where(ok, 1, 0),
        )

    def dense_step(s):
        levels, _, _, _, level = s
        reached = dense_step_sm(*coo, levels, level)
        levels = jnp.where(
            (reached == 1) & (levels == INT32_INF), level + 1, levels
        )
        ncnt, nfe = status(levels, level + 1)
        return levels, ncnt, nfe, jnp.int32(0), level + 1

    def chosen(s):
        _, cnt, fe, min_tier, _ = s
        return jnp.maximum(first_fit(cnt, fe), min_tier)

    def make_phase(idx, step):
        def phase(state):
            def cond(s):
                return (s[1] > 0) & (chosen(s) == idx) & (s[4] < n)

            return jax.lax.while_loop(cond, step, state)

        return phase

    phases = [make_phase(i, make_push_step(i)) for i in range(T)]
    phases.append(make_phase(BU, bu_step))
    phases.append(make_phase(DENSE, dense_step))

    levels0 = jnp.full((n_pad,), INT32_INF, dtype=jnp.int32).at[source].set(0)
    cnt0, fe0 = status(levels0, 0)
    state = (levels0, cnt0, fe0, jnp.int32(0), jnp.int32(0))

    def outer_cond(s):
        return (s[1] > 0) & (s[4] < n)

    def outer_body(s):
        for ph in phases:
            s = ph(s)
        return s

    state = jax.lax.while_loop(outer_cond, outer_body, state)
    return state[0], state[4]


def bfs_adaptive_dist(sg, source_dense: int, cfg=None):
    """Distributed adaptive BFS on a ShardedGraph. Returns (levels [n]
    np.int32 with INT32_INF unreachable, iterations)."""
    t_trunc = int(getattr(cfg, "bfs_trunc", 0) or BFS_TRUNC)
    prep = _build_prep(sg, t_trunc)
    coo = sg.pull()
    # per-DEVICE expansion budgets — smaller than the single-chip ladder
    # because each device expands only its own row shard
    tiers_cfg = getattr(cfg, "bfs_push_tiers", "") or ""
    if tiers_cfg:
        edge_tiers = sorted({int(t) for t in str(tiers_cfg).split(",") if t})
    else:
        e_cap = int(getattr(cfg, "bfs_frontier_edges", 0) or 1 << 18)
        edge_tiers = [t for t in (1 << 14, 1 << 16) if t < e_cap] + [e_cap]
    k_cap = int(getattr(cfg, "bfs_frontier_rows", 0) or 1 << 16)
    tiers = tuple((min(k_cap, e, sg.rows_per_dev), e) for e in edge_tiers)
    k_bu = int(getattr(cfg, "bfs_bu_rows", 0) or 1 << 15)
    e_bu = int(getattr(cfg, "bfs_bu_edges", 0) or 1 << 18)
    levels, it = _bfs_adaptive_dist_kernel(
        prep["push"],
        prep["pull"],
        prep["trunc"],
        prep["gdeg_pad"],
        (coo.src, coo.dst_local, coo.w, coo.valid),
        jnp.int32(source_dense),
        sg.mesh,
        sg.rows_per_dev,
        sg.n,
        t_trunc,
        tiers,
        k_bu,
        e_bu,
    )
    return np.asarray(levels)[: sg.n], int(it)
