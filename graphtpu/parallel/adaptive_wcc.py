"""Distributed convergence-adaptive WCC — the production multi-chip path.

Distributes the single-chip adaptive WCC
(graphtpu/algorithms/wcc.py::_wcc_adaptive_kernel): rounds whose
changed-label set fits the static capacities propagate minima only along
those vertices' edges — each device compacts the changed rows it owns,
expands them through its LOCAL symmetrized push-CSR shard, scatter-mins
candidate labels into an [n_pad] vector, and one pmin merges the
per-device candidates. Heavy rounds run the sharded dense segment-min
sweep plus two pointer-jumping hops on the replicated vector. Active
steps do PURE min-propagation (no jumps) for the same reason as the
single-chip kernel: without jumps a label can only change through an
edge, so `new < labels` after the step is the complete next changed set.
The fixed point (min label per component) is identical either way.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.core.types import INT32_INF
from graphtpu.ops.frontier import compact, expand
from graphtpu.ops.gather import table_gather
from graphtpu.parallel.adaptive_bfs import _local_csr
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import put_sharded


def _build_prep(sg):
    """Per-device symmetrized push CSR + replicated degrees, cached on
    the ShardedGraph."""
    prep = getattr(sg, "_wcc_adaptive_prep", None)
    if prep is not None:
        return prep
    g = sg.graph
    sym = g.symmetrized()
    n, n_pad, r, d = g.n, sg.n_pad, sg.rows_per_dev, sg.num_devices
    s2 = NamedSharding(sg.mesh, P(ROWS_AXIS, None))
    rep = NamedSharding(sg.mesh, P())

    push_ip, push_deg, push_dst = _local_csr(
        sym.indptr.astype(np.int64), [sym.dst.astype(np.int32)], n_pad, r, d
    )
    sdeg = np.zeros(n_pad + 1, dtype=np.int32)
    sdeg[:n] = np.diff(sym.indptr).astype(np.int32)

    prep = {
        "push": (put_sharded(push_ip, s2), put_sharded(push_deg, s2), put_sharded(push_dst, s2)),
        "sdeg_pad": put_sharded(sdeg, rep),
    }
    sg._wcc_adaptive_prep = prep
    return prep


@partial(
    jax.jit, static_argnames=("mesh", "rows_per_dev", "n", "k_cap", "e_cap")
)
def _wcc_adaptive_dist_kernel(
    push, sdeg_pad, coo, mesh, rows_per_dev, n, k_cap, e_cap
):
    n_pad = sdeg_pad.shape[0] - 1
    r = rows_per_dev
    sdeg_n = sdeg_pad[:-1]

    def active_block(pi, pdeg, pdst, labels, changed):
        my = jax.lax.axis_index(ROWS_AXIS) * r
        ch_local = jax.lax.dynamic_slice(changed, (my,), (r,))
        ids_l, _ = compact(ch_local, k_cap)
        exp = expand(ids_l, pdeg[0], pi[0], pdst[0], e_cap)
        lab_u = table_gather(labels, jnp.where(exp.valid, exp.row_ids + my, 0))
        targets = jnp.where(exp.valid, exp.neigh, jnp.int32(n_pad))
        cand_vec = (
            jnp.full((n_pad,), INT32_INF, jnp.int32)
            .at[targets]
            .min(jnp.where(exp.valid, lab_u, INT32_INF), mode="drop")
        )
        return jax.lax.pmin(cand_vec, ROWS_AXIS)

    active_sm = jax.shard_map(
        active_block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 3 + (P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def dense_block(src, dst_local, w, valid, labels):
        lab = jnp.where(valid[0], table_gather(labels, src[0]), INT32_INF)
        y = jax.ops.segment_min(
            lab, dst_local[0], num_segments=r, indices_are_sorted=True
        )
        return jax.lax.all_gather(y, ROWS_AXIS, tiled=True)

    dense_sm = jax.shard_map(
        dense_block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 4 + (P(),),
        out_specs=P(),
        check_vma=False,
    )

    def dense_block0(src, dst_local, w, valid):
        # iteration 0 is gather-free: identity labels make the
        # label-at-source gather the src ids themselves (the single-chip
        # iter0_step, algorithms/wcc.py, sharded)
        lab = jnp.where(valid[0], src[0], INT32_INF)
        y = jax.ops.segment_min(
            lab, dst_local[0], num_segments=r, indices_are_sorted=True
        )
        return jax.lax.all_gather(y, ROWS_AXIS, tiled=True)

    dense0_sm = jax.shard_map(
        dense_block0,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 4,
        out_specs=P(),
        check_vma=False,
    )

    def derive(changed):
        cnt = jnp.sum(changed, dtype=jnp.int32)
        ce = jnp.sum(jnp.where(changed, sdeg_n, 0), dtype=jnp.int32)
        return (cnt <= k_cap) & (ce <= e_cap), cnt > 0

    def active_step(labels, changed):
        cand = active_sm(*push, labels, changed)
        new = jnp.minimum(labels, cand)
        changed2 = new < labels
        ok, nonempty = derive(changed2)
        return new, changed2, ok, nonempty

    def full_step(labels):
        neigh_min = dense_sm(*coo, labels)
        new = jnp.minimum(labels, neigh_min)
        # pointer jumping on the replicated vector: chains compress fast
        new = jnp.minimum(new, table_gather(new, new))
        new = jnp.minimum(new, table_gather(new, new))
        changed2 = new < labels
        ok, nonempty = derive(changed2)
        return new, changed2, ok, nonempty

    # state: (labels, changed, ok, nonempty, it)
    def active_phase(state):
        def cond(s):
            _, _, ok, nonempty, it = s
            return nonempty & ok & (it < n)

        def body(s):
            labels, changed, _, _, it = s
            labels, changed, ok, nonempty = active_step(labels, changed)
            return labels, changed, ok, nonempty, it + 1

        return jax.lax.while_loop(cond, body, state)

    def full_phase(state):
        def cond(s):
            _, _, ok, nonempty, it = s
            return nonempty & (~ok) & (it < n)

        def body(s):
            labels, _, _, _, it = s
            labels, changed, ok, nonempty = full_step(labels)
            return labels, changed, ok, nonempty, it + 1

        return jax.lax.while_loop(cond, body, state)

    # padding rows keep their (unique, > any real label) identity labels
    labels0 = jnp.arange(n_pad, dtype=jnp.int32)
    neigh0 = dense0_sm(*coo)
    li = jnp.minimum(labels0, neigh0)
    li = jnp.minimum(li, table_gather(li, li))
    li = jnp.minimum(li, table_gather(li, li))
    changed0 = li < labels0
    ok0, nonempty0 = derive(changed0)
    state = (li, changed0, ok0, nonempty0, jnp.int32(1))

    def outer_cond(s):
        _, _, _, nonempty, it = s
        return nonempty & (it < n)

    def outer_body(s):
        return full_phase(active_phase(s))

    labels, _, _, _, it = jax.lax.while_loop(outer_cond, outer_body, state)
    return labels, it


def wcc_adaptive_dist(sg, cfg=None):
    """Distributed adaptive WCC on a ShardedGraph. Returns (labels [n]
    np.int32 — min vertex id per component, rounds)."""
    prep = _build_prep(sg)
    coo = sg.pull_symmetrized()
    k_cap = int(getattr(cfg, "wcc_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "wcc_frontier_edges", 0) or 1 << 18)
    labels, it = _wcc_adaptive_dist_kernel(
        prep["push"],
        prep["sdeg_pad"],
        (coo.src, coo.dst_local, coo.w, coo.valid),
        sg.mesh,
        sg.rows_per_dev,
        sg.n,
        k_cap,
        e_cap,
    )
    return np.asarray(labels)[: sg.n], int(it)
