"""Distributed convergence-adaptive WCC — the production multi-chip path.

Distributes the single-chip adaptive WCC including its round-4
SLAB-ADAPTIVE default (graphtpu/algorithms/wcc.py::
_wcc_slab_adaptive_kernel, measured 1.64x over the edge-stream full
steps): heavy rounds run the degree-bucketed slab min (each device owns
1/D of every bucket via the shared DistSlabPlan machinery of
parallel/slab_cdlp.py, so power-law skew balances by construction — one
per-bucket gather + axis-min, one tiled all_gather, one static inverse
permutation) plus two pointer-jumping hops on the replicated vector;
iteration 0 is gather-free (identity labels make the gathered slab the
slab's own stored ids). Rounds whose changed-label set fits the static
capacities propagate minima only along those vertices' edges — each
device compacts the changed rows it owns, expands them through its
LOCAL symmetrized push-CSR shard, scatter-mins candidate labels into an
[n_pad] vector, and one pmin merges the per-device candidates. Active
steps do PURE min-propagation (no jumps) for the same reason as the
single-chip kernel: without jumps a label can only change through an
edge, so `new < labels` after the step is the complete next changed set.
The fixed point (min label per component) is identical either way.
`wcc-impl=adaptive` keeps the edge-stream full steps as the fallback
arm. Reference analogue: the fork ships its best kernel as THE path
(cdlp_kernel.cu:1239-1243), not a single-chip-only fork.
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


def _make_slab_min_step(mesh, num_buckets: int, with_heavy: bool, first: bool):
    """Per-device slab MIN over the label vector — a thin wrapper over
    slab_cdlp._make_step(reduce="min"), the ONE shard_map'd slab-step
    builder shared by distributed CDLP, PR, and WCC (same bucket
    layout, heavy-tuple shape, and gathered-concat ordering that
    DistSlabPlan.inv_perm depends on). `first=True` is the gather-free
    iteration 0 (identity labels make the gathered value the stored id
    itself — the single-chip iter0_step of _wcc_slab_adaptive_kernel,
    sharded; same branch as CDLP's duplicate-free iter0)."""
    from graphtpu.parallel.slab_cdlp import _make_step

    return _make_step(
        mesh, num_buckets, with_heavy,
        first="min" if first else False, reduce="min",
    )


@partial(
    jax.jit, static_argnames=("mesh", "rows_per_dev", "n", "k_cap", "e_cap")
)
def _wcc_slab_adaptive_dist_kernel(
    plan, push, sdeg_pad, mesh, rows_per_dev, n, k_cap, e_cap
):
    """Adaptive WCC with distributed SLAB full steps. Identical phase
    machinery to _wcc_adaptive_dist_kernel; only the full step's
    neighbor-min formulation differs (bucket-split slab plan instead of
    the edge-stream segment-min)."""
    n_pad = sdeg_pad.shape[0] - 1
    r = rows_per_dev
    sdeg_n = sdeg_pad[:-1]
    heavy = plan.heavy if plan.heavy is not None else ()
    nb = len(plan.bucket_slabs)
    step_full = _make_slab_min_step(mesh, nb, bool(heavy), first=False)
    step0 = _make_slab_min_step(mesh, nb, bool(heavy), first=True)
    pad_inf = jnp.full((n_pad - n,), INT32_INF, jnp.int32)

    def neigh_min_of(gathered):
        nm = jnp.where(
            plan.has_neighbors,
            table_gather(gathered, plan.inv_perm),
            INT32_INF,
        )
        return jnp.concatenate([nm, pad_inf]) if n_pad > n else nm

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

    def derive(changed):
        cnt = jnp.sum(changed, dtype=jnp.int32)
        ce = jnp.sum(jnp.where(changed, sdeg_n, 0), dtype=jnp.int32)
        return (cnt <= k_cap) & (ce <= e_cap), cnt > 0

    def finish(labels, neigh_min):
        new = jnp.minimum(labels, neigh_min)
        new = jnp.minimum(new, table_gather(new, new))
        new = jnp.minimum(new, table_gather(new, new))
        changed2 = new < labels
        ok, nonempty = derive(changed2)
        return new, changed2, ok, nonempty

    def active_step(labels, changed):
        cand = active_sm(*push, labels, changed)
        new = jnp.minimum(labels, cand)
        changed2 = new < labels
        ok, nonempty = derive(changed2)
        return new, changed2, ok, nonempty

    def full_step(labels):
        return finish(
            labels, neigh_min_of(step_full(plan.bucket_slabs, heavy, labels))
        )

    # state: (labels, changed, ok, nonempty, it, nf)
    def active_phase(state):
        def cond(s):
            _, _, ok, nonempty, it, _ = s
            return nonempty & ok & (it < n)

        def body(s):
            labels, changed, _, _, it, nf = s
            labels, changed, ok, nonempty = active_step(labels, changed)
            return labels, changed, ok, nonempty, it + 1, nf

        return jax.lax.while_loop(cond, body, state)

    def full_phase(state):
        def cond(s):
            _, _, ok, nonempty, it, _ = s
            return nonempty & (~ok) & (it < n)

        def body(s):
            labels, _, _, _, it, nf = s
            labels, changed, ok, nonempty = full_step(labels)
            return labels, changed, ok, nonempty, it + 1, nf + 1

        return jax.lax.while_loop(cond, body, state)

    labels0 = jnp.arange(n_pad, dtype=jnp.int32)
    li, changed0, ok0, nonempty0 = finish(
        labels0, neigh_min_of(step0(plan.bucket_slabs, heavy, labels0))
    )
    state = (li, changed0, ok0, nonempty0, jnp.int32(1), jnp.int32(1))

    def outer_cond(s):
        _, _, _, nonempty, it, _ = s
        return nonempty & (it < n)

    def outer_body(s):
        return full_phase(active_phase(s))

    labels, _, _, _, it, nf = jax.lax.while_loop(
        outer_cond, outer_body, state
    )
    return labels, it, nf


def _build_slab_plan(sg):
    """Bucket-split slab plan over the symmetrized pull stream, cached on
    the ShardedGraph (checkpointed under the same contract as the CDLP
    incidence and PR pull plans, via checkpoint.cached_plan)."""
    from graphtpu.parallel.checkpoint import cached_plan
    from graphtpu.parallel.slab_cdlp import build_dist_slab_plan_from

    def build():
        src, dst, _ = sg.graph.symmetrized().pull_arrays()
        return build_dist_slab_plan_from(
            dst.astype(np.int64), src.astype(np.int32), sg.n, sg.mesh, None
        )

    return cached_plan(sg, "_dist_wcc_slab_plan", "wcc-slab", build)


def wcc_adaptive_dist(sg, cfg=None, with_stats: bool = False):
    """Distributed adaptive WCC on a ShardedGraph. Returns (labels [n]
    np.int32 — min vertex id per component, rounds). `wcc-impl`
    auto/slab selects the slab-plan full steps (the single-chip
    measured winner); `adaptive` keeps the edge-stream full steps."""
    prep = _build_prep(sg)
    k_cap = int(getattr(cfg, "wcc_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "wcc_frontier_edges", 0) or 1 << 18)
    impl = getattr(cfg, "wcc_impl", "auto") or "auto"
    if impl in ("auto", "slab"):
        plan = _build_slab_plan(sg)
        if not plan.bucket_slabs and plan.heavy is None:
            # edgeless graph: every vertex is its own component
            out = np.arange(sg.n, dtype=np.int32)
            if with_stats:
                return out, 0, {"impl": "slab", "full_steps": 0,
                                "active_steps": 0, "e_cap": e_cap,
                                "k_cap": k_cap}
            return out, 0
        labels, it, nf = _wcc_slab_adaptive_dist_kernel(
            plan,
            prep["push"],
            prep["sdeg_pad"],
            sg.mesh,
            sg.rows_per_dev,
            sg.n,
            k_cap,
            e_cap,
        )
    else:
        coo = sg.pull_symmetrized()
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
        nf = None
    out = np.asarray(labels)[: sg.n]
    if with_stats:
        it = int(it)
        nf = int(nf) if nf is not None else None
        stats = {
            "impl": "slab" if impl in ("auto", "slab") else "adaptive",
            "full_steps": nf,
            "active_steps": (it - nf) if nf is not None else None,
            "e_cap": e_cap,
            "k_cap": k_cap,
        }
        return out, it, stats
    return out, int(it)
