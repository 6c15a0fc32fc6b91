"""Distributed changed-set Bellman-Ford SSSP — the production multi-chip
path.

Distributes the single-chip adaptive kernel
(graphtpu/algorithms/sssp.py::_sssp_adaptive_kernel) INCLUDING its
round-4 tiered frontier ladder: rounds whose changed set fits a tier's
static (rows, edges) budget relax only those vertices' out-edges at the
SMALLEST fitting tier — each device compacts the changed rows it owns,
expands them through its LOCAL push-CSR shard, scatter-mins candidate
distances into an [n_pad] vector, and one pmin merges the per-device
candidates (monotone relaxations commute, so the merge order is
irrelevant). Heavier rounds run the sharded dense min.plus sweep
(segment-min over the pull partition + all_gather). The whole fixed
point is ONE jit dispatch.

The ladder matters for the same measured reason as single-chip
(ROADMAP round-4: 512^2 torus wavefronts of ~2k vertices ran 2.1x
faster at 1/8 the static budgets): per-round cost is set by the tier's
static shapes, so thin wavefronts must not pay the big tier's step.
Tier routing uses GLOBAL changed counts (each device's changed slice is
a subset, so a globally-fitting round fits every local compact/expand
by construction). Reference analogue: the fork ships its best kernel as
THE path (cdlp_kernel.cu:1239-1243), not a single-chip-only fork.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.ops.frontier import compact, expand
from graphtpu.ops.gather import table_gather
from graphtpu.parallel.adaptive_bfs import _local_csr
from graphtpu.parallel.mesh import ROWS_AXIS
from graphtpu.parallel.partition import put_sharded


def _build_prep(sg):
    """Per-device push CSR (with weights) + replicated out-degrees,
    cached on the ShardedGraph per weight dtype."""
    key = sg.wdtype.name
    cache = getattr(sg, "_sssp_adaptive_prep", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    g = sg.graph
    n, n_pad, r, d = g.n, sg.n_pad, sg.rows_per_dev, sg.num_devices
    s2 = NamedSharding(sg.mesh, P(ROWS_AXIS, None))
    rep = NamedSharding(sg.mesh, P())

    push_ip, push_deg, push_dst, push_w = _local_csr(
        g.indptr.astype(np.int64),
        [g.dst.astype(np.int32), g.w.astype(sg.wdtype)],
        n_pad, r, d,
    )
    out_deg = np.zeros(n_pad + 1, dtype=np.int32)
    out_deg[:n] = np.diff(g.indptr).astype(np.int32)

    prep = {
        "push": (
            put_sharded(push_ip, s2),
            put_sharded(push_deg, s2),
            put_sharded(push_dst, s2),
            put_sharded(push_w, s2),
        ),
        "gdeg_pad": put_sharded(out_deg, rep),
    }
    sg._sssp_adaptive_prep = (key, prep)
    return prep


@partial(
    jax.jit, static_argnames=("mesh", "rows_per_dev", "n", "tiers")
)
def _sssp_adaptive_dist_kernel(
    push, gdeg_pad, coo, source, mesh, rows_per_dev, n, tiers
):
    n_pad = gdeg_pad.shape[0] - 1
    r = rows_per_dev
    gdeg_n = gdeg_pad[:-1]
    dtype = coo[2].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    T = len(tiers)
    FULL = T

    def chosen(acnt, ae):
        c = jnp.int32(FULL)
        for i in range(T - 1, -1, -1):
            k_i, e_i = tiers[i]
            c = jnp.where((acnt <= k_i) & (ae <= e_i), jnp.int32(i), c)
        return c

    def make_active_sm(k_cap, e_cap):
        def active_block(pi, pdeg, pdst, pw, dist, changed):
            my = jax.lax.axis_index(ROWS_AXIS) * r
            ch_local = jax.lax.dynamic_slice(changed, (my,), (r,))
            ids_l, _ = compact(ch_local, k_cap)
            exp = expand(ids_l, pdeg[0], pi[0], pdst[0], e_cap)
            du = table_gather(
                dist, jnp.where(exp.valid, exp.row_ids + my, 0)
            )
            cand = du + table_gather(pw[0], exp.gpos)
            targets = jnp.where(exp.valid, exp.neigh, jnp.int32(n_pad))
            cand_vec = (
                jnp.full((n_pad,), inf, dtype)
                .at[targets]
                .min(jnp.where(exp.valid, cand, inf), mode="drop")
            )
            return jax.lax.pmin(cand_vec, ROWS_AXIS)

        return jax.shard_map(
            active_block,
            mesh=mesh,
            in_specs=(P(ROWS_AXIS, None),) * 4 + (P(), P()),
            out_specs=P(),
            check_vma=False,
        )

    def dense_block(src, dst_local, w, valid, dist):
        terms = table_gather(dist, src[0]) + w[0]
        terms = jnp.where(valid[0], terms, inf)
        y = jax.ops.segment_min(
            terms, dst_local[0], num_segments=r, indices_are_sorted=True
        )
        return jax.lax.all_gather(y, ROWS_AXIS, tiled=True)

    dense_sm = jax.shard_map(
        dense_block,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None),) * 4 + (P(),),
        out_specs=P(),
        check_vma=False,
    )

    def derive(changed):
        acnt = jnp.sum(changed, dtype=jnp.int32)
        ae = jnp.sum(jnp.where(changed, gdeg_n, 0), dtype=jnp.int32)
        return acnt, ae

    def make_tier_step(i, active_sm):
        def tier_step(s):
            dist, changed, _, _, it, counts = s
            cand = active_sm(*push, dist, changed)
            new = jnp.minimum(dist, cand)
            changed2 = new < dist
            acnt, ae = derive(changed2)
            return new, changed2, acnt, ae, it + 1, counts.at[i].add(1)

        return tier_step

    def full_step(s):
        dist, _, _, _, it, counts = s
        relaxed = dense_sm(*coo, dist)
        new = jnp.minimum(dist, relaxed)
        changed2 = new < dist
        acnt, ae = derive(changed2)
        return new, changed2, acnt, ae, it + 1, counts.at[FULL].add(1)

    # state: (dist, changed, acnt, ae, it, counts[T+1])
    def make_phase(i, step):
        def phase(state):
            def cond(s):
                _, _, acnt, ae, it, _ = s
                return (acnt > 0) & (chosen(acnt, ae) == i) & (it < n)

            return jax.lax.while_loop(cond, step, state)

        return phase

    tier_phases = [
        make_phase(i, make_tier_step(i, make_active_sm(k_i, e_i)))
        for i, (k_i, e_i) in enumerate(tiers)
    ]
    full_phase = make_phase(FULL, full_step)

    dist0 = jnp.full((n_pad,), inf, dtype).at[source].set(0.0)
    changed0 = jnp.zeros((n_pad,), bool).at[source].set(True)
    acnt0, ae0 = derive(changed0)
    state = (dist0, changed0, acnt0, ae0, jnp.int32(0),
             jnp.zeros((T + 1,), jnp.int32))

    def outer_cond(s):
        _, _, acnt, _, it, _ = s
        return (acnt > 0) & (it < n)

    def outer_body(s):
        for ph in tier_phases:
            s = ph(s)
        return full_phase(s)

    dist, _, _, _, it, counts = jax.lax.while_loop(
        outer_cond, outer_body, state
    )
    return dist, it, counts


def sssp_adaptive_dist(sg, source_dense: int, cfg=None, with_stats: bool = False):
    """Distributed tiered adaptive SSSP on a ShardedGraph. Returns
    (distances [n] np.float64 with inf unreachable, rounds). The tier
    ladder is the SAME `sssp_tiers` config contract as the single-chip
    path (sssp-frontier-rows/edges + sssp-tiers)."""
    from graphtpu.algorithms.sssp import sssp_tiers

    prep = _build_prep(sg)
    coo = sg.pull()
    k_cap = int(getattr(cfg, "sssp_frontier_rows", 0) or 1 << 16)
    e_cap = int(getattr(cfg, "sssp_frontier_edges", 0) or 1 << 18)
    tiers = sssp_tiers(k_cap, e_cap, cfg)
    dist, it, counts = _sssp_adaptive_dist_kernel(
        prep["push"],
        prep["gdeg_pad"],
        (coo.src, coo.dst_local, coo.w, coo.valid),
        jnp.int32(source_dense),
        sg.mesh,
        sg.rows_per_dev,
        sg.n,
        tiers,
    )
    out = np.asarray(dist, dtype=np.float64)[: sg.n]
    if with_stats:
        it, c = jax.device_get((it, counts))
        stats = {
            "full_steps": int(c[-1]),
            "active_steps": int(it) - int(c[-1]),
            "tier_steps": {int(e): int(c[i]) for i, (_, e) in enumerate(tiers)},
            "tiers": [(int(k), int(e)) for k, e in tiers],
        }
        return out, int(it), stats
    return out, int(it)
