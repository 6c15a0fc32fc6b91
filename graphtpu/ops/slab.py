"""Degree-bucketed padded-ELL ("slab") graph layout — shared kernel infra.

The TPU answer to degree skew (the problem the CUDA fork attacked with
dynamic parallelism and warp-cooperative kernels, cdlp_kernel.cu:611-677,
1031-1140): bucket rows by degree, pad each bucket to a static width, and
run dense vectorized per-row reductions. Rows heavier than the largest
bucket are handled by a sorted-segment fallback over just their edges
(few rows in power-law graphs).

Used by graphtpu/ops/minmode.py (CDLP) and graphtpu/ops/spmv.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# x2-spaced buckets bound slab padding at 2x (measured 1.52x on RMAT
# s20/ef32); gathers dominate kernel cost on TPU, so tight padding
# matters more than kernel count (each bucket compiles one fused dense
# block). This static ladder is the fallback; plan builders default to
# per-graph DP-optimal boundaries (optimal_bucket_bounds, 1.12x padded
# on the same graph at the same bucket count) unless explicit buckets
# are given.
DEFAULT_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def optimal_bucket_bounds(
    deg: np.ndarray, k: int = 10, kind: str = "elements",
    lo: int = 0, cap: Optional[int] = None,
) -> list:
    """DP-optimal bucket upper bounds for THIS degree distribution:
    choose ≤ k boundaries minimizing total padded cost, where a row in a
    width-W bucket costs W (kind="elements" — linear, slab gathers) or
    W(W-1)/2 (kind="pairs" — quadratic, LCC wedge pair lists). Only
    degrees in (lo, cap] participate; rows above `cap` are the caller's
    heavy tail. Boundaries land on degrees actually present, so
    distributions with ≤ k distinct degrees get exact (zero-padding)
    buckets. Cost: the boundary candidates are the ≤ cap distinct
    degrees (≤ 4096), so the vectorized DP is O(k·E²) ≲ 10·4096² numpy
    ops — negligible against the host plan build it serves.

    Measured vs the static ladders at RMAT s20/ef32: padded slab
    elements 73.4M → 66.3M (−10%, k=10) for the CDLP incidence plan;
    padded LCC pair probes 6.28G → 4.75G (−24%, k=16)."""
    deg = np.asarray(deg)
    mask = deg > lo
    if cap is not None:
        mask &= deg <= cap
    d = deg[mask]
    if d.size == 0:
        return []
    hist = np.bincount(d)
    ends = np.nonzero(hist)[0].astype(np.int64)   # distinct degrees, > lo
    if ends.size <= k:
        return ends.tolist()
    csum = np.cumsum(hist)                        # rows with degree <= d
    if kind == "pairs":
        w = (ends * (ends - 1) // 2).astype(np.float64)
    else:
        w = ends.astype(np.float64)
    s = csum[ends].astype(np.float64)             # rows covered through ends[j]
    e = ends.size
    jlt = np.tril(np.ones((e, e), bool), k=-1)    # j < i
    prev_dp = w * s                               # one bucket covering all of (lo, e_i]
    parents = []
    for _ in range(2, k + 1):
        a = prev_dp[None, :] - s[None, :] * w[:, None]      # [i, j]
        a = np.where(jlt, a, np.inf)
        j_best = np.argmin(a, axis=1)
        cut = a[np.arange(e), j_best] + s * w
        dp = np.minimum(prev_dp, cut)
        parents.append(np.where(cut < prev_dp, j_best, -1))
        prev_dp = dp
    bounds = []
    i = e - 1
    kk = len(parents) - 1
    while True:
        if kk < 0:
            bounds.append(int(ends[i]))
            break
        p = int(parents[kk][i])
        if p < 0:
            kk -= 1                               # skip: fewer buckets suffice
            continue
        bounds.append(int(ends[i]))
        i = p
        kk -= 1
    return sorted(bounds)


def bucket_policy_key(buckets) -> list:
    """Stable, JSON-serializable identity of a bucket choice for plan
    memo/checkpoint keys: explicit bounds verbatim, else the auto policy
    TOGETHER WITH the env knobs that steer it — so flipping
    GRAPHTPU_SLAB_BUCKETS/GRAPHTPU_SLAB_BUCKET_K between runs (the A/B
    these knobs exist for) invalidates cached plans instead of silently
    reusing the other arm's plan."""
    import os as _os

    if buckets is not None:
        return ["explicit", [int(b) for b in buckets]]
    return [
        "auto",
        _os.environ.get("GRAPHTPU_SLAB_BUCKETS", ""),
        int(_os.environ.get("GRAPHTPU_SLAB_BUCKET_K", "10")),
    ]


def resolve_buckets(deg: np.ndarray, buckets=None, lo: int = 0):
    """Bucket bounds for a slab plan: explicit `buckets` are honored
    verbatim; None means per-graph DP-optimal bounds (same heavy-tail
    cutoff as the static ladder). `GRAPHTPU_SLAB_BUCKETS=static`
    restores the ladder; `GRAPHTPU_SLAB_BUCKET_K` sets the budget."""
    import os as _os

    if buckets is not None:
        return tuple(buckets)
    if _os.environ.get("GRAPHTPU_SLAB_BUCKETS", "") == "static":
        return DEFAULT_BUCKETS
    k = int(_os.environ.get("GRAPHTPU_SLAB_BUCKET_K", "10"))
    bounds = optimal_bucket_bounds(
        deg, k=k, kind="elements", lo=lo, cap=DEFAULT_BUCKETS[-1]
    )
    # empty distribution: keep the ladder so heavy-tail cutoff stays put
    return tuple(bounds) if bounds else DEFAULT_BUCKETS


class SlabBucket(NamedTuple):
    """Slabs are stored TRANSPOSED, [W, R]: the (many) rows live on the
    minor/lane axis so per-row sorts, scans, and reductions run along
    sublanes fully vectorized across lanes. A [R, W] layout with W < 128
    wastes 128/W of every vector tile."""

    rows: jax.Array           # [R] int32 — vertex ids of the bucket's rows
    slab: jax.Array           # [W, R] int32 — neighbor ids, -1 = pad
    values: Optional[jax.Array]  # [W, R] float — edge values aligned w/ slab


class SlabPlan(NamedTuple):
    """Static host-built plan: padded buckets + heavy-tail stream.

    `inv_perm` maps concat(bucket rows..., heavy rows, zero-degree rows)
    back to vertex order, so per-iteration results are assembled with one
    static-permutation gather instead of per-bucket scatters (gathers are
    measured consistently fast; round-3 microbenchmarks
    (scripts/perf/scatter_bench.py) showed scatter-set of sorted unique
    ids is ALSO near-free, so either assembly works — this one stays for
    its fusion-friendly static permutation).
    """

    slabs: Tuple[SlabBucket, ...]
    heavy_rows: Optional[jax.Array]     # [H] int32 row ids
    heavy_centers: Optional[jax.Array]  # [M_h] int32 indices into heavy_rows
    heavy_neigh: Optional[jax.Array]    # [M_h] int32 global neighbor ids
    heavy_values: Optional[jax.Array]   # [M_h] float edge values (or None)
    heavy_indptr: Optional[jax.Array]   # [H+1] int32 segment starts in the heavy stream
    rest_rows: Optional[jax.Array]      # [Z] int32 zero-degree rows (or None)
    inv_perm: jax.Array                 # [n] int32 assembly permutation


def build_slab_plan(
    centers: np.ndarray,
    neigh: np.ndarray,
    deg: np.ndarray,
    n: int,
    buckets=None,
    values: Optional[np.ndarray] = None,
) -> SlabPlan:
    """Partition a center-sorted (centers, neigh[, values]) stream into
    padded slabs. `deg` must be the per-center multiplicity of `centers`.
    `buckets=None` (default) uses per-graph DP-optimal bounds
    (resolve_buckets); pass explicit bounds to pin them."""
    buckets = resolve_buckets(deg, buckets)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])

    slabs = []
    order_parts = []
    prev = 0
    for w in buckets:
        sel = np.nonzero((deg > prev) & (deg <= w))[0]
        prev = w
        if sel.size == 0:
            continue
        r = sel.shape[0]
        starts = indptr[sel]
        degs = deg[sel]
        offs = np.arange(w)
        pos = starts[:, None] + offs[None, :]
        mask = offs[None, :] < degs[:, None]
        slab = np.full((r, w), -1, dtype=np.int32)
        slab[mask] = neigh[pos[mask]]
        vslab = None
        if values is not None:
            vslab = np.zeros((r, w), dtype=values.dtype)
            vslab[mask] = values[pos[mask]]
            vslab = jnp.asarray(np.ascontiguousarray(vslab.T))
        slabs.append(
            SlabBucket(
                jnp.asarray(sel.astype(np.int32)),
                jnp.asarray(np.ascontiguousarray(slab.T)),
                vslab,
            )
        )
        order_parts.append(sel)

    heavy_sel = np.nonzero(deg > buckets[-1])[0]
    heavy_rows = heavy_centers = heavy_neigh = heavy_values = heavy_indptr = None
    if heavy_sel.size:
        heavy_flag = np.zeros(n, dtype=bool)
        heavy_flag[heavy_sel] = True
        hmask = heavy_flag[centers]
        remap = np.zeros(n, dtype=np.int32)
        remap[heavy_sel] = np.arange(heavy_sel.shape[0], dtype=np.int32)
        heavy_rows = jnp.asarray(heavy_sel.astype(np.int32))
        heavy_centers = jnp.asarray(remap[centers[hmask]])
        heavy_neigh = jnp.asarray(neigh[hmask].astype(np.int32))
        if values is not None:
            heavy_values = jnp.asarray(values[hmask])
        h_ind = np.zeros(heavy_sel.shape[0] + 1, dtype=np.int64)
        np.cumsum(deg[heavy_sel], out=h_ind[1:])
        heavy_indptr = jnp.asarray(h_ind.astype(np.int32))
        order_parts.append(heavy_sel)

    rest = np.nonzero(deg == 0)[0]
    rest_rows = jnp.asarray(rest.astype(np.int32)) if rest.size else None
    if rest.size:
        order_parts.append(rest)

    order = np.concatenate(order_parts) if order_parts else np.empty(0, np.int64)
    inv_perm = np.empty(n, dtype=np.int32)
    inv_perm[order] = np.arange(n, dtype=np.int32)

    return SlabPlan(
        tuple(slabs),
        heavy_rows,
        heavy_centers,
        heavy_neigh,
        heavy_values,
        heavy_indptr,
        rest_rows,
        jnp.asarray(inv_perm),
    )


def assemble(plan: SlabPlan, bucket_results, heavy_result, rest_values) -> jax.Array:
    """Concatenate per-bucket results in plan order and apply the static
    inverse permutation — one gather instead of per-bucket scatters."""
    from graphtpu.ops.gather import table_gather

    parts = list(bucket_results)
    if heavy_result is not None:
        parts.append(heavy_result)
    if rest_values is not None:
        parts.append(rest_values)
    return table_gather(jnp.concatenate(parts), plan.inv_perm)


jax.tree_util.register_pytree_node(
    SlabBucket,
    lambda b: ((b.rows, b.slab, b.values), None),
    lambda _, c: SlabBucket(*c),
)
jax.tree_util.register_pytree_node(
    SlabPlan,
    lambda p: (tuple(p), None),
    lambda _, c: SlabPlan(*c),
)
