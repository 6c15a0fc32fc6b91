"""Local clustering coefficient, Graphalytics semantics.

Semantics match LAGraph_lcc as invoked by the reference (lcc.cpp:61-70):
the neighborhood N(v) is over the symmetrized structure (union of in- and
out-neighbors, self-loops excluded); the numerator counts directed edges
between distinct neighbors (each stored direction counts once); the
denominator is |N(v)|·(|N(v)|−1); vertices with |N(v)| < 2 get 0.0
(lcc.cpp:45-55 writes 0.0 for missing entries).

TPU design: the reference computes a masked SpGEMM C⟨S⟩ = S·S (plus/pair
semiring) — per S-edge set intersections, which on GPU/CPU walk adjacency
lists with hash/merge joins. On TPU we reformulate triangle counting as a
*membership-test sweep*: for every directed A-edge (u,w), enumerate the
S-neighbors x of the lower-degree endpoint and test (other, x) ∈ S with a
vectorized branchless binary search over the CSR column array; every hit
means x sees the A-edge (u,w) inside its neighborhood, so scatter-add 1
to numerator[x]. Work is Σ_{(u,w)∈A} min(d(u), d(w)) — the same
complexity class as merge-join SpGEMM — but every step is a dense gather
/ compare / segment-add that XLA vectorizes on the VPU, with zero dynamic
shapes: edges are processed in fixed-size chunks under `lax.scan`, and the
neighbor enumeration is padded to a static width per degree bucket
(the TPU analogue of the CUDA fork's degree-dependent kernel dispatch,
cdlp_kernel.cu:611-677).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.ops.gather import table_gather
from graphtpu.algorithms.common import AlgorithmResult, register
from graphtpu.utils.config import AlgorithmParams, PlatformConfig

# Edges per scan step; bounds peak memory at CHUNK × pad_width int32.
_CHUNK = 1 << 15


def _bucket_bounds(max_deg: int):
    """Static pad widths; each A-edge lands in the smallest bucket holding
    its min-degree endpoint's neighbor list."""
    bounds = []
    b = 16
    while b < max_deg:
        bounds.append(b)
        b *= 8
    bounds.append(max(b, 16))
    return bounds


def _row_member(indptr, col, rows, x, search_iters):
    """Branchless vectorized binary search: is x[i,j] ∈ col[indptr[r]:indptr[r+1]]
    for r = rows[i]? col must be sorted within each row (push order)."""
    nnz = col.shape[0]
    lo = jnp.broadcast_to(indptr[rows][:, None], x.shape)
    hi = jnp.broadcast_to(indptr[rows + 1][:, None], x.shape)
    hi_fixed = hi

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) // 2
        v = table_gather(col, jnp.clip(mid, 0, nnz - 1))
        go_right = v < x
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, search_iters, body, (lo, hi))
    found = (lo < hi_fixed) & (table_gather(col, jnp.clip(lo, 0, nnz - 1)) == x)
    return found


@partial(jax.jit, static_argnames=("pad", "search_iters"))
def _lcc_bucket_sweep(numerator, indptr, col, c, o, pad, search_iters):
    """Accumulate common-neighbor hits for A-edges whose enumerated endpoint
    (c) has degree ≤ pad. c == -1 marks padding rows. Edge count must be a
    multiple of _CHUNK."""
    nnz = col.shape[0]
    offs = jnp.arange(pad, dtype=jnp.int32)[None, :]

    def step(num, co):
        ce, oe = co
        ce_safe = jnp.maximum(ce, 0)
        base = indptr[ce_safe]
        deg = indptr[ce_safe + 1] - base
        idx = jnp.clip(base[:, None] + offs, 0, nnz - 1)
        x = table_gather(col, idx)                                   # [chunk, pad]
        valid = (offs < deg[:, None]) & (ce[:, None] >= 0)
        found = _row_member(indptr, col, jnp.maximum(oe, 0), x, search_iters)
        hits = (found & valid).astype(num.dtype)
        num = num.at[x].add(hits, mode="drop")
        return num, None

    c2 = c.reshape(-1, _CHUNK)
    o2 = o.reshape(-1, _CHUNK)
    num, _ = jax.lax.scan(step, numerator, (c2, o2))
    return num


def prepare_lcc(graph: Graph):
    """Host-side prep shared by the single-chip and distributed paths:
    symmetrized CSR structure S (self-loops dropped) and the A-edge sweep
    list with the lower-S-degree endpoint enumerated."""
    n = graph.n
    sym = graph.symmetrized()

    # S: symmetrized structure without self-loops, CSR(push) order.
    s_keep = sym.src != sym.dst
    s_src, s_dst = sym.src[s_keep], sym.dst[s_keep]
    s_deg = np.bincount(s_src, minlength=n).astype(np.int64)
    s_indptr = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(s_deg, out=s_indptr[1:])

    # A: the original directed edge set (for undirected graphs, both stored
    # directions), self-loops excluded.
    a_keep = graph.src != graph.dst
    a_u, a_w = graph.src[a_keep], graph.dst[a_keep]

    # enumerate the lower-S-degree endpoint of every A-edge
    du, dw = s_deg[a_u], s_deg[a_w]
    c = np.where(du <= dw, a_u, a_w).astype(np.int32)
    o = np.where(du <= dw, a_w, a_u).astype(np.int32)
    dc = np.minimum(du, dw)
    return s_indptr, s_dst.astype(np.int32), s_deg, c, o, dc


@register("lcc")
def lcc(graph: Graph, params: AlgorithmParams, cfg: PlatformConfig) -> AlgorithmResult:
    impl = getattr(cfg, "lcc_impl", "auto")
    if impl in ("auto", "oriented"):
        # degree-oriented wedge enumeration + hash-row membership — the
        # scalable path (~10x less intrinsic work than the sweep and one
        # gather per probe instead of a log(deg) binary search); see
        # graphtpu/ops/triangles.py
        from graphtpu.ops.triangles import WedgeCapacityError, lcc_oriented

        try:
            cache_dir = getattr(cfg, "intermediate_dir", None)
            return AlgorithmResult("lcc", lcc_oriented(graph, cache_dir=cache_dir))
        except WedgeCapacityError:
            if impl == "oriented":
                raise
            # oriented out-degree exceeds the largest wedge bucket (very
            # high degeneracy) — fall back to the membership sweep, which
            # has no degree capacity limit
            from graphtpu.utils.logging import get_logger

            get_logger("lcc").warning(
                "wedge-plan capacity exceeded; falling back to membership sweep"
            )
    return _lcc_sweep(graph, cfg)


def _lcc_sweep(graph: Graph, cfg: PlatformConfig) -> AlgorithmResult:
    """Membership-sweep path (per-A-edge binary search); retained as the
    oracle/reference implementation (PlatformConfig.lcc_impl = "sweep")."""
    n = graph.n
    s_indptr, s_dst, s_deg, c, o, dc = prepare_lcc(graph)

    max_deg = int(s_deg.max()) if n else 0
    search_iters = max(1, int(np.ceil(np.log2(max(max_deg, 2) + 1))))

    indptr_d = jnp.asarray(s_indptr)
    col_d = jnp.asarray(s_dst)
    numerator = jnp.zeros((n,), dtype=jnp.int32)

    for pad in _bucket_bounds(max_deg):
        lo_bound = 0 if pad == 16 else pad // 8
        sel = (dc > lo_bound) & (dc <= pad) if pad > 16 else dc <= pad
        cnt = int(sel.sum())
        if cnt == 0:
            continue
        padded = -(-cnt // _CHUNK) * _CHUNK
        cb = np.full(padded, -1, dtype=np.int32)
        ob = np.full(padded, -1, dtype=np.int32)
        cb[:cnt] = c[sel]
        ob[:cnt] = o[sel]
        numerator = _lcc_bucket_sweep(
            numerator,
            indptr_d,
            col_d,
            jnp.asarray(cb),
            jnp.asarray(ob),
            pad,
            search_iters,
        )

    num = np.asarray(numerator, dtype=np.float64)
    d = s_deg.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(denom > 0, num / denom, 0.0)
    return AlgorithmResult("lcc", coeff)
