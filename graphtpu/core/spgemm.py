"""Masked semiring SpGEMM and SpMM — the GraphBLAS mxm surface.

The reference leans on GrB_mxm for LCC's masked SpGEMM C⟨S⟩ = S·S
(inside LAGraph_lcc) and on semiring SpMV everywhere else. This module
provides the general TPU formulation for a *structurally masked* product
C⟨M⟩ = A ⊕.⊗ B: the mask's nonzero pattern is known up front (always
true in the Graphalytics algorithms), so the computation is

    for each mask entry (i, j):
        C[i,j] = ⊕_k  A[i,k] ⊗ B[k,j]

evaluated as a degree-bucketed sweep: enumerate A's row i into a padded
slab of (k, a_ik) pairs, probe B's row k for column j with a vectorized
branchless binary search (CSR columns are sorted), gather the matched
b_kj, apply ⊗, and row-reduce with ⊕. Work is Σ_(i,j)∈M deg_A(i) ·
log deg_B — the merge-join complexity class of CPU/GPU masked SpGEMM,
but every step is dense VPU work.

Unmasked SpMM (sparse × dense, the other mxm case worth having on TPU)
is a batched slab SpMV over the dense right-hand side's columns.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.core.semiring import Semiring
from graphtpu.ops.gather import table_gather


class CSR(NamedTuple):
    """Device CSR triple. `col` must be sorted within each row."""

    indptr: jax.Array  # int32 [n+1]
    col: jax.Array     # int32 [nnz]
    val: Optional[jax.Array]  # [nnz] or None (structural / iso-1)

    @classmethod
    def from_graph(cls, graph, wdtype=np.float32, with_values: bool = True):
        """Push-ordered CSR of a Graph (rows = sources)."""
        return cls(
            jnp.asarray(graph.indptr.astype(np.int32)),
            jnp.asarray(graph.dst),
            jnp.asarray(graph.w.astype(wdtype)) if with_values else None,
        )


def _row_search(indptr, col, rows, x, iters):
    """found, pos: is x[...] ∈ col[indptr[r]:indptr[r+1]] for r = rows[...],
    and at which index? Branchless binary search; col sorted per row."""
    nnz = col.shape[0]
    lo = indptr[rows]
    hi = indptr[rows + 1]
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

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    found = (lo < hi_fixed) & (table_gather(col, jnp.clip(lo, 0, nnz - 1)) == x)
    return found, jnp.clip(lo, 0, nnz - 1)


def _bucket_bounds(max_deg: int):
    bounds = []
    b = 8
    while b < max(max_deg, 1):
        bounds.append(b)
        b *= 4
    bounds.append(max(b, 8))
    return bounds


def masked_spgemm(
    semiring: Semiring,
    a: CSR,
    b: CSR,
    mask_rows: np.ndarray,
    mask_cols: np.ndarray,
    *,
    a_indptr_host: np.ndarray,
) -> jax.Array:
    """Values of C⟨M⟩ = A ⊕.⊗ B at the mask entries (aligned with the
    mask_rows/mask_cols order). Structural mask: only pattern matters.

    `a_indptr_host` is the host copy of a.indptr used to bucket mask
    entries by deg_A(row) (static planning).
    """
    m = mask_rows.shape[0]
    deg_a = a_indptr_host[1:] - a_indptr_host[:-1]
    dc = deg_a[mask_rows]
    max_deg = int(deg_a.max()) if deg_a.size else 0  # A-side slab bucketing
    # the binary search walks B's rows, so the iteration bound must
    # cover B's max row length (A's bound under-searches when B has a
    # longer row and silently drops present entries); B's total nnz is a
    # safe static over-bound without a host copy of B's indptr
    nb = int(b.col.shape[0])
    iters = max(1, int(np.ceil(np.log2(max(nb, 2) + 1))))

    dtype = (b.val.dtype if b.val is not None
             else a.val.dtype if a.val is not None else jnp.float32)
    ident = semiring.add.identity(dtype)

    parts = []
    sels = []
    prev = 0
    for w in _bucket_bounds(max_deg):
        sel = np.nonzero((dc > prev) & (dc <= w))[0]
        prev = w
        if sel.size == 0:
            continue
        rows = jnp.asarray(mask_rows[sel].astype(np.int32))
        cols = jnp.asarray(mask_cols[sel].astype(np.int32))
        parts.append(_spgemm_bucket(semiring, a, b, rows, cols, w, iters, ident))
        sels.append(sel)
    if not parts:  # every mask row has deg_A == 0 -> all-identity output
        return jnp.full((m,), ident, dtype=dtype)

    # assemble by inverse-permutation GATHER, not per-bucket scatter —
    # the repo-wide rule (ops/slab.py: gathers measured ~4x cheaper than
    # scatters on v5e). Mask entries whose A-row is empty (deg 0) are in
    # no bucket; they read the trailing identity slot.
    covered = np.concatenate(sels)
    perm = np.full(m, covered.size, dtype=np.int32)
    perm[covered] = np.arange(covered.size, dtype=np.int32)
    flat = jnp.concatenate(
        [p.astype(dtype) for p in parts]
        + [jnp.full((1,), ident, dtype=dtype)]
    )
    return table_gather(flat, jnp.asarray(perm))


@partial(jax.jit, static_argnames=("w", "iters", "semiring"))
def _spgemm_bucket(semiring, a, b, rows, cols, w, iters, ident):
    offs = jnp.arange(w, dtype=jnp.int32)[None, :]
    base = a.indptr[rows][:, None]
    deg = (a.indptr[rows + 1] - a.indptr[rows])[:, None]
    nnz_a = a.col.shape[0]
    pos_a = jnp.clip(base + offs, 0, nnz_a - 1)
    k = table_gather(a.col, pos_a)                      # [R, w]
    in_row = offs < deg
    found, pos_b = _row_search(b.indptr, b.col, jnp.where(in_row, k, 0),
                               jnp.broadcast_to(cols[:, None], k.shape), iters)
    hit = found & in_row

    a_v = table_gather(a.val, pos_a) if a.val is not None else None
    b_v = table_gather(b.val, pos_b) if b.val is not None else None
    if a_v is None and b_v is None:
        terms = jnp.ones(k.shape, dtype=jnp.result_type(ident))
    elif a_v is None:
        terms = b_v
    elif b_v is None:
        terms = a_v
    else:
        terms = semiring.mul(a_v, b_v)
    terms = jnp.where(hit, terms.astype(jnp.result_type(ident)), ident)

    reduce_fns = {
        "plus": lambda t: jnp.sum(t, axis=1, dtype=t.dtype),
        "min": lambda t: jnp.min(t, axis=1),
        "max": lambda t: jnp.max(t, axis=1),
        "lor": lambda t: jnp.max(t, axis=1),
    }
    return reduce_fns[semiring.add.name](terms)


def spmm(semiring: Semiring, plan, x: jax.Array, n: int) -> jax.Array:
    """Sparse × dense SpMM: y[v, :] = ⊕_u (w_uv ⊗ x[u, :]) — a vmapped
    slab SpMV over the dense columns (MXU-free but fully vectorized;
    Graphalytics needs no SpMM, provided for library completeness)."""
    from graphtpu.ops.spmv import slab_spmv

    return jax.vmap(lambda col: slab_spmv(semiring, plan, col, n), in_axes=1, out_axes=1)(x)
