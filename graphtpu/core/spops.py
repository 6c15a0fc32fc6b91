"""Sparse linear-algebra primitives over COO edge streams.

This is the TPU-native replacement for the GrB_mxm/GrB_vxm dispatch the
reference leans on (LAGraph calls in src/main/c/src/algorithms/*.cpp): a
semiring SpMV is a gather (x at edge sources) + fused elementwise multiply
+ one segment reduction keyed by edge destinations. With edges pre-sorted
by the reduction key, XLA lowers the reduce to a sorted segment scatter,
which is the efficient formulation on TPU (no atomics, no hashing — the
roles the CUDA kernels in cdlp_kernel.cu play on GPU).

All functions here are shape-polymorphic in nnz but static under jit; the
number of segments (n) must be passed statically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from graphtpu.core.semiring import Semiring, Monoid


def segment_reduce(
    monoid: Monoid,
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Reduce `values` by `segment_ids` under `monoid`; empty segments get
    the monoid identity."""
    return monoid.segment_reduce(
        values,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def spmv(
    semiring: Semiring,
    edges_src: jax.Array,
    edges_dst: jax.Array,
    edges_w: jax.Array,
    x: jax.Array,
    num_segments: int,
    *,
    sorted_by_dst: bool = True,
) -> jax.Array:
    """y[v] = ⊕_{(u,v) ∈ E} (w_uv ⊗ x[u]).

    With `sorted_by_dst` edges this is the pull/in-neighbor product
    (y = A^T ⊕.⊗ x in GraphBLAS terms when A[u,v] stores edge u→v).
    Pass push-ordered edges with src/dst swapped for the out-neighbor
    product.
    """
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather

    terms = semiring.mul(edges_w, table_gather(x, edges_src, chunk=EDGE_STREAM_CHUNK))
    return segment_reduce(
        semiring.add, terms, edges_dst, num_segments, indices_are_sorted=sorted_by_dst
    )


def masked_fill(updated: jax.Array, mask: jax.Array, old: jax.Array) -> jax.Array:
    """GraphBLAS-style masked assign: keep `updated` where mask, else `old`."""
    return jnp.where(mask, updated, old)


def assign(vec: jax.Array, idx: jax.Array, vals, mask: jax.Array = None) -> jax.Array:
    """GrB_Vector_assign: vec[idx] = vals (optionally under a mask aligned
    with idx). `vals` may be a scalar or an array matching idx."""
    if mask is not None:
        old = vec[idx]
        vals = jnp.where(mask, vals, old)
    return vec.at[idx].set(vals)


def extract(vec: jax.Array, idx: jax.Array) -> jax.Array:
    """GrB_Vector_extract: vec[idx] through the fast table gather."""
    from graphtpu.ops.gather import EDGE_STREAM_CHUNK, table_gather

    return table_gather(vec, idx, chunk=EDGE_STREAM_CHUNK)


def reduce_vector(monoid: Monoid, vec: jax.Array) -> jax.Array:
    """GrB_Vector_reduce: fold the whole vector under a monoid."""
    reduce_fns = {
        "plus": jnp.sum,
        "min": jnp.min,
        "max": jnp.max,
        "lor": jnp.max,
    }
    return reduce_fns[monoid.name](vec)


@partial(jax.jit, static_argnames=("num_segments",))
def degrees(edges_key: jax.Array, num_segments: int) -> jax.Array:
    """Per-vertex edge counts (sorted or unsorted keys)."""
    return jax.ops.segment_sum(
        jnp.ones_like(edges_key, dtype=jnp.int32), edges_key, num_segments=num_segments
    )


def pack_edge_keys_f64(src: jax.Array, dst: jax.Array, n: int) -> jax.Array:
    """Pack (src, dst) into exactly-representable float64 keys: src*n + dst.

    Valid while n² < 2^53 (n < ~94M — every Graphalytics dataset). Used for
    vectorized edge-membership tests (LCC) and dedup, avoiding int64 sorts
    on TPU.
    """
    return src.astype(jnp.float64) * jnp.float64(n) + dst.astype(jnp.float64)
