"""Scan-based segment reductions over statically-sorted segments.

Microbenchmarks on TPU v5e show XLA's segment_sum/min/max lowering costs
~9 ns/element while prefix scans cost ~1.4 ns/element and gathers at a
static position list are cheap when the list is vertex-sized. Since every
edge stream in this framework is pre-sorted by its reduction key (the
destination row), the segment structure is static: segment k occupies
[indptr[k], indptr[k+1]). That turns a segment reduction into

    sum: one (f64-accumulated) cumsum + two static-position gathers,
    min/max: one cummax over (segment_id << 32 | order-packed value)
             + one static-position gather at segment ends,

i.e. 3-6x cheaper than the scatter-based segment ops. This is the
workhorse replacing GrB_vxm's reduction stage (the role
GrB_MIN_SECOND_SEMIRING et al. play in LAGraph_cdlp.c:272 and friends).

All functions require `values` in segment-sorted order and a static
`indptr` (int32 [n+1]); empty segments yield the reduction identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIAS = 1 << 31
_M32 = (1 << 32) - 1


# within-block prefix length for the two-level cumsum (f32 inside blocks,
# f64 across block offsets): f64 scans are ~20x slower than f32 on v5e,
# but a raw f32 prefix over 10^8 elements loses too much precision for
# the end-difference trick. 2^16-element blocks bound the f32 error.
_BLOCK = 1 << 16


def seg_sum_scan(
    values: jax.Array, indptr: jax.Array, acc_dtype=jnp.float64, out_dtype=None
) -> jax.Array:
    """Per-segment sums via a two-level prefix sum.

    XLA's stock cumsum lowering is pathological on TPU for long streams
    (minutes of compile / ~8 ns/element at 60M). Instead: a hand-rolled
    Hillis-Steele scan along 128 lanes (7 shift-adds, pure VPU work) gives
    within-row prefixes, and a small f64 cumsum over the ~m/128 row totals
    gives the inter-row offsets — also fixing the precision problem of a
    raw f32 prefix feeding the end-difference trick."""
    out_dtype = out_dtype or values.dtype
    m = values.shape[0]
    if values.dtype == jnp.float64 or m <= _BLOCK:
        c = jnp.cumsum(values.astype(acc_dtype))
        c = jnp.concatenate([jnp.zeros((1,), acc_dtype), c])
        return (c[indptr[1:]] - c[indptr[:-1]]).astype(out_dtype)

    from graphtpu.ops.gather import table_gather

    lanes = 128
    pad = (-m) % lanes
    v = jnp.concatenate([values, jnp.zeros((pad,), values.dtype)]) if pad else values
    w = v.reshape(-1, lanes)
    shift = 1
    while shift < lanes:
        shifted = jnp.concatenate(
            [jnp.zeros((w.shape[0], shift), w.dtype), w[:, :-shift]], axis=1
        )
        w = w + shifted
        shift *= 2
    row_tot = w[:, -1].astype(acc_dtype)                 # [m/128]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), acc_dtype), jnp.cumsum(row_tot)]
    )
    w_flat = w.reshape(-1)

    def prefix_at(pos):
        # exclusive prefix at pos ∈ [0, m]: inter-row offset + within-row
        # inclusive prefix at pos-1 (0 at row starts). Flat 1-D gathers
        # only — 2-D coordinate gathers scalarize on TPU.
        r = pos & (lanes - 1)
        wb = jnp.where(
            r > 0,
            table_gather(w_flat, jnp.maximum(pos - 1, 0)),
            jnp.zeros((), values.dtype),
        )
        full = table_gather(offsets, pos >> 7)
        return full + wb.astype(acc_dtype)

    hi = prefix_at(indptr[1:])
    lo = prefix_at(indptr[:-1])
    return (hi - lo).astype(out_dtype)


def _pack_order_i64(values: jax.Array, descending: bool) -> jax.Array:
    """Order-preserving (or -reversing for min-via-max) map of int32 /
    float32 values into non-negative int64 < 2^32. For floats this is the
    IEEE-754 total-order map (monotone in the numeric value, NaNs
    excluded): b = bitcast int32; b >= 0 -> b + 2^31, b < 0 -> -1 - b.

    Wider dtypes are REJECTED rather than silently narrowed: an int64
    value beyond +/-2^31 would overflow into the packed segment-id bits
    (corrupting a DIFFERENT segment's winner), and float64 would round
    through float32."""
    if values.dtype.itemsize > 4:
        raise TypeError(
            f"seg extreme scans support int32/float32 values, got "
            f"{values.dtype} (64-bit values would corrupt the packed "
            f"segment keys)"
        )
    if jnp.issubdtype(values.dtype, jnp.floating):
        b = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32).astype(jnp.int64)
        u = jnp.where(b >= 0, b + _BIAS, -1 - b)
    else:
        u = values.astype(jnp.int64) + _BIAS
    return (_M32 - u) if descending else u


def _unpack_order_i64(u: jax.Array, descending: bool, dtype) -> jax.Array:
    if descending:
        u = _M32 - u
    if jnp.issubdtype(dtype, jnp.floating):
        b = jnp.where(u >= _BIAS, u - _BIAS, -1 - u).astype(jnp.int32)
        return jax.lax.bitcast_convert_type(b, jnp.float32).astype(dtype)
    return (u - _BIAS).astype(dtype)


def _seg_extreme_scan(values, seg_ids, indptr, identity, descending):
    """Shared min/max implementation: cummax over (seg_id, packed value);
    the running max never leaks across segments because seg_id ascends."""
    packed = (seg_ids.astype(jnp.int64) << 32) | _pack_order_i64(values, descending)
    from graphtpu.ops.gather import table_gather

    run = jax.lax.cummax(packed)
    ends = indptr[1:] - 1
    empty = indptr[1:] == indptr[:-1]
    at_end = table_gather(run, jnp.maximum(ends, 0)) & _M32
    out = _unpack_order_i64(at_end, descending, values.dtype)
    return jnp.where(empty, identity, out)


def seg_max_scan(values, seg_ids, indptr, identity) -> jax.Array:
    """Per-segment max; `seg_ids` must be ascending and aligned with values."""
    return _seg_extreme_scan(values, seg_ids, indptr, identity, descending=False)


def seg_min_scan(values, seg_ids, indptr, identity) -> jax.Array:
    """Per-segment min via descending order-pack."""
    return _seg_extreme_scan(values, seg_ids, indptr, identity, descending=True)
