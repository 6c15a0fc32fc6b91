"""Fast dense-table gather for TPU.

XLA lowers a scalar gather `x[idx]` on TPU v5e at ~7 ns/element — the
single dominating cost of every message-passing iteration (labels at
neighbor ids, ranks at edge sources). Empirically, gathering *rows* of a
reshaped [n/W, W] table runs ~3x faster (~2.4 ns/index, independent of W
for W <= 128), and the element within the fetched row can be selected
with a fused one-hot compare+sum on the VPU at negligible cost.

`table_gather(x, idx)` implements gather as

    x2d = x.reshape(n/W, W)            # layout no-op
    rows = x2d[idx >> log2(W)]         # row gather (fast path)
    out  = sum(where(lane == idx & (W-1), rows, 0), axis=-1)

Works for any idx shape (broadcasting over the trailing W axis) and any
int/float dtype. Indices must be in [0, n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Row width: 8 keeps the fetched-row intermediate small; measured cost is
# flat for W in [8, 128].
_W = 8
_SHIFT = 3
_MASK = _W - 1


# Above this many indices the gather is evaluated in statically-unrolled
# chunks so a rematerialized [chunk, W] row-fetch intermediate stays
# bounded (XLA's remat of the fused gather OOM'd at 60M+ indices).
# Chunking costs ~3x on the chunks themselves (fusion boundaries), so the
# threshold is set well above every per-bucket slab size.
_CHUNK_THRESHOLD = 1 << 25
_CHUNK = 1 << 22  # swept: 4M chunks run ~2x faster than 16M ones at 60M+ indices


def _gather_block(x2d: jax.Array, idx: jax.Array, dtype) -> jax.Array:
    rows = x2d[idx >> _SHIFT]                         # idx.shape + (W,)
    lane = jnp.arange(_W, dtype=idx.dtype)
    sel = lane == (idx & _MASK)[..., None]
    zero = jnp.zeros((), dtype=dtype)
    # dtype pinned: jnp.sum would promote int32 -> int64 under x64
    return jnp.sum(jnp.where(sel, rows, zero), axis=-1, dtype=dtype)


def table_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Equivalent to x[idx] (idx int32 in [0, len(x))), ~3x faster on TPU."""
    n = x.shape[0]
    n_pad = -(-n // _W) * _W
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n,), dtype=x.dtype)])
    x2d = x.reshape(n_pad // _W, _W)

    total = idx.size
    if total <= _CHUNK_THRESHOLD:
        # flatten: gathers on >=2-D index arrays with small minor dims hit
        # lane-padded tiles; the flat form fuses cleanly
        return _gather_block(x2d, idx.reshape(-1), x.dtype).reshape(idx.shape)

    # statically unrolled chunks (lax.map's while-loop blocks fusion and
    # was measured 3-5x slower than the fused direct gather)
    flat = idx.reshape(-1)
    outs = []
    for start in range(0, total, _CHUNK):
        end = min(start + _CHUNK, total)
        outs.append(_gather_block(x2d, flat[start:end], x.dtype))
    return jnp.concatenate(outs).reshape(idx.shape)
