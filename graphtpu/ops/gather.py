"""Fast dense-table gather for TPU.

XLA lowers a scalar gather `x[idx]` on TPU v5e at ~7 ns/element — the
single dominating cost of every message-passing iteration (labels at
neighbor ids, ranks at edge sources). Empirically, gathering *rows* of a
reshaped [n/W, W] table runs ~3x faster (~2.4 ns/index, independent of W
for W <= 128), and the element within the fetched row can be selected
with a fused one-hot compare+sum on the VPU at negligible cost.

`table_gather(x, idx)` implements gather as

    x2d = x.reshape(n/W, W)
    rows = x2d[idx >> log2(W)]         # row gather (fast path)
    out  = sum(where(lane == idx & (W-1), rows, 0), axis=-1)

Works for any idx shape (broadcasting over the trailing W axis) and any
int/float dtype. Indices must be in [0, n).

W is 128: a [n/128, 128] table tiles the TPU's (8, 128) layout exactly,
so the reshape is a true layout no-op. Any W < 128 pads the minor dim to
128 lanes — XLA then materializes a (128/W)x-padded COPY of the whole
table per dispatch (an OOM dump showed s32[33M, 8] with "Extra memory
due to padding: 15.00G (16.0x expansion)" plus a 1GB copy). Measured
gather cost is flat for W in [8, 128], so the wide row is free; the
fetched-row intermediate is [M, 128] either way because the narrow
variants pad to 128 lanes too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_W = 0  # resolved lazily: probing the backend at import time would
#         initialize it before test/dryrun code can re-pin the platform
_SHIFT = 0
_MASK = 0


def _resolve_w() -> int:
    # 128 on TPU (tile-exact, no padded table copy); 8 elsewhere — CPU
    # executes the one-hot select literally, so wide rows cost 16x there
    global _W, _SHIFT, _MASK
    if _W == 0:
        try:
            w = 128 if jax.default_backend() in ("tpu", "axon") else 8
        except Exception:
            w = 8
        _W, _SHIFT, _MASK = w, w.bit_length() - 1, w - 1
    return _W


# Above this many indices the gather is evaluated in statically-unrolled
# chunks so a rematerialized [chunk, W] row-fetch intermediate stays
# bounded (XLA's remat of the fused gather OOM'd at 60M+ indices).
# Chunking costs ~3x on the chunks themselves (fusion boundaries), so the
# threshold is set well above every per-bucket slab size.
import os as _os

_CHUNK_THRESHOLD = int(
    _os.environ.get("GRAPHTPU_GATHER_CHUNK_THRESHOLD", 1 << 25)
)
# swept: 4M chunks run ~2x faster than 16M ones at 60M+ indices (tuned at
# W=8; GRAPHTPU_GATHER_CHUNK re-tunes without code edits — read once at
# import, so set it before the first graphtpu import)
_CHUNK = int(_os.environ.get("GRAPHTPU_GATHER_CHUNK", 1 << 22))


def _gather_block(x2d: jax.Array, idx: jax.Array, dtype) -> jax.Array:
    rows = x2d[idx >> _SHIFT]                         # idx.shape + (W,)
    lane = jnp.arange(_W, dtype=idx.dtype)
    sel = lane == (idx & _MASK)[..., None]
    zero = jnp.zeros((), dtype=dtype)
    # dtype pinned: jnp.sum would promote int32 -> int64 under x64
    return jnp.sum(jnp.where(sel, rows, zero), axis=-1, dtype=dtype)


# Chunk size forced at full-edge-stream call sites inside nested
# while_loops (dense sweeps of the adaptive kernels). There XLA's remat
# can MATERIALIZE the [idx, 128] row-fetch intermediate instead of fusing
# it: a 31.4M-edge stream sat just under the 2^25 auto-chunk threshold
# and allocated a 14.97 GB f32[31400984,128] HLO temp — the round-3
# driver-bench SSSP compile OOM (BENCH_r03.json sssp_error). 4M chunks
# bound the worst-case temp to 2 GB. Kept separate from the global
# threshold because lowering that costs PR ~9% on the chip (374 -> 339
# Mnnz/s measured at s20/ef32) on slab gathers that do fuse.
EDGE_STREAM_CHUNK = _CHUNK


def table_gather(x: jax.Array, idx: jax.Array, *, chunk: int | None = None) -> jax.Array:
    """Equivalent to x[idx] (idx int32 in [0, len(x))), ~3x faster on TPU.

    `chunk` forces chunked evaluation above that many indices (callers
    whose gather sits where XLA may materialize the [idx, W] row-fetch
    intermediate pass EDGE_STREAM_CHUNK); None uses the global
    threshold/size knobs."""
    _resolve_w()
    n = x.shape[0]
    n_pad = -(-n // _W) * _W
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n,), dtype=x.dtype)])
    x2d = x.reshape(n_pad // _W, _W)

    total = idx.size
    limit = _CHUNK_THRESHOLD if chunk is None else chunk
    step = _CHUNK if chunk is None else chunk
    if total <= limit:
        # flatten: gathers on >=2-D index arrays with small minor dims hit
        # lane-padded tiles; the flat form fuses cleanly
        return _gather_block(x2d, idx.reshape(-1), x.dtype).reshape(idx.shape)

    # statically unrolled chunks (lax.map's while-loop blocks fusion and
    # was measured 3-5x slower than the fused direct gather)
    flat = idx.reshape(-1)
    outs = []
    for start in range(0, total, step):
        end = min(start + step, total)
        outs.append(_gather_block(x2d, flat[start:end], x.dtype))
    return jnp.concatenate(outs).reshape(idx.shape)
