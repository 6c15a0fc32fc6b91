"""Pallas table-gather prototype — VMEM-resident table (VERDICT r2 #4).

The repo's dominant primitive is `table_gather(x, idx)` (ops/gather.py):
XLA lowers it to a [row >> 7] row fetch from HBM plus a fused lane
select, measured ~2.6 ns/index on v5e — i.e. ~197 GB/s of HBM row
traffic, a quarter of the chip's HBM bandwidth, because every index
refetches its 512 B row from HBM. For the label/rank tables of every
Graphalytics iteration the table itself is small (n=2^20 int32 = 4 MB
< 16 MB VMEM): a Pallas kernel can pin the WHOLE table in VMEM and pay
HBM traffic only for the index/output streams (8 B/index), an 's64x
reduction in HBM bytes per index.

The open question (ROADMAP round 2: "Mosaic lacks vectorized dynamic
indexing; revisit if newer Mosaic exposes dynamic_gather") is whether
`jnp.take(table, rows, axis=0)` vectorizes inside a kernel on this
toolchain. This module is the A/B arm that answers it with data — the
reference precedent for dropping below the library is the CUDA fork's
cdlp_kernel.cu (below LAGraph). scripts/perf/measure_pallas_gather.py
runs the comparison; GRAPHTPU_GATHER_IMPL=pallas flips ops/gather to
this path when it wins.

Constraints of the prototype: idx flat [M] with M % BLOCK == 0 (callers
pad), table int32/float32 [n] with n % 128 == 0 after padding, n*4 +
block buffers within the ~16 MB VMEM budget (n <= ~3M).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK = 2048          # indices per grid step ([16, 128] tile)
_ROWS = BLOCK // 128  # sublane count of one index block


def _kernel(tbl_ref, idx_ref, out_ref):
    import jax.numpy as jnp

    idx = idx_ref[:]                       # [R, 128] int32
    r = idx >> 7                           # table row of each index
    lane = idx & 127
    # vectorized dynamic row gather from the VMEM-resident table —
    # the operation Mosaic historically refused to vectorize
    rows = jnp.take(tbl_ref[:], r.reshape(-1), axis=0)  # [R*128, 128]
    rows = rows.reshape(idx.shape + (128,))
    sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2) == lane[..., None]
    zero = jnp.zeros((), tbl_ref.dtype)
    out_ref[:] = jnp.sum(jnp.where(sel, rows, zero), axis=-1, dtype=tbl_ref.dtype)


@partial(jax.jit, static_argnames=())
def pallas_table_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] with the whole table pinned in VMEM. idx int32 in [0, len(x));
    any idx shape (flattened internally, padded to BLOCK)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    n_pad = -(-n // 128) * 128
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n,), x.dtype)])
    tbl = x.reshape(n_pad // 128, 128)

    shape = idx.shape
    flat = idx.reshape(-1)
    m = flat.shape[0]
    m_pad = -(-m // BLOCK) * BLOCK
    if m_pad != m:
        flat = jnp.concatenate([flat, jnp.zeros((m_pad - m,), flat.dtype)])
    idx2 = flat.reshape(m_pad // 128, 128)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, x.dtype),
        grid=(m_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (n_pad // 128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tbl, idx2)
    return out.reshape(-1)[:m].reshape(shape)
