"""Static edge-membership hash table with vectorized 64-slot row probes.

The CUDA fork answered "is (x, y) an edge?" with per-row hash tables
probed one thread at a time (cdlp_kernel.cu:419-447 open addressing,
murmur-style mix at :400-412). The TPU reformulation: a host-built
global table whose collision domain is a 64-slot ROW fetched in ONE row
gather, then compared across lanes — no probe sequence on device at all.

Everything on the device path is int32 (int64 gathers and multiplies
are slow on TPU v5e), and the table is a pre-shaped 2-D [rows, 128]
int32 array: 128 lanes tile the TPU's (8, 128) layout exactly, so the
gather operand needs NO padded relayout (narrower rows made XLA
materialize a (128/W)x-padded copy of the whole table per dispatch —
gigabytes for graph-scale tables, the cause of both the ~40 ns/probe
cost and TPU worker OOM crashes). A slot is an (even, odd) int32 lane
pair — 64 key slots per 512-byte row: the even lane holds the key's low
32 bits (bit-reinterpreted), the odd lane holds
`(key_hi << PAYLOAD_BITS) | payload` — keys up to
2^(30 + 32 - PAYLOAD_BITS) fit. Empty slots hold (-1, -1); a real odd
lane is always >= 0, so -1 can't match. The row index comes from a
32-bit multiplicative hash of both halves (identical on host uint32 and
device int32 arithmetic: the masked result bits lie below the
sign-extension fill).

Overflow policy: at the default fill (0.25 = mean 16 keys per 64-slot
row) the probability a row receives > 64 keys is ~3e-20 — essentially
never (at fill 0.5, mean 32, it is ~2e-7 per row); any keys that don't
fit are simply LEFT OUT of the table and returned to the caller, which
handles them exactly on the host (graphtpu/ops/triangles.py patches
their triangles after the sweep).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PAYLOAD_BITS = 2
_PAYLOAD_MASK = (1 << PAYLOAD_BITS) - 1
_SLOTS = 64          # key slots per row
_ROW = 2 * _SLOTS    # int32 lanes per row (lo/hi interleaved) == 128

_M_LO = np.uint32(0x9E3779B1)   # golden-ratio prime
_M_HI = np.uint32(0x85EBCA77)   # murmur3 fmix prime


class EdgeHash(NamedTuple):
    table: jax.Array   # int32 [rows, 128] — pre-shaped, tiles exactly
    rows: int          # power of two


def _split(keys: np.ndarray, payload: np.ndarray):
    lo = (keys.astype(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (keys.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
    odd = (hi << np.uint32(PAYLOAD_BITS)) | payload.astype(np.uint32)
    return lo.view(np.int32), odd.view(np.int32), lo, hi


def _host_hash(lo_u32: np.ndarray, hi_u32: np.ndarray, rows: int) -> np.ndarray:
    h = (lo_u32 * _M_LO) ^ (hi_u32 * _M_HI)  # uint32 wrap-around
    b = int(rows).bit_length() - 1
    return ((h >> np.uint32(32 - b)) & np.uint32(rows - 1)).astype(np.int64)


def build_edge_hash(
    keys: np.ndarray, payload: np.ndarray, fill: float = 0.25
) -> Tuple[EdgeHash, np.ndarray]:
    """Build a membership table for int64 `keys` (non-negative, unique,
    < 2^(30 + 32 - PAYLOAD_BITS)) with payload ints < 2^PAYLOAD_BITS.

    `fill` is the target mean slot occupancy (0.25 → mean 16 keys per
    64-slot row). Returns (EdgeHash, spilled) where `spilled` marks keys
    that did NOT fit (row-overflow P ~3e-20 at the default fill, ~2e-7
    at fill=0.5) — the caller must handle those out of band."""
    keys = np.asarray(keys, dtype=np.int64)
    payload = np.asarray(payload, dtype=np.int64)
    lo_i32, odd_i32, lo_u32, hi_u32 = _split(keys, payload)

    rows = 1 << max(
        4, int(np.ceil(np.log2(max(len(keys), 1) / (_SLOTS * fill) + 1)))
    )
    h = _host_hash(lo_u32, hi_u32, rows)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    idx = np.arange(hs.shape[0], dtype=np.int64)
    rank = np.zeros(hs.shape[0], dtype=np.int64)
    if hs.shape[0]:
        new_run = np.concatenate([[True], hs[1:] != hs[:-1]])
        rank = idx - np.maximum.accumulate(np.where(new_run, idx, 0))
    fits = rank < _SLOTS
    table = np.full(rows * _ROW, -1, dtype=np.int32)
    base = hs[fits] * _ROW + 2 * rank[fits]
    table[base] = lo_i32[order][fits]
    table[base + 1] = odd_i32[order][fits]
    spilled = np.zeros(keys.shape[0], dtype=bool)
    spilled[order[~fits]] = True
    return EdgeHash(jnp.asarray(table.reshape(rows, _ROW)), rows), spilled


@partial(jax.jit, static_argnames=("rows",))
def _build_kernel(keys, payload, rows):
    """Device-side table construction: hash, stable sort by row, in-row
    rank via run-length scan, one scatter. ~0.4 ns/el sort + ~4.3 ns/el
    scatter replace the host argsort + fancy-index stores that dominated
    wedge-plan prep (~2 min at 29M keys on this box's single core)."""
    m = keys.shape[0]
    lo = keys.astype(jnp.int32)                      # low 32 bits (wrap)
    hi = (keys >> 32).astype(jnp.int32)
    odd = (hi << PAYLOAD_BITS) | payload
    b = int(rows).bit_length() - 1
    mlo = jnp.int32(_M_LO.astype(np.int32))
    mhi = jnp.int32(_M_HI.astype(np.int32))
    h = (lo * mlo) ^ (hi * mhi)                      # int32 wrap == uint32
    h = (h >> (32 - b)) & (rows - 1)
    idx = jnp.arange(m, dtype=jnp.int32)
    h_s, lo_s, odd_s, idx_s = jax.lax.sort((h, lo, odd, idx), num_keys=1)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), h_s[1:] != h_s[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, idx, -1))
    rank = idx - run_start
    fits = rank < _SLOTS
    base = h_s * _ROW + 2 * rank
    safe = jnp.where(fits, base, rows * _ROW)
    table = jnp.full((rows * _ROW,), -1, dtype=jnp.int32)
    table = table.at[safe].set(lo_s, mode="drop")
    table = table.at[safe + 1].set(odd_s, mode="drop")
    spilled = (
        jnp.zeros((m,), bool)
        .at[jnp.where(fits, m, idx_s)]
        .set(True, mode="drop")
    )
    return table.reshape(rows, _ROW), spilled


def build_edge_hash_device(
    keys: jax.Array, payload: jax.Array, fill: float = 0.25
) -> Tuple[EdgeHash, np.ndarray]:
    """build_edge_hash computed on device from DEVICE key/payload arrays
    (int64 keys, int32 payload). Same table layout, same hash, same
    overflow policy; `spilled` is returned as a host bool mask."""
    m = int(keys.shape[0])
    rows = 1 << max(4, int(np.ceil(np.log2(max(m, 1) / (_SLOTS * fill) + 1))))
    table, spilled = _build_kernel(
        keys, payload.astype(jnp.int32), rows
    )
    # overflow is ~never (P ~3e-20/row at the default fill): check the
    # scalar count first and only pay the [m] mask D2H when nonzero —
    # the bool mask of a 29M-key build took 11.8 s through the relay
    if int(jnp.sum(spilled, dtype=jnp.int32)) == 0:
        return EdgeHash(table, rows), np.zeros(m, dtype=bool)
    return EdgeHash(table, rows), np.asarray(spilled)


def _probe_lanes(eh: EdgeHash, klo: jax.Array, khi: jax.Array):
    """Core probe on flat int32 (lo, hi) key halves."""
    b = int(eh.rows).bit_length() - 1
    mlo = jnp.int32(_M_LO.astype(np.int32))
    mhi = jnp.int32(_M_HI.astype(np.int32))
    h = (klo * mlo) ^ (khi * mhi)                    # int32 wrap == uint32
    h = (h >> (32 - b)) & (eh.rows - 1)              # masked bits < sign fill

    fetched = eh.table[h]                            # [P, 128] int32 row gather
    lo_lanes = fetched[:, 0::2]
    odd_lanes = fetched[:, 1::2]
    match = (
        (odd_lanes >= 0)
        & (lo_lanes == klo[:, None])
        & ((odd_lanes >> PAYLOAD_BITS) == khi[:, None])
    )
    found = jnp.any(match, axis=-1)
    payload = jnp.sum(
        jnp.where(match, odd_lanes & _PAYLOAD_MASK, 0), axis=-1, dtype=jnp.int32
    )
    return found, payload


def _probe_lanes_sorted(eh: EdgeHash, klo: jax.Array, khi: jax.Array):
    """_probe_lanes with the row gather issued in SORTED row order: the
    big-table random row fetch is issue-rate bound (~16 ns/row at 1 GB);
    consecutive fetches of neighboring rows may stream much closer to the
    small-table rate (~7 ns). Costs two multi-operand sorts (~0.4 ns/el
    each) bracketing the gather — worth it only if locality buys more
    than ~4 ns/probe; keep it behind the GRAPHTPU_LCC_PROBE A/B knob."""
    b = int(eh.rows).bit_length() - 1
    mlo = jnp.int32(_M_LO.astype(np.int32))
    mhi = jnp.int32(_M_HI.astype(np.int32))
    h = (klo * mlo) ^ (khi * mhi)
    h = (h >> (32 - b)) & (eh.rows - 1)

    idx = jnp.arange(h.shape[0], dtype=jnp.int32)
    h_s, klo_s, khi_s, idx_s = jax.lax.sort((h, klo, khi, idx), num_keys=1)
    fetched = eh.table[h_s]
    lo_lanes = fetched[:, 0::2]
    odd_lanes = fetched[:, 1::2]
    match = (
        (odd_lanes >= 0)
        & (lo_lanes == klo_s[:, None])
        & ((odd_lanes >> PAYLOAD_BITS) == khi_s[:, None])
    )
    found_s = jnp.any(match, axis=-1)
    payload_s = jnp.sum(
        jnp.where(match, odd_lanes & _PAYLOAD_MASK, 0), axis=-1, dtype=jnp.int32
    )
    # un-permute with a second sort (cheaper than a ~4.3 ns/el scatter
    # of unsorted indices at this width)
    _, found, payload = jax.lax.sort(
        (idx_s, found_s.astype(jnp.int32), payload_s), num_keys=1
    )
    return found.astype(bool), payload


def probe_edge_hash(eh: EdgeHash, keys: jax.Array):
    """Vectorized membership test: keys int64 (any shape) → (found bool,
    payload int32). Unknown keys return (False, 0)."""
    shape = keys.shape
    kf = keys.reshape(-1)
    klo = (kf & 0xFFFFFFFF).astype(jnp.int32)        # bit-identical wrap
    khi = (kf >> 32).astype(jnp.int32)               # keys >= 0: logical
    found, payload = _probe_lanes(eh, klo, khi)
    return found.reshape(shape), payload.reshape(shape)


def probe_edge_hash_xy(
    eh: EdgeHash, x: jax.Array, y: jax.Array, id_bits: int, sort_probes: bool = False
):
    """Membership test for packed pair keys `(x << id_bits) | y` built
    entirely in int32 (int64 gathers/multiplies scalarize on TPU): the
    int32 shift's wrap IS the key's low 32 bits, and the high half is
    `x >> (32 - id_bits)`. Requires 0 < id_bits < 32 and x, y >= 0.
    `sort_probes` issues the row gather in sorted row order (see
    _probe_lanes_sorted)."""
    shape = x.shape
    xf = x.reshape(-1).astype(jnp.int32)
    yf = y.reshape(-1).astype(jnp.int32)
    klo = (xf << id_bits) | yf
    khi = xf >> (32 - id_bits)
    lanes = _probe_lanes_sorted if sort_probes else _probe_lanes
    found, payload = lanes(eh, klo, khi)
    return found.reshape(shape), payload.reshape(shape)


jax.tree_util.register_pytree_node(
    EdgeHash,
    lambda e: ((e.table,), (e.rows,)),
    lambda aux, c: EdgeHash(c[0], aux[0]),
)
