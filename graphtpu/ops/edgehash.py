"""Static edge-membership hash table with vectorized 16-slot row probes.

The CUDA fork answered "is (x, y) an edge?" with per-row hash tables
probed one thread at a time (cdlp_kernel.cu:419-447 open addressing,
murmur-style mix at :400-412). The TPU reformulation: a host-built
global table whose collision domain is a 16-slot ROW — a 128-byte unit
`table_gather` fetches in one row gather — so a membership test is ONE
gather + 16 lane compares, fully vectorized over millions of
simultaneous queries. There is no probe sequence on device at all.

Layout: the table is an int64 array [rows * 16]; a key k lands in row
`h(k) = ((k * M) >> 32) & (rows - 1)` (multiplicative hashing; the
masked result bits lie below bit 31, so the signed device arithmetic
and the unsigned host arithmetic agree). Each slot holds
`(key << PAYLOAD_BITS) | payload` (payload: a small int, e.g. the
directed-edge multiplicity for LCC); empty slots hold -1, which can
never collide with a packed key.

Overflow policy: at the default fill (mean 4 keys per 16-slot row) the
probability a row receives > 16 keys is ~1e-6 — a handful of keys on a
30M-edge graph. Those keys are simply LEFT OUT of the table and
returned to the caller, which handles them exactly on the host
(graphtpu/ops/triangles.py patches their triangles after the sweep).
Keeping the device path single-gather beats a secondary-table probe
that would double every query's cost for a 1e-6 event.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PAYLOAD_BITS = 2
_PAYLOAD_MASK = (1 << PAYLOAD_BITS) - 1
_SLOTS = 16  # one 128-byte table_gather row

_M1 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / phi


class EdgeHash(NamedTuple):
    table: jax.Array               # int64 [rows * 16]
    rows: int


def _host_hash(keys_u64: np.ndarray, rows: int) -> np.ndarray:
    prod = keys_u64 * _M1  # uint64 wrap-around
    return ((prod >> np.uint64(32)) & np.uint64(rows - 1)).astype(np.int64)


def build_edge_hash(
    keys: np.ndarray, payload: np.ndarray, fill: float = 0.25
) -> Tuple[EdgeHash, np.ndarray]:
    """Build a membership table for int64 `keys` (non-negative, unique,
    < 2^(63 - PAYLOAD_BITS)) with per-key `payload` ints < 2^PAYLOAD_BITS.

    `fill` is the target mean slot occupancy (0.25 → mean 4 keys per
    16-slot row). Returns (EdgeHash, spilled) where `spilled` is a bool
    mask of keys that did NOT fit (P ~ 1e-6 per key at default fill) —
    the caller must handle those out of band."""
    keys = np.asarray(keys, dtype=np.int64)
    payload = np.asarray(payload, dtype=np.int64)
    packed = (keys << PAYLOAD_BITS) | payload

    rows = 1 << max(
        3, int(np.ceil(np.log2(max(len(keys), 1) / (_SLOTS * fill) + 1)))
    )
    h = _host_hash(keys.astype(np.uint64), rows)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    idx = np.arange(hs.shape[0], dtype=np.int64)
    rank = np.zeros(hs.shape[0], dtype=np.int64)
    if hs.shape[0]:
        new_run = np.concatenate([[True], hs[1:] != hs[:-1]])
        rank = idx - np.maximum.accumulate(np.where(new_run, idx, 0))
    fits = rank < _SLOTS
    table = np.full(rows * _SLOTS, -1, dtype=np.int64)
    table[hs[fits] * _SLOTS + rank[fits]] = packed[order][fits]
    spilled = np.zeros(keys.shape[0], dtype=bool)
    spilled[order[~fits]] = True
    return EdgeHash(jnp.asarray(table), rows), spilled


def probe_edge_hash(eh: EdgeHash, keys: jax.Array):
    """Vectorized membership test: keys int64 (any shape) → (found bool,
    payload int32). Unknown keys return (False, 0)."""
    table2d = eh.table.reshape(eh.rows, _SLOTS)
    # signed int64 multiply wraps like uint64; the masked result bits
    # (< bit 31) are unaffected by the arithmetic shift's sign fill
    m = jnp.int64(np.int64(_M1.astype(np.int64)))
    h = ((keys * m) >> 32) & (eh.rows - 1)
    fetched = table2d[h]                          # keys.shape + (16,) row gather
    # empty slots (-1) keep -1 under the arithmetic shift and can never
    # equal a non-negative key
    match = (fetched >> PAYLOAD_BITS) == keys[..., None]
    found = jnp.any(match, axis=-1)
    payload = jnp.sum(
        jnp.where(match, (fetched & _PAYLOAD_MASK).astype(jnp.int32), 0), axis=-1
    )
    return found, payload


jax.tree_util.register_pytree_node(
    EdgeHash,
    lambda e: ((e.table,), (e.rows,)),
    lambda aux, c: EdgeHash(c[0], aux[0]),
)
