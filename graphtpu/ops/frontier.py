"""Device-side compacted frontier/active-set engine with static capacities.

The host-driven active-set drivers (graphtpu/ops/active.py, hybrid
BFS/SSSP) round-trip ids and sliced streams between host and device
every iteration. That is fine on PCIe hosts but catastrophically slow
through this environment's TPU relay (~1 MB/s), and even on real
hardware it costs one dispatch per iteration. This module keeps the
whole sparse-activity machinery ON DEVICE under `jit`:

* a frontier is a fixed-capacity id buffer `ids [K]` (padded with n)
  plus a count — `jnp.nonzero(mask, size=K, fill_value=n)` compacts a
  dense mask into it without leaving the device;
* `expand` turns a frontier into its concatenated adjacency slices with
  a fixed edge capacity E: segment starts by exclusive-cumsum of
  degrees, slot→row mapping by scatter-at-starts + cummax (the standard
  vectorized `repeat`), neighbor ids by one table_gather at the
  computed global positions;
* callers guard with `fits` (count ≤ K and edges ≤ E) and fall back to
  their dense full-graph step via `lax.cond` when a frontier exceeds
  the static capacities — both branches compile once, the TPU executes
  only the taken branch.

This is the TPU-native replacement for dynamic frontier queues: all
shapes static, one compiled program, data-dependent control flow in
`lax.cond`/`lax.while_loop` instead of host Python.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from graphtpu.ops.gather import table_gather


class Expansion(NamedTuple):
    rows_local: jax.Array   # [E] int32 — frontier-slot index owning each edge slot
    row_ids: jax.Array      # [E] int32 — vertex id owning each edge slot
    neigh: jax.Array        # [E] int32 — neighbor vertex id (0 where invalid)
    gpos: jax.Array         # [E] int32 — global edge-stream position (0 if invalid)
    seg_starts: jax.Array   # [K+1] int32 — exclusive cumsum of frontier degrees
    edge_count: jax.Array   # scalar int32 — real edges (slots >= this are pad)
    valid: jax.Array        # [E] bool — slot holds a real edge


def mask_status(mask: jax.Array, deg: jax.Array, nnz=None):
    """(count, edge-sum) of a frontier/changed mask in ONE n-sized
    reduction: each masked element contributes (1 << 38) + its degree
    to a packed int64 sum. Two separate reductions cost two full passes
    over the mask inside a while_loop body; this is the round-5
    step-floor fusion (VERDICT r4 #3) shared by the adaptive
    BFS/WCC/CDLP/SSSP status checks. `nnz` (static total edge count,
    the bound on any masked degree sum) gates the packing: without it,
    or when the int32 RESULT contract could overflow (nnz >= 2^31 —
    the same bound the two-reduction path has always had) or rows >=
    2^25, falls back to two reductions. GRAPHTPU_FUSED_STATUS=0 forces
    the two-reduction path (escape hatch: the packed reduce is int64,
    which TPUs emulate — correct everywhere and one pass instead of
    two, but if a measured regression ever shows up the switch flips
    without a code change)."""
    import os as _os

    n = mask.shape[0]
    if (
        nnz is not None
        and nnz < (1 << 31)
        and n < (1 << 25)
        and _os.environ.get("GRAPHTPU_FUSED_STATUS", "1") != "0"
    ):
        packed = jnp.sum(
            jnp.where(mask, deg.astype(jnp.int64) + (1 << 38), 0),
            dtype=jnp.int64,
        )
        return (
            (packed >> 38).astype(jnp.int32),
            (packed & ((1 << 38) - 1)).astype(jnp.int32),
        )
    cnt = jnp.sum(mask, dtype=jnp.int32)
    es = jnp.sum(jnp.where(mask, deg, 0), dtype=jnp.int32)
    return cnt, es


def compact(mask: jax.Array, k: int):
    """Dense bool mask [n] → (ids [K] padded with n, count).

    Sort-based: jnp.nonzero(size=...) lowers through a variadic
    reduce-window prefix pass that blows the TPU's scoped-vmem budget
    when fused into a large loop body; a masked full sort + static slice
    lowers cleanly at the measured sort rate (roofline.RATES_TPU sort_ns,
    ~0.4 ns/element)."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    ids = jnp.sort(jnp.where(mask, idx, jnp.int32(n)))
    if n >= k:
        ids = ids[:k]
    else:
        ids = jnp.concatenate([ids, jnp.full((k - n,), n, jnp.int32)])
    return ids, jnp.sum(mask, dtype=jnp.int32)


def expand(ids: jax.Array, deg_pad: jax.Array, indptr_pad: jax.Array,
           neigh: jax.Array, e_cap: int, with_row_ids: bool = True) -> Expansion:
    """Concatenate the adjacency slices of `ids` into [e_cap] slots.

    `deg_pad`/`indptr_pad` must be [n+1]-sized with deg_pad[n] == 0 so
    the id padding value n reads as an empty slice. Edges beyond e_cap
    are truncated — callers must pre-check `edge_count <= e_cap`.

    E-sized gathers are the cost (2.6 ns/idx): the global position is
    computed from ONE K-sized delta table (delta[k] = indptr[ids[k]] -
    starts[k], so gpos = delta[rows_local] + slot) instead of separate
    starts/indptr gathers, and `with_row_ids=False` skips the vertex-id
    gather for consumers that only need neighbors (BFS claims levels by
    neighbor, not by owner) — 2 E-sized gathers per expansion instead
    of the naive 4."""
    k = ids.shape[0]
    lens = table_gather(deg_pad, ids)                      # [K]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)]
    )                                                      # [K+1] exclusive
    total = starts[-1]
    # slot -> owning frontier slot: scatter each NONEMPTY row's index at
    # its start, then cummax. Empty rows share their start with the next
    # nonempty row and must not be scattered; two nonempty rows can never
    # share a start.
    marks = (
        jnp.full((e_cap,), -1, jnp.int32)
        .at[starts[:-1]]
        .max(jnp.where(lens > 0, jnp.arange(k, dtype=jnp.int32), -1), mode="drop")
    )
    rows_local = jnp.clip(jax.lax.cummax(marks), 0, k - 1)  # [E]
    slot = jnp.arange(e_cap, dtype=jnp.int32)
    valid = slot < total
    row_ids = table_gather(ids, rows_local) if with_row_ids else None
    delta = table_gather(indptr_pad, ids) - starts[:-1]     # [K]
    gpos = jnp.where(valid, table_gather(delta, rows_local) + slot, 0)
    nb = table_gather(neigh, gpos)
    return Expansion(
        rows_local, row_ids, jnp.where(valid, nb, 0), gpos, starts, total, valid
    )


def compact_stream(vals: jax.Array, active: jax.Array, k: int, n: int):
    """Unique active values of a stream → (ids [K] padded with n, count).

    Sort-based dedupe: two sorts of the [E] stream (roofline sort_ns,
    ~0.4 ns/element),
    versus a dense-mask scatter (measured 1.4-4.3 ns/element for
    scatter-min at 2^18-2^20 indices, scripts/perf/scatter_bench.py) —
    compaction also keeps the downstream update K-sized."""
    s = jnp.sort(jnp.where(active, vals, jnp.int32(n)))
    first = jnp.concatenate(
        [s[:1] < n, (s[1:] != s[:-1]) & (s[1:] < n)]
    )
    ids = jnp.sort(jnp.where(first, s, jnp.int32(n)))
    e = ids.shape[0]
    if e >= k:
        ids = ids[:k]
    else:
        ids = jnp.concatenate([ids, jnp.full((k - e,), n, jnp.int32)])
    return ids, jnp.sum(first, dtype=jnp.int32)


def frontier_deg_sum(ids: jax.Array, deg_pad: jax.Array):
    """Σ deg over a compacted frontier (padding ids read deg 0). If the
    frontier was truncated (count > K), the sum is a lower bound — callers
    must also check count <= K."""
    return jnp.sum(table_gather(deg_pad, ids), dtype=jnp.int32)


def scatter_frontier(mask_cap: int, neigh: jax.Array, active: jax.Array):
    """Mark `neigh[active]` in a dense bool mask of size mask_cap (ids
    equal to mask_cap are dropped)."""
    idx = jnp.where(active, neigh, mask_cap)
    return jnp.zeros((mask_cap,), bool).at[idx].set(True, mode="drop")
