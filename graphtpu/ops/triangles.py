"""Degree-oriented wedge enumeration for LCC — the scalable triangle path.

The membership-sweep LCC (graphtpu/algorithms/lcc.py) enumerates, per
directed A-edge, the smaller endpoint's full neighborhood: Σ min(du, dw)
probes — ~45G probes at RMAT s20/ef32, infeasible. The classical fix is
degree orientation: direct every symmetrized edge from its lower-ranked
endpoint to its higher-ranked one (rank = (degree, id)); every triangle
then contains exactly one wedge (u → x, u → y) with an oriented edge
x → y, so enumerating out-out wedge pairs and testing x → y membership
counts each triangle exactly once. Out-degrees after orientation are
bounded (1015 at s20/ef32 vs raw max degree ~131k), giving
W+ = Σ d+(d+−1)/2 ≈ 4.24G wedges — a ~10x work reduction, with each
membership test one hash-row gather (graphtpu/ops/edgehash.py) instead
of a log(deg) binary search.

Kernel shape: rows bucketed by d+ into padded slabs [W, R]; a chunk
processes the full [W, W, Rc] pair square (upper triangle masked).
The square costs 2x the probes of a pair list but makes every credit
reduction a plain axis sum — no scans, no scatters, no gathers beyond
the probe itself.

Graphalytics/LAGraph_lcc semantics (lcc.cpp:61-70, numerator = directed
A-edges between distinct neighbors): each corner of a found triangle
{u, x, y} is credited with the stored-direction multiplicity (1 or 2) of
its OPPOSITE edge — u gets mult(x,y) (the hash payload), x gets
mult(u,y) (the j-leg), y gets mult(u,x) (the i-leg). x/y credits are
per-(slot, row) sums, i.e. per oriented edge; they aggregate to vertices
with static permutations + one segment-sum over the head-sorted edge
stream (no scatters).

Vertex ids are RELABELED by rank on the host so that id order == rank
order: every adjacency list is then simultaneously sorted by id and by
rank, and orientation is simply "smaller id → larger id".
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.core.types import INT32_INF
from graphtpu.ops import edgehash
from graphtpu.ops.edgehash import EdgeHash, probe_edge_hash_xy

# pair-square elements per scan step (LEGACY pairs/square kernels). The
# probe's fetched tensor carries a 16-slot minor axis that tile-pads to
# 128 lanes (8x), so the live intermediate is ~128 * 8B * this — keep it
# a few hundred MB.
_CHUNK_ELEMS = 1 << 18

# rowblock kernel tiling: probes per inner scan step (pc * rc) and the
# row-block width cap. 2^18 measured fastest at W=64 (12.4 ns/probe vs
# 17 at 2^20, scripts/perf/lcc_probe_bench.py); rc cap 2048 bounds both
# row padding (< rc wasted rows per bucket) and the [W, rc] credit
# accumulators.
import os as _os

_CHUNK_PROBES = int(_os.environ.get("GRAPHTPU_LCC_CHUNK_PROBES", 1 << 18))
_ROWBLOCK_RC_CAP = int(_os.environ.get("GRAPHTPU_LCC_RC_CAP", 1 << 11))

_WEDGE_BUCKETS = (
    2, 4, 8, 16, 32, 64, 128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
)


def _optimal_bucket_bounds(d_plus: np.ndarray, k: int = 0) -> list:
    """DP-optimal wedge-bucket upper bounds for THIS graph's oriented
    out-degree histogram: choose ≤ k boundaries minimizing the padded
    pair-list probe count Σ_b rows_b · W_b(W_b−1)/2. Measured at RMAT
    s20/ef32: 6.28G → 4.75G padded probes (−24%) vs the static ladder at
    the same bucket count — and since every bucket's kernel is already
    shape-specialized per graph ([W, R_pad] differs anyway), per-graph
    boundaries cost no extra compiles. Small graphs whose distinct
    degrees number ≤ k get exact (zero-padding) buckets.

    `GRAPHTPU_LCC_BUCKETS=static` restores the fixed ladder (A/B);
    `GRAPHTPU_LCC_BUCKET_K` overrides the bucket budget (default 16)."""
    import os as _os

    from graphtpu.ops.slab import optimal_bucket_bounds

    if _os.environ.get("GRAPHTPU_LCC_BUCKETS", "") == "static":
        return list(_WEDGE_BUCKETS)
    k = k or int(_os.environ.get("GRAPHTPU_LCC_BUCKET_K", "16"))
    return optimal_bucket_bounds(d_plus, k=k, kind="pairs", lo=1)


class WedgeBucket(NamedTuple):
    rows: np.ndarray          # [R] host int64 ranked center ids
    slab: jax.Array           # [W, R_pad] int32 out-neighbor ranked ids, -1 pad
    mslab: jax.Array          # [W, R_pad] int32 edge multiplicities, 0 pad
    r_real: int
    chunk_cols: int           # Rc


class WedgePlan(NamedTuple):
    buckets: tuple
    n: int
    id_bits: int
    deg_s: np.ndarray         # [n] symmetrized degree (original ids)
    rank: np.ndarray          # [n] original id -> ranked id
    ehash: EdgeHash
    # head-sorted aggregation of per-edge credits:
    edge_pos: Optional[jax.Array]    # [M] flat positions of real slab entries
    head_perm: Optional[jax.Array]   # [M] perm into head-sorted order
    head_indptr: Optional[jax.Array] # [n+1] segment starts by head (ranked)
    # host copies for the rare spilled-key patch (ranked ids, (ex,ey) sorted)
    ex: np.ndarray
    ey: np.ndarray
    mult: np.ndarray
    spilled: np.ndarray       # bool mask over the oriented edge stream


@partial(jax.jit, static_argnames=("id_bits",))
def _orient_sort_kernel(eu, ev, mult, rank, id_bits):
    """Rank gathers + orientation + one pair sort on device (~0.4 ns/el) —
    replaces the host argsort that cost minutes at graph scale. Sorts by
    TWO int32 keys instead of one packed int64 key: TPUs emulate s64 as
    s32 pairs, so the packed-key variadic sort doubled both the compare
    cost and the sort scratch and OOMed the chip at RMAT s20/ef32; the
    packed key the hash build needs is recomputed from the sorted pair
    (same order — (ex << id_bits) | ey is monotone in (ex, ey))."""
    from graphtpu.ops.gather import table_gather

    ru = table_gather(rank, eu)
    rv = table_gather(rank, ev)
    ex = jnp.minimum(ru, rv)
    ey = jnp.maximum(ru, rv)
    ex_s, ey_s, m_s = jax.lax.sort((ex, ey, mult), num_keys=2)
    packed = (ex_s.astype(jnp.int64) << id_bits) | ey_s.astype(jnp.int64)
    return packed, m_s, ex_s, ey_s


@partial(jax.jit, static_argnames=("w", "off"))
def _fill_slab_kernel(ey_dev, mult_dev, starts, degs, w, off):
    """Device slab fill for one bucket: two gathers instead of the host
    fancy-index stores. Also emits every entry's head id and its flat
    position in the transposed [W, R_pad] layout (offset by `off`) for
    the edge-credit aggregation; masked entries get INT32_INF heads so a
    global pair sort pushes them past the real entries."""
    from graphtpu.ops.gather import table_gather

    r_pad = starts.shape[0]
    offs = jnp.arange(w, dtype=jnp.int32)
    pos = starts[:, None] + offs[None, :]
    mask = offs[None, :] < degs[:, None]
    safe = jnp.where(mask, pos, 0)
    slab = jnp.where(mask, table_gather(ey_dev, safe), -1)
    mslab = jnp.where(mask, table_gather(mult_dev, safe), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (r_pad, w), 0)
    tpos = offs[None, :] * r_pad + rr + off
    heads = jnp.where(mask, slab, INT32_INF)
    tpos = jnp.where(mask, tpos, 0)
    return slab.T, mslab.T, heads.reshape(-1), tpos.reshape(-1)


@jax.jit
def _head_sort_kernel(heads, tpos):
    """Global (head, position) pair sort; INT32_INF sentinel heads (slab
    padding) sort last and are sliced off by the static real count."""
    return jax.lax.sort((heads, tpos), num_keys=1)


class WedgeCapacityError(ValueError):
    """Oriented out-degree exceeds the largest wedge bucket — the only
    condition under which lcc_impl=auto may fall back to the membership
    sweep (a bare ValueError catch would downgrade real bugs anywhere in
    the pipeline to a silent sweep fallback)."""


_WEDGE_CACHE_VERSION = 2


def _wedge_cache_file(cache_dir, graph):
    from pathlib import Path

    name = getattr(graph, "name", None)
    if cache_dir is None or not name:
        return None
    return Path(cache_dir) / name / "wedge-v2.npz"


def _load_oriented_cache(cache_dir, graph):
    """Oriented edge list + rank from the ingest cache (skip-if-exists
    contract of load-graph.sh:50-67 applied to LCC prep)."""
    f = _wedge_cache_file(cache_dir, graph)
    if f is None or not f.exists():
        return None
    from graphtpu.utils.logging import get_logger

    try:
        with np.load(f) as z:
            if (
                int(z["version"]) != _WEDGE_CACHE_VERSION
                or int(z["n"]) != graph.n
                or int(z["nnz"]) != graph.nnz
            ):
                get_logger("lcc").warning("wedge cache %s incompatible — ignoring", f)
                return None
            out = (
                z["ex"].astype(np.int64),
                z["ey"].astype(np.int64),
                z["mult"].astype(np.int64),
                z["rank"].astype(np.int64),
                z["deg_s"].astype(np.int64),
            )
        get_logger("lcc").info("wedge cache hit: %s", f)
        return out
    except Exception as e:  # corrupt/truncated cache — rebuild
        get_logger("lcc").warning("wedge cache %s unreadable (%s) — rebuilding", f, e)
        return None


def _save_oriented_cache(cache_dir, graph, ex, ey, mult, rank, deg_s):
    f = _wedge_cache_file(cache_dir, graph)
    if f is None:
        return
    f.parent.mkdir(parents=True, exist_ok=True)
    tmp = f.with_suffix(".tmp.npz")
    # UNCOMPRESSED: zlib decompress cost 6.6 s of every warm prep at
    # s20/ef32 (round-5 profile) vs ~1 s raw read; the ~290 MB on disk
    # is ingest-cache territory (load-graph.sh keeps .grb/.vtb too)
    np.savez(
        tmp,
        version=_WEDGE_CACHE_VERSION,
        n=graph.n,
        nnz=graph.nnz,
        ex=ex.astype(np.int32),
        ey=ey.astype(np.int32),
        mult=mult.astype(np.int8),
        rank=rank.astype(np.int32),
        deg_s=deg_s.astype(np.int32),
    )
    tmp.replace(f)
    from graphtpu.utils.logging import get_logger

    get_logger("lcc").info("wedge cache written: %s", f)


def prepare_wedge_plan(graph, cache_dir=None) -> WedgePlan:
    """Wedge-plan prep: symmetrize + dedupe with stored-direction
    multiplicity (host — the input stream is nearly sorted so the linear
    passes dominate), then rank-relabel, orient, sort, hash-build, slab
    fill, and head-sort ALL ON DEVICE (sorts ~0.4 ns/el vs minutes of
    single-core numpy argsort at graph scale). With `cache_dir`, the
    oriented edge list is persisted per graph and restored on repeat
    runs (ingest skip-if-exists contract)."""
    n = graph.n
    id_bits = max(int(max(n - 1, 1)).bit_length(), 1)

    import os as _os
    import time as _time

    _trace_on = bool(_os.environ.get("GRAPHTPU_LCC_PREP_TRACE"))
    _t = [_time.perf_counter()]

    def _trace(label):
        if _trace_on:
            now = _time.perf_counter()
            print(f"[lcc-prep] {label}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    cached = _load_oriented_cache(cache_dir, graph)
    if cached is not None:
        ex, ey, mult, rank, deg_s = cached
        _trace("oriented-cache load")
        # transfer int32 and pack on device: int64 H2D of ex/ey doubles
        # the transfer bytes for no reason (round-5 profile: 3.3 s)
        mult_d = jnp.asarray(mult.astype(np.int32))
        ex32 = jnp.asarray(ex.astype(np.int32))
        ey32 = jnp.asarray(ey.astype(np.int32))
        packed = (ex32.astype(jnp.int64) << id_bits) | ey32.astype(
            jnp.int64
        )
        _trace("H2D + pack")
    else:
        s, d = graph.src, graph.dst
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d).astype(np.int64)
        hi = np.maximum(s, d).astype(np.int64)
        key = (lo << id_bits) | hi
        key.sort()  # pull-ordered input is nearly sorted — cheap on host
        is_first = np.ones(key.shape[0], dtype=bool)
        is_first[1:] = key[1:] != key[:-1]
        uniq = key[is_first]
        # Graph dedupes directed pairs, so multiplicity per pair is 1 or 2
        first_pos = np.nonzero(is_first)[0]
        mult = np.diff(np.concatenate([first_pos, [key.shape[0]]])).astype(np.int64)

        eu = (uniq >> id_bits).astype(np.int64)
        ev = (uniq & ((1 << id_bits) - 1)).astype(np.int64)
        deg_s = (
            np.bincount(eu, minlength=n) + np.bincount(ev, minlength=n)
        ).astype(np.int64)

        # rank relabel: id order == (degree, id) order
        order_v = np.lexsort((np.arange(n), deg_s))
        rank = np.empty(n, dtype=np.int64)
        rank[order_v] = np.arange(n, dtype=np.int64)

        packed, mult_d, ex32, ey32 = _orient_sort_kernel(
            jnp.asarray(eu.astype(np.int32)),
            jnp.asarray(ev.astype(np.int32)),
            jnp.asarray(mult.astype(np.int32)),
            jnp.asarray(rank.astype(np.int32)),
            id_bits,
        )
        ex = np.asarray(ex32).astype(np.int64)
        ey = np.asarray(ey32).astype(np.int64)
        mult = np.asarray(mult_d).astype(np.int64)
        _save_oriented_cache(cache_dir, graph, ex, ey, mult, rank, deg_s)
        _trace("host dedupe + device orient/sort + cache save")

    d_plus = np.bincount(ex, minlength=n).astype(np.int64)
    indptr_o = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d_plus, out=indptr_o[1:])
    _trace("d+ histogram")

    # mean slot occupancy of the membership table: 0.25 -> 1.07 GB at
    # RMAT s20/ef32; 0.5 halves the table (row-overflow P stays ~3e-7
    # per row) and may lift the issue-rate-bound probe throughput
    fill = float(_os.environ.get("GRAPHTPU_LCC_HASH_FILL", "0.25"))
    ehash, spilled = edgehash.build_edge_hash_device(packed, mult_d, fill=fill)
    _trace("edge-hash build")

    # bucket rows (d+ >= 2) into padded slabs (device gathers); collect
    # every real entry's (head, transposed flat position) for the
    # edge-credit aggregation
    buckets = []
    heads_parts, tpos_parts = [], []
    m_real = 0
    flat_offset = 0
    prev = 1  # rows with d+ < 2 generate no wedges
    max_dp = int(d_plus.max()) if n else 0
    if max_dp > _WEDGE_BUCKETS[-1]:
        raise WedgeCapacityError(
            f"oriented out-degree {max_dp} exceeds the largest wedge bucket "
            f"{_WEDGE_BUCKETS[-1]}"
        )
    bounds = _optimal_bucket_bounds(d_plus)
    for w in bounds:
        if prev >= max_dp:
            break
        sel = np.nonzero((d_plus > prev) & (d_plus <= w))[0]
        prev = w
        if sel.size == 0:
            continue
        r = sel.shape[0]
        n_pairs = w * (w - 1) // 2
        # row-block width: >= 128 lanes whenever the bucket has the rows
        # (full tiles — the rowblock kernel's whole point), sized so one
        # inner step carries ~_CHUNK_PROBES probes for small-W buckets
        # (few pairs -> wide blocks, fewer scan steps) but pinned near
        # 128 for wide buckets, where bigger blocks only add row padding
        # (a 1099-row W=625 bucket at rc=2048 padded 86%; at 128, 4.6%)
        target = max(128, _CHUNK_PROBES // max(n_pairs, 1))
        target = 1 << (target.bit_length() - 1)
        rc = min(
            _ROWBLOCK_RC_CAP,
            target,
            1 << max(0, int(np.ceil(np.log2(max(r, 1))))),
        )
        r_pad = -(-r // rc) * rc
        starts = np.zeros(r_pad, dtype=np.int32)
        degs = np.zeros(r_pad, dtype=np.int32)
        starts[:r] = indptr_o[sel]
        degs[:r] = d_plus[sel]
        slab_t, mslab_t, heads, tpos = _fill_slab_kernel(
            ey32, mult_d, jnp.asarray(starts), jnp.asarray(degs), w, flat_offset
        )
        heads_parts.append(heads)
        tpos_parts.append(tpos)
        m_real += int(d_plus[sel].sum())
        flat_offset += w * r_pad
        buckets.append(WedgeBucket(sel, slab_t, mslab_t, r, rc))
    _trace("slab fills")

    edge_pos = head_perm = head_indptr = None
    if heads_parts:
        heads_all = jnp.concatenate(heads_parts)
        tpos_all = jnp.concatenate(tpos_parts)
        _, pos_sorted = _head_sort_kernel(heads_all, tpos_all)
        edge_pos = pos_sorted[:m_real]  # already head-sorted — no perm
        # per-head entry counts: every oriented edge whose tail has
        # d+ >= 2 contributes exactly one slab entry to its head
        hip = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(ey[d_plus[ex] > 1], minlength=n), out=hip[1:]
        )
        head_indptr = jnp.asarray(hip.astype(np.int32))
    _trace("head sort + indptr")

    return WedgePlan(
        tuple(buckets), n, id_bits, deg_s, rank, ehash,
        edge_pos, head_perm, head_indptr,
        ex, ey, mult, spilled,
    )


def _patch_spilled(plan: WedgePlan, numerator_ranked: np.ndarray) -> None:
    """Exact host-side accounting for the rare keys the 64-slot hash rows
    could not hold (row-overflow ~3e-20 at the default fill, ~2e-7 at
    fill=0.5): every triangle whose CLOSING edge
    (x, y) spilled was probe-missed; its apex set is in+(x) ∩ in+(y)."""
    sp = np.nonzero(plan.spilled)[0]
    if sp.size == 0:
        return
    ex, ey, mult = plan.ex, plan.ey, plan.mult
    keys = (ex << plan.id_bits) | ey           # ascending (lexsorted stream)
    # in+-lists: tails grouped by head
    by_head = np.argsort(ey, kind="stable")
    tails = ex[by_head]
    hip = np.zeros(plan.n + 1, dtype=np.int64)
    np.cumsum(np.bincount(ey, minlength=plan.n), out=hip[1:])

    def mult_of(u, v):  # vectorized (u, v) -> stored-direction multiplicity
        k = (np.asarray(u, np.int64) << plan.id_bits) | np.asarray(v, np.int64)
        pos = np.searchsorted(keys, k)
        return mult[pos]

    for e in sp:
        x, y, m_xy = ex[e], ey[e], mult[e]
        us = np.intersect1d(
            tails[hip[x] : hip[x + 1]], tails[hip[y] : hip[y + 1]]
        )
        if us.size == 0:
            continue
        np.add.at(numerator_ranked, us, m_xy)
        numerator_ranked[x] += int(mult_of(us, np.full(us.shape, y)).sum())
        numerator_ranked[y] += int(mult_of(us, np.full(us.shape, x)).sum())


def _pair_tables(w: int):
    """Static upper-triangle pair enumeration for width w: (ii, jj) pair
    legs [P], and the (i, j) -> pair-index square map [w*w] (entries with
    i >= j point at P, a zero pad row) for the take-based credit
    reconstruction."""
    ii, jj = np.triu_indices(w, k=1)
    p = ii.shape[0]
    sq = np.full((w, w), p, dtype=np.int32)
    sq[ii, jj] = np.arange(p, dtype=np.int32)
    return (
        jnp.asarray(ii.astype(np.int32)),
        jnp.asarray(jj.astype(np.int32)),
        jnp.asarray(sq.reshape(-1)),
    )


@partial(jax.jit, static_argnames=("id_bits", "chunk_cols", "sort_probes"))
def _wedge_bucket(slab, mslab, ehash, id_bits, chunk_cols, pairs=None,
                  sort_probes=False):
    """Triangle credits for a whole [W, R_pad] bucket: ONE dispatch, a
    lax.scan over [W, Rc] column chunks (R_pad/Rc chunk bodies per call
    would otherwise each pay dispatch overhead — thousands of calls for
    narrow-Rc buckets). With `pairs` (from _pair_tables) each chunk
    probes only the W(W-1)/2 upper-triangle pair list — half the table
    gathers of the full square. Returns (u_cred [R_pad],
    edge_cred [W, R_pad])."""
    w, r_pad = slab.shape
    t = r_pad // chunk_cols
    # [W, R_pad] -> [T, W, Rc] chunk-major
    slab_t = slab.reshape(w, t, chunk_cols).transpose(1, 0, 2)
    mslab_t = mslab.reshape(w, t, chunk_cols).transpose(1, 0, 2)

    def step(_, sm):
        sub, msub = sm
        if pairs is None:
            u_c, e_c = _wedge_chunk(sub, msub, ehash, id_bits, sort_probes)
        else:
            u_c, e_c = _wedge_chunk_pairs(
                sub, msub, ehash, id_bits, pairs, sort_probes
            )
        return None, (u_c, e_c)

    _, (u_all, e_all) = jax.lax.scan(step, None, (slab_t, mslab_t))
    # [T, Rc] -> [R_pad]; [T, W, Rc] -> [W, R_pad]
    return u_all.reshape(r_pad), e_all.transpose(1, 0, 2).reshape(w, r_pad)


def _wedge_chunk_pairs(sub, msub, ehash, id_bits, pairs, sort_probes=False):
    """Pair-list variant of _wedge_chunk: probes [P, Rc] (upper triangle
    only — the square probes both (i,j) and (j,i) and masks one). The
    per-leg credit sums need pair axes grouped by leg; rather than W
    ragged segment reductions, per-pair contributions are scattered back
    to the [W, W, Rc] square with ONE static take (a cheap linear-rate
    copy vs ~16 ns/el table probes) and summed along an axis."""
    ii, jj, sq = pairs
    w, rc = sub.shape
    x = jnp.take(sub, ii, axis=0)                        # [P, Rc]
    y = jnp.take(sub, jj, axis=0)
    valid = y >= 0                 # slab rows left-packed: y valid => x valid
    found, m_xy = probe_edge_hash_xy(
        ehash, jnp.maximum(x, 0), jnp.maximum(y, 0), id_bits, sort_probes
    )
    hit = found & valid
    u_cred = jnp.sum(jnp.where(hit, m_xy, 0), axis=0, dtype=jnp.int32)  # [Rc]

    mi = jnp.take(msub, ii, axis=0)
    mj = jnp.take(msub, jj, axis=0)
    zrow = jnp.zeros((1, rc), dtype=jnp.int32)
    cx = jnp.concatenate([jnp.where(hit, mj, 0), zrow])  # credit to x (i-leg)
    cy = jnp.concatenate([jnp.where(hit, mi, 0), zrow])  # credit to y (j-leg)
    sq_x = jnp.take(cx, sq, axis=0).reshape(w, w, rc)
    sq_y = jnp.take(cy, sq, axis=0).reshape(w, w, rc)
    x_cred = jnp.sum(sq_x, axis=1, dtype=jnp.int32)      # [W, Rc]
    y_cred = jnp.sum(sq_y, axis=0, dtype=jnp.int32)
    return u_cred, x_cred + y_cred


def _wedge_chunk(sub, msub, ehash, id_bits, sort_probes=False):
    """Triangle credits for one [W, Rc] slab chunk over the full pair
    square. Returns (u_cred [Rc], edge_cred [W, Rc]): edge_cred[(slot,
    row)] is the credit owed to the HEAD of that oriented edge."""
    w = sub.shape[0]
    x = sub[:, None, :]                                  # [W, 1, Rc] i-leg
    y = sub[None, :, :]                                  # [1, W, Rc] j-leg
    ii = jax.lax.broadcasted_iota(jnp.int32, (w, w, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w, w, 1), 1)
    valid = (ii < jj) & (y >= 0)   # slab rows left-packed: y valid => x valid
    xb = jnp.broadcast_to(jnp.maximum(x, 0), (w, w, sub.shape[1]))
    yb = jnp.broadcast_to(jnp.maximum(y, 0), (w, w, sub.shape[1]))
    found, m_xy = probe_edge_hash_xy(ehash, xb, yb, id_bits, sort_probes)
    hit = found & valid

    u_cred = jnp.sum(
        jnp.where(hit, m_xy, 0), axis=(0, 1), dtype=jnp.int32
    )                                                    # [Rc]
    x_cred = jnp.sum(
        jnp.where(hit, msub[None, :, :], 0), axis=1, dtype=jnp.int32
    )                                                    # [W, Rc] i-leg heads
    y_cred = jnp.sum(
        jnp.where(hit, msub[:, None, :], 0), axis=0, dtype=jnp.int32
    )                                                    # [W, Rc] j-leg heads
    return u_cred, x_cred + y_cred


def _pair_list_padded(w: int, pc: int):
    """Upper-triangle pair list padded to a multiple of `pc` with (0, 0)
    sentinels (ii < jj fails, so they mask themselves in the kernel)."""
    ii, jj = np.triu_indices(w, k=1)
    p = ii.shape[0]
    q = -(-max(p, 1) // pc)
    ii_pad = np.zeros(q * pc, dtype=np.int32)
    jj_pad = np.zeros(q * pc, dtype=np.int32)
    ii_pad[:p] = ii
    jj_pad[:p] = jj
    return jnp.asarray(ii_pad), jnp.asarray(jj_pad)


@partial(jax.jit, static_argnames=("id_bits", "rc", "pc", "sort_probes"))
def _wedge_bucket_rowblock(slab, mslab, ehash, id_bits, ii_pad, jj_pad,
                           rc, pc, sort_probes=False):
    """Row-blocked pair-chunk wedge kernel — the round-4 fix for the
    lane-padding collapse that cost LCC 11x (BENCH_r03 lcc_sol_pct 8.8).

    The original _wedge_bucket keeps the whole W(W-1)/2 pair list per
    chunk and shrinks the ROW axis to fit (_CHUNK_ELEMS // W^2): every
    bucket with W >= 512 ran at Rc = 1, so each [P, Rc] probe tensor and
    the [W, W, Rc] credit-square takes padded their minor axis 128x in
    lanes — ~74% of the s20/ef32 padded probes executed at <1% lane
    occupancy (measured 182 ns/probe vs the 16 ns row-fetch roof).

    This kernel inverts the chunking: the ROW axis keeps >= 128 lanes
    (rc) and the PAIR list is scanned in chunks of pc. Each inner step
    probes [pc, rc] (full tiles), and the per-leg credits accumulate by
    ROW-GRANULAR scatter-add (`.at[ii_c].add`) into [W, rc] — one
    128-lane-row operation per pair, i.e. per-probe bookkeeping cost is
    the row-op rate divided by rc. No [W, W, Rc] squares exist at any W.

    Returns (u_cred [r_pad], edge_cred [W, r_pad]) — same contract as
    _wedge_bucket."""
    w, r_pad = slab.shape
    t = r_pad // rc
    q = ii_pad.shape[0] // pc
    slab_t = slab.reshape(w, t, rc).transpose(1, 0, 2)    # [T, W, rc]
    mslab_t = mslab.reshape(w, t, rc).transpose(1, 0, 2)
    ii_q = ii_pad.reshape(q, pc)
    jj_q = jj_pad.reshape(q, pc)

    def row_step(_, sm):
        sub, msub = sm                                    # [W, rc]

        def pair_step(carry, iijj):
            u_acc, x_acc, y_acc = carry
            ii_c, jj_c = iijj                             # [pc]
            x = jnp.take(sub, ii_c, axis=0)               # [pc, rc]
            y = jnp.take(sub, jj_c, axis=0)
            valid = (ii_c < jj_c)[:, None] & (y >= 0)
            found, m_xy = probe_edge_hash_xy(
                ehash, jnp.maximum(x, 0), jnp.maximum(y, 0), id_bits,
                sort_probes,
            )
            hit = found & valid
            u_acc = u_acc + jnp.sum(
                jnp.where(hit, m_xy, 0), axis=0, dtype=jnp.int32
            )
            mi = jnp.take(msub, ii_c, axis=0)
            mj = jnp.take(msub, jj_c, axis=0)
            x_acc = x_acc.at[ii_c].add(jnp.where(hit, mj, 0))
            y_acc = y_acc.at[jj_c].add(jnp.where(hit, mi, 0))
            return (u_acc, x_acc, y_acc), None

        init = (
            jnp.zeros((rc,), jnp.int32),
            jnp.zeros((w, rc), jnp.int32),
            jnp.zeros((w, rc), jnp.int32),
        )
        (u, xc, yc), _ = jax.lax.scan(pair_step, init, (ii_q, jj_q))
        return None, (u, xc + yc)

    _, (u_all, e_all) = jax.lax.scan(row_step, None, (slab_t, mslab_t))
    return u_all.reshape(r_pad), e_all.transpose(1, 0, 2).reshape(w, r_pad)


@partial(jax.jit, static_argnames=())
def _aggregate_heads(edge_cred_flat, edge_pos, head_perm, head_indptr):
    """Gather real slab-entry credits in head order, segment-sum.
    `edge_pos` is already head-sorted by prepare (head_perm is None);
    a not-None head_perm applies a second reorder gather (legacy)."""
    from graphtpu.ops.gather import table_gather
    from graphtpu.ops.scan_reduce import seg_sum_scan

    def chunked_gather(x, idx, chunk=1 << 22):
        # a [M, 128] fetched-row intermediate at M ~ 30M is ~15 GB if the
        # select fails to fuse — keep each gather's window ~2 GB
        m = idx.shape[0]
        if m <= chunk:
            return table_gather(x, idx)
        return jnp.concatenate(
            [table_gather(x, idx[s : s + chunk]) for s in range(0, m, chunk)]
        )

    vals = chunked_gather(edge_cred_flat, edge_pos)
    ordered = vals if head_perm is None else chunked_gather(vals, head_perm)
    # f32 lane sums stay exact (row partials < 2^24); f64 across rows and
    # out keeps hub numerators (which exceed 2^24) exact
    return seg_sum_scan(
        ordered.astype(jnp.float32), head_indptr, out_dtype=jnp.float64
    ).astype(jnp.int64)


def bucket_probe_schedule(bucket, probe_mode, max_dispatch_pairs,
                          pair_cache: dict):
    """Per-bucket probe scheduling shared by the single-chip and
    distributed numerators: returns (use_rowblock, rc, pc, pairs, rpd).

    rowblock (default): rc is the plan's row-block width; pair chunks pc
    are POWER-OF-TWO only (a pc=561 dispatch crashed the TPU worker
    twice, reproducibly); `pairs` is the (ii, jj) list padded to a pc
    multiple. Legacy pairs/square: the biggest power-of-two Rc under the
    old elements budget (divides the plan's r_pad by construction);
    `pairs` is the take-square triple for pairs mode, None for square.
    `rpd` bounds one dispatch's pair volume (a single compiled call that
    runs for minutes trips the TPU worker watchdog)."""
    w, _ = bucket.slab.shape
    n_pairs = w * (w - 1) // 2
    if probe_mode.startswith("rowblock"):
        rc = bucket.chunk_cols
        pc = max(1, min(n_pairs, _CHUNK_PROBES // rc))
        pc = 1 << (pc.bit_length() - 1)
        pairs = pair_cache.get((w, pc))
        if pairs is None:
            pairs = pair_cache[(w, pc)] = _pair_list_padded(w, pc)
        rpd = max(rc, (max_dispatch_pairs // n_pairs) // rc * rc)
        return True, rc, pc, pairs, rpd
    rc_budget = max(1, _CHUNK_ELEMS // (w * w))
    rc = min(1 << (rc_budget.bit_length() - 1), bucket.chunk_cols)
    pairs = None
    if probe_mode.startswith("pairs"):
        pairs = pair_cache.get(w)
        if pairs is None:
            pairs = pair_cache[w] = _pair_tables(w)
    rpd = max(rc, (max_dispatch_pairs // (w * w)) // rc * rc)
    return False, rc, 0, pairs, rpd


def lcc_oriented_numerator(plan: WedgePlan, progress: bool = False) -> np.ndarray:
    """Numerator per ORIGINAL vertex id: Σ over triangles at v of the
    stored-direction multiplicity of the opposite edge."""
    import time as _time

    import os as _os

    n = plan.n
    numerator_ranked = np.zeros(n, dtype=np.int64)
    edge_cred_parts = []
    # row-blocked pair-chunk probing by default (full-lane tiles at every
    # bucket width — _wedge_bucket_rowblock); GRAPHTPU_LCC_PROBE=
    # pairs/square select the legacy whole-pair-list kernels,
    # "*-sorted" issues row gathers in sorted order
    # (edgehash._probe_lanes_sorted locality A/B)
    probe_mode = _os.environ.get("GRAPHTPU_LCC_PROBE", "rowblock")
    sort_probes = probe_mode.endswith("-sorted")
    pair_cache: dict = {}
    max_dispatch_pairs = 1 << 30
    for b in plan.buckets:
        w, r_pad = b.slab.shape
        use_rowblock, rc, pc, pairs, rpd = bucket_probe_schedule(
            b, probe_mode, max_dispatch_pairs, pair_cache
        )
        u_parts, e_parts = [], []
        for r0 in range(0, r_pad, rpd):
            r1 = min(r0 + rpd, r_pad)
            sl = jax.lax.slice_in_dim(b.slab, r0, r1, axis=1)
            ml = jax.lax.slice_in_dim(b.mslab, r0, r1, axis=1)
            if use_rowblock:
                u_c, e_c = _wedge_bucket_rowblock(
                    sl, ml, plan.ehash, plan.id_bits, *pairs, rc, pc,
                    sort_probes=sort_probes,
                )
            else:
                u_c, e_c = _wedge_bucket(
                    sl, ml, plan.ehash, plan.id_bits, rc, pairs,
                    sort_probes=sort_probes,
                )
            u_parts.append(u_c)
            e_parts.append(e_c)
        u_all = jnp.concatenate(u_parts) if len(u_parts) > 1 else u_parts[0]
        e_all = jnp.concatenate(e_parts, axis=1) if len(e_parts) > 1 else e_parts[0]
        t0 = _time.perf_counter()
        numerator_ranked[b.rows] += np.asarray(u_all)[: b.r_real].astype(np.int64)
        if progress:
            print(
                f"[lcc] bucket W={w} R_pad={r_pad}: {_time.perf_counter()-t0:.1f}s",
                flush=True,
            )
        edge_cred_parts.append(e_all.reshape(-1))
    if edge_cred_parts:
        flat = jnp.concatenate(edge_cred_parts)
        head_cred = _aggregate_heads(
            flat, plan.edge_pos, plan.head_perm, plan.head_indptr
        )
        numerator_ranked += np.asarray(head_cred)
    _patch_spilled(plan, numerator_ranked)
    # ranked ids back to original ids
    return numerator_ranked[plan.rank]


def lcc_oriented(graph, cache_dir=None) -> np.ndarray:
    """Local clustering coefficients (float64 per original vertex id).
    The wedge plan is memoized on the Graph so suite repetitions build it
    once; with `cache_dir` the oriented edge list persists across runs."""
    plan = getattr(graph, "_wedge_plan", None)
    if plan is None:
        plan = prepare_wedge_plan(graph, cache_dir=cache_dir)
        graph._wedge_plan = plan
    num = lcc_oriented_numerator(plan).astype(np.float64)
    d = plan.deg_s.astype(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, num / denom, 0.0)
