"""Decompose LCC's probe cost on the chip (VERDICT r3 #2).

Round 3's first LCC measurement ran at ~182 ns/padded probe vs the
16 ns/probe hash-row roof (11x off). This script isolates each layer so
the gap is attributed, not guessed:

  1. raw row gather  — table[h] for random h, by table size (the
     "hashrow_ns" rate itself, re-derived per VERDICT #2)
  2. full probe      — probe_edge_hash_xy (gather + lane compare + sum)
  3. wedge chunk     — _wedge_chunk_pairs / _wedge_chunk (probe + credit
     reconstruction takes)
  4. bucket scan     — _wedge_bucket (chunk + lax.scan step overhead),
     swept over _CHUNK_ELEMS via GRAPHTPU_LCC_CHUNK_ELEMS

Run exclusively (one chip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np
import graphtpu  # noqa: F401
import jax
import jax.numpy as jnp

from graphtpu.ops import edgehash
from graphtpu.ops.edgehash import EdgeHash, probe_edge_hash_xy


def fence(x):
    return float(jnp.max(x))


def timed(fn, reps=3):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


N_PROBES = 1 << 22

SKIP1 = os.environ.get("LCCPB_SKIP1", "")
print("== 1. raw row gather (table[h] -> [N,128] -> lane0 sum) ==", flush=True)
rng = np.random.default_rng(0)
h_host = rng.integers(0, 1 << 21, size=N_PROBES)


@jax.jit
def row_gather_sum(table, h):
    return jnp.sum(table[h][:, 0], dtype=jnp.int32)


for rows_log2 in () if SKIP1 else (14, 17, 19, 21):  # 8MB..1GB tables
    rows = 1 << rows_log2
    table = jnp.zeros((rows, 128), jnp.int32)
    h = jnp.asarray((h_host & (rows - 1)).astype(np.int32))
    dt = timed(lambda: fence(row_gather_sum(table, h)))
    print(f"  rows=2^{rows_log2} ({rows*512/2**20:6.0f} MB): "
          f"{dt/N_PROBES*1e9:6.2f} ns/row", flush=True)
    del table

print("== 2. full probe_edge_hash_xy by table size ==", flush=True)
ID_BITS = 20


from functools import partial


@partial(jax.jit, static_argnames=("rows",))
def probe_sum(table, rows, x, y):
    eh = EdgeHash(table, rows)
    found, m = probe_edge_hash_xy(eh, x, y, ID_BITS)
    return jnp.sum(jnp.where(found, m, 0), dtype=jnp.int32)


x_h = rng.integers(0, 1 << ID_BITS, size=N_PROBES).astype(np.int32)
y_h = rng.integers(0, 1 << ID_BITS, size=N_PROBES).astype(np.int32)
x_d, y_d = jnp.asarray(x_h), jnp.asarray(y_h)
for rows_log2 in (14, 17, 19, 21):
    rows = 1 << rows_log2
    keys = rng.integers(0, 1 << 40, size=rows * 16).astype(np.int64)
    keys = np.unique(keys)
    ehash, _ = edgehash.build_edge_hash(keys, np.ones_like(keys), fill=0.25)
    # force the table to the requested size by rebuilding at exact rows
    dt = timed(lambda: fence(probe_sum(ehash.table, ehash.rows, x_d, y_d)))
    print(f"  rows=2^{int(np.log2(ehash.rows))} "
          f"({ehash.rows*512/2**20:6.0f} MB): {dt/N_PROBES*1e9:6.2f} ns/probe",
          flush=True)
    del ehash

print("== 3/4. wedge bucket scan at LCC shapes ==", flush=True)
from graphtpu.ops.triangles import _pair_tables, _wedge_bucket

# LCC-scale table: ~29M oriented edges at fill 0.25 -> 2^21 rows (1 GB)
keys = rng.integers(0, 1 << 40, size=29_000_000).astype(np.int64)
keys = np.unique(keys)
ehash, _ = edgehash.build_edge_hash(keys, np.ones_like(keys), fill=0.25)
print(f"  table: rows=2^{int(np.log2(ehash.rows))} "
      f"({ehash.rows*512/2**20:.0f} MB)", flush=True)

for w, r_pad in ((64, 1 << 14), (256, 1 << 11)):
    pairs = _pair_tables(w)
    n_pairs = w * (w - 1) // 2
    slab = jnp.asarray(
        rng.integers(0, 1 << ID_BITS, size=(w, r_pad)).astype(np.int32)
    )
    mslab = jnp.ones((w, r_pad), jnp.int32)
    probes = n_pairs * r_pad
    for chunk_elems in (1 << 18, 1 << 20, 1 << 22):
        rc = max(1, chunk_elems // (w * w))
        if r_pad % rc:
            continue

        def run(rc=rc):
            u, e = _wedge_bucket(slab, mslab, ehash, ID_BITS, rc, pairs=pairs)
            return fence(u) + fence(e)

        dt = timed(run, reps=2)
        print(f"  W={w:4d} R={r_pad} Rc={rc:6d} (chunk=2^{int(np.log2(chunk_elems))}): "
              f"{dt:7.3f} s  {dt/probes*1e9:7.2f} ns/probe "
              f"({r_pad//rc} scan steps)", flush=True)

print("== square vs pairs at W=64 ==", flush=True)
w, r_pad = 64, 1 << 14
slab = jnp.asarray(rng.integers(0, 1 << ID_BITS, size=(w, r_pad)).astype(np.int32))
mslab = jnp.ones((w, r_pad), jnp.int32)
for mode, pr in (("pairs", _pair_tables(w)), ("square", None)):
    rc = max(1, (1 << 20) // (w * w))
    probes = (w * (w - 1) // 2 if mode == "pairs" else w * w) * r_pad

    def run(pr=pr, rc=rc):
        u, e = _wedge_bucket(slab, mslab, ehash, ID_BITS, rc, pairs=pr)
        return fence(u) + fence(e)

    dt = timed(run, reps=2)
    print(f"  {mode:6s}: {dt:7.3f} s  {dt/probes*1e9:7.2f} ns/probe", flush=True)

print("== sorted probes A/B (W=64, chunk=2^20) ==", flush=True)
for sort_probes in (False, True):
    rc = max(1, (1 << 20) // (w * w))
    probes = (w * (w - 1) // 2) * r_pad

    def run(sp=sort_probes, rc=rc):
        u, e = _wedge_bucket(slab, mslab, ehash, ID_BITS, rc,
                             pairs=_pair_tables(w), sort_probes=sp)
        return fence(u) + fence(e)

    dt = timed(run, reps=2)
    print(f"  sort={sort_probes}: {dt:7.3f} s  {dt/probes*1e9:7.2f} ns/probe",
          flush=True)
