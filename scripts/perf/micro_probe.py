"""Isolate the LCC probe cost: hash-row gather vs table size vs compare
logic. Run exclusively."""
import time
import numpy as np
import graphtpu  # noqa: F401
import jax
import jax.numpy as jnp
from functools import partial

from graphtpu.ops.edgehash import build_edge_hash, probe_edge_hash_xy
from graphtpu.ops.gather import table_gather


def sync(x):
    return float(jnp.max(x))


M = 1 << 24  # probes per trial
rng = np.random.default_rng(0)
print(f"probes per trial: {M/1e6:.0f}M", flush=True)

# big table: 30M keys like the real run
nkeys = 30_000_000
keys = np.unique(rng.integers(0, 1 << 40, size=nkeys, dtype=np.int64))
payload = np.ones(keys.shape[0], dtype=np.int64)
t0 = time.perf_counter()
eh_big, sp = build_edge_hash(keys, payload)
print(f"big table rows={eh_big.rows} spilled={int(sp.sum())} "
      f"build {time.perf_counter()-t0:.1f}s", flush=True)

x = jnp.asarray(rng.integers(0, 1 << 20, size=M, dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 20, size=M, dtype=np.int32))


@partial(jax.jit, static_argnames=("id_bits",))
def probe_sum(eh, x, y, id_bits):
    f, p = probe_edge_hash_xy(eh, x, y, id_bits)
    return jnp.sum(p) + jnp.sum(f)


def trial(name, fn, *args):
    sync(fn(*args))
    t0 = time.perf_counter()
    sync(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000:8.1f} ms  {dt/M*1e9:6.2f} ns/probe", flush=True)


trial("probe big table ", probe_sum, eh_big, x, y, 20)

# small table: 100k keys
keys_s = np.unique(rng.integers(0, 1 << 40, size=100_000, dtype=np.int64))
eh_small, _ = build_edge_hash(keys_s, np.ones(keys_s.shape[0], dtype=np.int64))
print(f"small table rows={eh_small.rows}", flush=True)
trial("probe small table", probe_sum, eh_small, x, y, 20)

# plain flat table_gather of M indices from a big flat table
flat = jnp.asarray(rng.integers(0, 1 << 30, size=eh_big.rows * 32, dtype=np.int32))
idx = jnp.asarray(rng.integers(0, eh_big.rows * 32, size=M, dtype=np.int32))


@jax.jit
def flat_gather_sum(flat, idx):
    return jnp.sum(table_gather(flat, idx))


trial("flat table_gather", flat_gather_sum, flat, idx)

# raw 32-wide row gather from the big table (no compare logic)
ridx = jnp.asarray(rng.integers(0, eh_big.rows, size=M, dtype=np.int32))


@jax.jit
def row_gather_sum(table, ridx):
    t2 = table.reshape(-1, 32)
    return jnp.sum(t2[ridx], dtype=jnp.int32)


trial("raw [*,32] row gather", row_gather_sum, eh_big.table, ridx)

# 8-wide row fetch comparison (table_gather's own geometry)
@jax.jit
def row8_gather_sum(table, ridx):
    t2 = table.reshape(-1, 8)
    return jnp.sum(t2[ridx], dtype=jnp.int32)


trial("raw [*,8] row gather ", row8_gather_sum, eh_big.table, ridx)
