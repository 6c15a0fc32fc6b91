import time, os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")
import numpy as np
import graphtpu
import jax, jax.numpy as jnp

def sync(x):
    return float(jnp.max(jnp.asarray(x).astype(jnp.float32)))

def best_of(fn, reps=5):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); b = min(b, time.perf_counter() - t0)
    return b

n = 1 << 20
rng = np.random.default_rng(3)
levels = jnp.asarray(rng.integers(0, 100, size=n).astype(np.int32))
nop = jax.jit(lambda v: v + 1); x8 = jnp.arange(8, dtype=jnp.int32)
sync(nop(x8)); t_nop = best_of(lambda: sync(nop(x8)))
print(f"nop {t_nop*1e3:.1f} ms", flush=True)

for logk in (15, 16, 18):
    k = 1 << logk
    ids = jnp.asarray(np.sort(rng.choice(n, size=k, replace=False)).astype(np.int32))
    sc = jax.jit(lambda L, i: L.at[i].set(7, mode="drop"))
    sync(sc(levels, ids)); t = best_of(lambda: sync(sc(levels, ids))) - t_nop
    print(f"scatter-set k=2^{logk}: {t*1e3:.2f} ms = {t/k*1e9:.1f} ns/idx", flush=True)

    # sort-merge equivalent: stable-sort (key, val) pairs, first-per-key
    def merge(L, i):
        key = jnp.concatenate([i, jnp.arange(n, dtype=jnp.int32)])
        val = jnp.concatenate([jnp.full((k,), 7, jnp.int32), L])
        # pack (key, tiebreak, val): id<<1|src keeps ids2 first; carry val via argsort-free pack
        packed = (key.astype(jnp.int64) << 33) | (jnp.arange(key.shape[0], dtype=jnp.int64) << 0)
        order = jnp.argsort(packed)
        ks = key[order]; vs = val[order]
        first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        # kept-first values per id, aligned: positions of first occurrences are exactly n entries (ids 0..n-1)
        out = vs[jnp.nonzero(first, size=n, fill_value=0)[0]]
        return out
    mj = jax.jit(merge)
    sync(mj(levels, ids)); t2 = best_of(lambda: sync(mj(levels, ids))) - t_nop
    ok = np.array_equal(np.asarray(mj(levels, ids)), np.asarray(sc(levels, ids)))
    print(f"merge-scatter k=2^{logk}: {t2*1e3:.2f} ms ({'OK' if ok else 'MISMATCH'})", flush=True)

# scatter-min e-sized (the alternative apply path)
for loge in (18, 20):
    e = 1 << loge
    tgt = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
    scm = jax.jit(lambda L, i: L.at[i].min(3, mode="drop"))
    sync(scm(levels, tgt)); t = best_of(lambda: sync(scm(levels, tgt))) - t_nop
    print(f"scatter-min e=2^{loge}: {t*1e3:.2f} ms = {t/e*1e9:.1f} ns/idx", flush=True)

# sort rates for reference
for logm in (19, 20, 21):
    m = 1 << logm
    v = jnp.asarray(rng.integers(0, 1 << 30, size=m).astype(np.int32))
    sj = jax.jit(jnp.sort)
    sync(sj(v)); t = best_of(lambda: sync(sj(v))) - t_nop
    print(f"sort m=2^{logm}: {t*1e3:.2f} ms = {t/m*1e9:.2f} ns/el", flush=True)
