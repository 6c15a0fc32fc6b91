import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "/root/repo/intermediate/xla-cache")
import numpy as np, graphtpu, jax, jax.numpy as jnp
from functools import partial

def fence(x): return float(jnp.max(x))
def timed(fn, reps=3):
    fn()
    best = float('inf')
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best, time.perf_counter()-t0)
    return best

n = 1 << 20
ITERS = 100

@partial(jax.jit, static_argnames=("variant",))
def loop(x, variant):
    def cond(s): return s[1] < ITERS
    def body(s):
        x, it = s
        if variant == "noop":
            x = x + 1
        elif variant == "reduce":
            x = x + jnp.sum(x, dtype=jnp.int32)        # n-sized reduction
        elif variant == "sort":
            x = jnp.sort(x)                            # n-sized sort
        elif variant == "compact":
            ids = jnp.sort(jnp.where(x > 0, jnp.arange(n, dtype=jnp.int32), n))[:1<<16]
            x = x.at[jnp.minimum(ids, n-1)].add(1, mode="drop")
        elif variant == "gather_small":
            idx = jnp.arange(1 << 18, dtype=jnp.int32) & (n - 1)
            from graphtpu.ops.gather import table_gather
            x = x.at[0].add(jnp.sum(table_gather(x, idx), dtype=jnp.int32))
        return x, it + 1
    x, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
    return x

x0 = jnp.ones((n,), jnp.int32)
for v in ("noop", "reduce", "sort", "compact", "gather_small"):
    dt = timed(lambda v=v: fence(loop(x0, v)))
    print(f"{v:14s}: {dt/ITERS*1e6:9.1f} us/iter", flush=True)

# nested: phases like the adaptive kernels (2-level while loop)
@jax.jit
def nested(x):
    def outer_cond(s): return s[1] < ITERS
    def outer_body(s):
        def inner_cond(t): return t[1] % 10 != 9
        def inner_body(t):
            return t[0] + 1, t[1] + 1
        x, it = jax.lax.while_loop(inner_cond, inner_body, s)
        return x, it + 1
    return jax.lax.while_loop(outer_cond, outer_body, (x, jnp.int32(0)))[0]
dt = timed(lambda: fence(nested(x0)))
print(f"{'nested-noop':14s}: {dt/ITERS*1e6:9.1f} us/outer-iter", flush=True)
