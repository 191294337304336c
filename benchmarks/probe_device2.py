"""Per-iteration transfer/PRNG timings (distinguish compile vs steady-state)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

rng = np.random.default_rng(0)

# upload random (incompressible) data
for nbytes in (65536, 1 << 20, 2 << 20):
    x = rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32)
    ts = []
    for i in range(6):
        t0 = time.time()
        jax.device_put(x).block_until_ready()
        ts.append((time.time() - t0) * 1000)
    log(f"upload rnd {nbytes/1e6:6.3f} MB: " + " ".join(f"{t:7.2f}" for t in ts))

# download per-iter
f = jax.jit(lambda a, s: a + s)
for nbytes in (4096, 1 << 20):
    x = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
    y = f(x, jnp.uint32(1))
    np.asarray(y)
    ts = []
    for i in range(6):
        y = f(x, jnp.uint32(i))
        t0 = time.time()
        np.asarray(y)
        ts.append((time.time() - t0) * 1000)
    log(f"download {nbytes/1e6:6.3f} MB: " + " ".join(f"{t:7.2f}" for t in ts))

# PRNG per-iter, sync via np.asarray of full output
@jax.jit
def gen(key):
    return jax.random.bits(key, (2048, 256), jnp.uint8)
k = jax.random.key(0)
np.asarray(gen(k))
ts = []
for i in range(6):
    t0 = time.time()
    r = gen(jax.random.fold_in(k, i))
    np.asarray(r)
    ts.append((time.time() - t0) * 1000)
log("device PRNG 2048x256 u8 (incl download): " + " ".join(f"{t:7.2f}" for t in ts))

# PRNG chained without download: 20 gens, one tiny sync via jnp.sum
@jax.jit
def gen_sum(key):
    def step(c, i):
        r = jax.random.bits(jax.random.fold_in(key, i), (2048, 256), jnp.uint8)
        return c + jnp.sum(r.astype(jnp.uint32)), ()
    c, _ = jax.lax.scan(step, jnp.uint32(0), jnp.arange(20))
    return c
np.asarray(gen_sum(k))
t0 = time.time()
np.asarray(gen_sum(jax.random.fold_in(k, 99)))
log(f"20x device PRNG (scan, 1 sync): {(time.time()-t0)*1000:.2f} ms -> {(time.time()-t0)*50:.2f} ms/gen")
