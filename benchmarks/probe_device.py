"""Probe axon/TPU facts: transfer latency vs bandwidth, device PRNG, int8 dot."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

# transfer scaling
for nbytes in (4096, 65536, 1 << 20, 4 << 20):
    x = np.zeros(nbytes // 4, np.uint32)
    jax.device_put(x).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        jax.device_put(x).block_until_ready()
    log(f"upload {nbytes/1e6:7.3f} MB: {(time.time()-t0)/5*1000:7.2f} ms")

# download scaling (fresh arrays each time: add 0 on device)
f = jax.jit(lambda a, s: a + s)
for nbytes in (4096, 1 << 20, 4 << 20):
    x = jnp.zeros(nbytes // 4, jnp.uint32)
    f(x, jnp.uint32(1)).block_until_ready()
    t0 = time.time()
    for i in range(5):
        np.asarray(f(x, jnp.uint32(i)))
    log(f"download {nbytes/1e6:7.3f} MB: {(time.time()-t0)/5*1000:7.2f} ms")

# device PRNG: 2048 x 256 uint8 windows
@jax.jit
def gen(key):
    return jax.random.bits(key, (2048, 256), jnp.uint8)
k = jax.random.key(0)
gen(k).block_until_ready()
t0 = time.time()
for i in range(5):
    r = gen(jax.random.fold_in(k, i))
np.asarray(r[:1, :1])
log(f"device PRNG 2048x256 u8: {(time.time()-t0)/5*1000:7.2f} ms")

# int8 matmul
try:
    a = jnp.ones((256, 304), jnp.int8)
    b = jnp.ones((304, 304), jnp.int8)
    out = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))(a, b)
    log(f"int8 dot ok: {out.dtype} {np.asarray(out)[0, 0]}")
    # speed probe: 2048x304x304, 100 iters int8 vs bf16
    B = 2048
    ai8 = jnp.ones((B, 304), jnp.int8); bi8 = jnp.ones((304, 304), jnp.int8)
    abf = jnp.ones((B, 304), jnp.bfloat16); bbf = jnp.ones((304, 304), jnp.bfloat16)
    @jax.jit
    def many_i8(a, b):
        def step(c, _):
            c = (jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.int32) + c) % 1000
            return c, ()
        c, _ = jax.lax.scan(step, jnp.zeros((B, 304), jnp.int32), None, length=100)
        return c
    @jax.jit
    def many_bf(a, b):
        def step(c, _):
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + c * 0.5
            return c, ()
        c, _ = jax.lax.scan(step, jnp.zeros((B, 304), jnp.float32), None, length=100)
        return c
    many_i8(ai8, bi8).block_until_ready(); many_bf(abf, bbf).block_until_ready()
    t0 = time.time(); [np.asarray(many_i8(ai8, bi8)[:1, :1]) for _ in range(3)]
    log(f"100x int8 [2048,304]@[304,304]: {(time.time()-t0)/3*1000:.2f} ms")
    t0 = time.time(); [np.asarray(many_bf(abf, bbf)[:1, :1]) for _ in range(3)]
    log(f"100x bf16 same: {(time.time()-t0)/3*1000:.2f} ms")
except Exception as ex:
    log(f"int8 dot FAILED: {ex}")
