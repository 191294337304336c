"""Per-op VPU cost probe: what does each primitive cost on this chip?"""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 1024
GRID = 32
SHAPE = (128, 256)

def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(step):
    def kernel(c_ref, x_ref, o_ref):
        c = c_ref[...]

        def body(i, x):
            return step(x, c)

        o_ref[0] = jax.lax.fori_loop(0, ITERS, body, x_ref[0])

    return kernel


def run(step, tag, dtype=jnp.uint32, cval=3):
    rng = np.random.default_rng(0)
    if dtype == jnp.float32:
        x = rng.uniform(1.0, 1.3, (GRID,) + SHAPE).astype(np.float32)
        c = np.full((1, SHAPE[1]), 1.0000001, np.float32)
    else:
        x = rng.integers(3, 1 << 13, (GRID,) + SHAPE).astype(dtype)
        c = np.full((1, SHAPE[1]), cval, dtype)
    f = jax.jit(pl.pallas_call(
        make_kernel(step),
        out_shape=jax.ShapeDtypeStruct((GRID,) + SHAPE, dtype),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, SHAPE[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + SHAPE, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + SHAPE, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    ))
    out = f(c, x)
    np.asarray(out[:1, :1, :1])
    t0 = time.time()
    N = 10
    for _ in range(N):
        out = f(c, x)
    np.asarray(out[:1, :1, :1])
    dt = (time.time() - t0) / N * 1000
    ops = GRID * ITERS * SHAPE[0] * SHAPE[1]
    log(f"{tag:34s} {dt:8.3f} ms   {ops/dt*1e3/1e9:7.1f} G/s")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    run(lambda x, c: x + c, "add u32")
    run(lambda x, c: x ^ c, "xor u32")
    run(lambda x, c: x >> jnp.uint32(3), "shift u32")
    run(lambda x, c: x * c, "mul u32 (vector x vector-bcast)")
    run(lambda x, c: x * jnp.uint32(12289), "mul u32 (by scalar const)")
    run(lambda x, c: x * x, "mul u32 (x*x)")
    run(lambda x, c: jnp.where(x >= c, x - c, x), "where(cmp, sub)")
    run(lambda x, c: x.astype(jnp.int32).astype(jnp.float32)
        .astype(jnp.int32).astype(jnp.uint32), "u32<->f32 roundtrip (via i32)")
    run(lambda x, c: x * c, "mul f32", dtype=jnp.float32)
    run(lambda x, c: (x.astype(jnp.int32) * c.astype(jnp.int32))
        .astype(jnp.uint32), "mul i32")
    # fused candidate: 16-bit-ish multiply via f32 exactness (a,b < 2^12)
    run(lambda x, c: ((x & jnp.uint32(0xFFF)) * (c & jnp.uint32(0xFFF))),
        "mul u32 (12-bit masked)")
