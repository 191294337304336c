"""Layout probe: VPU cost of a Barrett-style u32 chain, batch-major
[B, k] (k on lanes, pads 149->256) vs residue-major [k, B] (k on
sublanes, pads 149->152).  Decides the pallas_rns3 layout."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 600  # chain steps inside the kernel
GRID = 32

def log(m):
    print(m, file=sys.stderr, flush=True)


def chain_kernel(m_ref, mu_ref, x_ref, o_ref):
    m = m_ref[...]
    mu = mu_ref[...]

    def body(i, x):
        v = x * x  # stand-in for the raw product
        q = ((v >> 14) * mu) >> 14
        r = v - q * m
        r = jnp.where(r >= (m << 1), r - (m << 1), r)
        r = jnp.where(r >= m, r - m, r)
        return r

    o_ref[0] = jax.lax.fori_loop(0, ITERS, body, x_ref[0])


def run(shape, const_shape, tag):
    rng = np.random.default_rng(0)
    x = rng.integers(3, 1 << 13, (GRID,) + shape, dtype=np.uint32)
    m = np.full(const_shape, 12289, np.uint32)
    mu = np.full(const_shape, (1 << 28) // 12289, np.uint32)

    f = pl.pallas_call(
        chain_kernel,
        out_shape=jax.ShapeDtypeStruct((GRID,) + shape, jnp.uint32),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec(const_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(const_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    out = f(m, mu, x)
    np.asarray(out[:1, :1, :1])
    t0 = time.time()
    N = 20
    for _ in range(N):
        out = f(m, mu, x)
    np.asarray(out[:1, :1, :1])
    dt = (time.time() - t0) / N * 1000
    ops = GRID * ITERS * shape[0] * shape[1]
    log(f"{tag:28s} {dt:8.3f} ms   {ops/dt*1e3/1e9:7.1f} G lane-ops/s")
    return dt


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    a = run((128, 149), (1, 149), "batch-major [128,149]")
    b = run((149, 128), (149, 1), "residue-major [149,128]")
    c = run((152, 128), (152, 1), "residue-major [152,128]")
    d = run((128, 256), (1, 256), "batch-major [128,256] ctrl")
    log(f"speedup transposed: {a/b:.2f}x")
