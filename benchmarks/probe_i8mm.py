"""Probe: does Mosaic lower int8 x int8 -> int32 dot_general in a Pallas
kernel on this toolchain, and is it correct?"""
import os, sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


def kernel_i8(x_ref, t_ref, o_ref):
    x = x_ref[...].astype(jnp.int8)
    t = t_ref[...].astype(jnp.int8)
    o_ref[...] = jax.lax.dot_general(
        x, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def kernel_f32(x_ref, t_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    t = t_ref[...].astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        x, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


rng = np.random.default_rng(0)
x = rng.integers(0, 128, (128, 152), dtype=np.int32)
t = rng.integers(0, 128, (152, 152), dtype=np.int32)
want = x @ t

for name, kern, odt in (("i8->i32", kernel_i8, jnp.int32),
                        ("f32", kernel_f32, jnp.float32)):
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 152), odt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(f(jnp.asarray(x), jnp.asarray(t)))
        ok = np.array_equal(out.astype(np.int64), want)
        log(f"{name}: lowered ok, exact={ok}")
    except Exception as ex:
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
