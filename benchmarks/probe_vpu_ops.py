#!/usr/bin/env python
"""VPU op-cost probe: relative issue cost of u32 mul / add / where vs f32.

The decrypt kernel measures ~2.4x above a 74-op/4-ALU issue model; if
u32 multiply lowers to multiple VPU passes (no native 32-bit integer
multiplier), the model undercounts and the optimization target changes
(e.g. split products into f32-exact 7-bit pieces).  Each probe kernel
runs REPS dependent ops of one kind on a [256, 512] u32/f32 block.

Appends rows to benchmarks/results/profile_r5_v5e.jsonl.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

REPS = 512
SHAPE = (256, 512)
OUT = os.path.join(os.path.dirname(__file__), "results", "profile_r5_v5e.jsonl")


def log(m):
    print(m, file=sys.stderr, flush=True)


def _mk(op):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]
        acc = x
        for _ in range(REPS):
            acc = op(acc, y)
        o_ref[...] = acc

    return kernel


OPS = {
    "u32_mul": lambda a, b: a * b,
    "u32_add": lambda a, b: a + b,
    "u32_shift_add": lambda a, b: (a >> jnp.uint32(3)) + b,
    "u32_where_sub": lambda a, b: jnp.where(a >= b, a - b, a),
    "u32_mul_add": lambda a, b: a * b + b,
}
F32_OPS = {
    "f32_mul": lambda a, b: a * b,
    "f32_fma": lambda a, b: a * b + b,
}


def run(name, kernel, dtype):
    x = jnp.asarray(
        np.random.RandomState(0).randint(1, 1 << 12, SHAPE), dtype
    )
    y = jnp.asarray(
        np.random.RandomState(1).randint(1, 1 << 12, SHAPE), dtype
    )
    fn = jax.jit(
        functools.partial(
            pl.pallas_call,
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
        )(kernel)
    )
    o = fn(x, y)
    np.asarray(jax.device_get(o[:1, :1]))
    best = float("inf")
    for _ in range(3):
        t = time.time()
        for _ in range(20):
            o = fn(x, y)
        np.asarray(jax.device_get(o[:1, :1]))
        best = min(best, (time.time() - t) / 20)
    # [256,512] = 128 vregs; REPS dependent ops
    ns_per_vreg_op = best / (REPS * SHAPE[0] * SHAPE[1] / 1024) * 1e9
    row = {
        "name": f"vpu_probe[{name}]",
        "us_per_call": round(best * 1e6, 1),
        "ns_per_vreg_op": round(ns_per_vreg_op, 3),
        "reps": REPS,
        "shape": list(SHAPE),
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"  {name}: {best*1e6:.1f} us -> {ns_per_vreg_op:.3f} ns/vreg-op")


def main():
    log(f"devices={jax.devices()}")
    for name, op in OPS.items():
        run(name, _mk(op), jnp.uint32)
    for name, op in F32_OPS.items():
        run(name, _mk(op), jnp.float32)
    log("done")


if __name__ == "__main__":
    main()
