"""Does RNS kernel time scale with lane width? G=1 shared-exp modexp at
k=149 (p^2-sized) vs k=298 (n^2-sized), same NW/batch.  Linear scaling
=> data-bound (folding should win); flat => op/issue-bound."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random

import jax
import jax.numpy as jnp
import numpy as np

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    pallas_rns_modexp2, stack_group_consts2,
)
from pailliercryptolib_tpu.ops.rns import RNSContext


def log(m):
    print(m, file=sys.stderr, flush=True)


B, NW = 2048, 256
EBITS = NW * 4
rng = random.Random(7)


@functools.partial(jax.jit, static_argnames=("streams",))
def run(x, wins, kc, streams):
    return pallas_rns_modexp2(x, wins, kc, shared=True, streams=streams)


for nbits in (2048, 4096):
    N = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    c = RNSContext.create(N)
    kc = stack_group_consts2([c])
    bases = [rng.randrange(N) for _ in range(B)]
    e = rng.getrandbits(EBITS) | (1 << (EBITS - 1))
    x = jnp.asarray(lb.ints_to_limbs(bases, c.Lin))[None]
    wins = jnp.asarray(lb.ints_to_windows([e], EBITS))
    for streams in (2, 4):
        out = run(x, wins, kc, streams)
        np.asarray(out[0, :1, :1])
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            out = run(x, wins, kc, streams)
        np.asarray(out[0, :1, :1])
        dt = (time.time() - t0) / iters
        per_mm = dt / (B / 128) / (NW * 5 + 14 + 2)
        log(f"nbits={nbits} k={c.k} Lin={c.Lin} streams={streams}: "
            f"{dt*1000:7.2f} ms  ({per_mm*1e9:6.0f} ns/mont_mul/tile)")
