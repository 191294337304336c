"""A/B the _red_mu flavors (integer Barrett vs f32 reciprocal) and the
kernel layouts (grouped grid vs CRT-folded lanes) at decrypt shapes.

Follows VERDICT r03's rule: no kernel change ships without a same-session
TPU number.  Usage: python benchmarks/expt_redmu.py [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random

import jax
import jax.numpy as jnp
import numpy as np

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    fold_group_consts2,
    pallas_rns_modexp2,
    pallas_rns_modexp2f,
    stack_group_consts2,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
e = key.priv_key._engine
cp, cq = e._rns_crt_ctxs()
wins = e.exp_wins[:, 0]  # [2, NW]
NW = int(wins.shape[-1])
two = 2
bases = jnp.asarray(
    np.random.default_rng(0).integers(
        0, 1 << 14, (two, BATCH, e.Lp2), dtype=np.uint32
    )
)
base_f = jnp.concatenate([bases[0], bases[1]], axis=-1)
log(f"decrypt shapes: k={cp.k} NW={NW} Lp2={e.Lp2} batch={BATCH}")


def timed(label, fn, iters=8):
    out = fn()
    np.asarray(jnp.ravel(out)[:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    np.asarray(jnp.ravel(out)[:1])
    dt = (time.time() - t0) / iters
    log(f"{label:44s} {dt*1000:8.2f} ms  ({2*BATCH/dt:8.0f} modexp/s)")


for f32 in (False, True):
    kcg = stack_group_consts2([cp, cq], f32_mu=f32)
    for s in (2, 4):
        timed(
            f"grouped f32_mu={int(f32)} streams={s}",
            lambda: pallas_rns_modexp2(
                bases, wins, kcg, shared=True, streams=s
            ),
        )
    kcf = fold_group_consts2([cp, cq], f32_mu=f32)
    for s in (2, 4):
        timed(
            f"folded  f32_mu={int(f32)} streams={s}",
            lambda: pallas_rns_modexp2f(base_f, wins, kcf, streams=s),
        )
