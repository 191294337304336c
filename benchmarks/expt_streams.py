"""Sweep (streams, batch_tile) for the grouped shared-exponent RNS kernel
at the CRT-decrypt shape (2048-bit key: k=149, NW=256, B=2048), checking
correctness against pow() on the first row of each group.

Usage: python benchmarks/expt_streams.py [s1:bt1 s2:bt2 ...]
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops.pallas_rns2 import pallas_rns_modexp2
from pailliercryptolib_tpu.ops.limbs import limbs_to_ints
from pailliercryptolib_tpu.ops.rns import rns_to_limbs
import jax


def log(m):
    print(m, file=sys.stderr, flush=True)


BATCH = 2048
key = ptpu.generate_keypair(2048, enable_DJN=True)
e = key.priv_key._engine
kc2, conv2 = e.rns_crt_grouped  # grouped layout (these scripts drive pallas_rns_modexp2)
two = e.sq_n.shape[0]
bases_np = np.random.default_rng(0).integers(
    0, 1 << 14, (two, BATCH, e.Lp2), dtype=np.uint32
)
bases = jnp.asarray(bases_np)
wins = e.exp_wins[:, 0]

# host reference for row 0 of each group
p, q = e._p, e._q
exps = [p - 1, q - 1]
mods = [p * p, q * q]


def check(out):
    limbs = jax.vmap(rns_to_limbs, in_axes=(0, 0))(out[:, :1], conv2)
    for g in range(two):
        got = limbs_to_ints(np.asarray(limbs[g]))[0]
        base_int = limbs_to_ints(bases_np[g, :1])[0] % mods[g]
        want = pow(base_int, exps[g], mods[g])
        if got % mods[g] != want:
            return False
    return True


configs = sys.argv[1:] or ["2:128", "4:128", "2:256", "4:256", "8:256"]
for cfg in configs:
    s, bt = (int(v) for v in cfg.split(":"))
    try:
        out = pallas_rns_modexp2(
            bases, wins, kc2, shared=True, streams=s, batch_tile=bt
        )
        ok = check(out)
        np.asarray(jnp.ravel(out)[:1])
        t0 = time.time()
        iters = 6
        for _ in range(iters):
            out = pallas_rns_modexp2(
                bases, wins, kc2, shared=True, streams=s, batch_tile=bt
            )
        np.asarray(jnp.ravel(out)[:1])
        dt = (time.time() - t0) / iters * 1000
        log(f"streams={s} bt={bt}: {dt:8.2f} ms/batch  ok={ok}")
    except Exception as ex:
        log(f"streams={s} bt={bt}: FAILED {type(ex).__name__}: {str(ex)[:200]}")
