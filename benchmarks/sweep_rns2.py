"""Time the v2 grouped RNS modexp kernel (decrypt shape) on TPU.

Usage: python benchmarks/sweep_rns2.py [tiles...]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random
import numpy as np
import jax.numpy as jnp

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops.pallas_rns2 import pallas_rns_modexp2

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
tiles = [int(t) for t in sys.argv[1:]] or [128, 256]

rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
e = key.priv_key._engine
kc2, conv2 = e.rns_crt_grouped  # grouped layout (these scripts drive pallas_rns_modexp2)
k = int(kc2["sig0"].shape[-1])
NW = int(e.exp_wins.shape[-1])
log(f"decrypt-shape: k={k} NW={NW} Lp2={e.Lp2}")

two = e.sq_n.shape[0]
bases = jnp.asarray(
    np.random.default_rng(0).integers(
        0, 1 << 14, (two, BATCH, e.Lp2), dtype=np.uint32
    )
)
wins_shared = e.exp_wins[:, 0]  # [2, NW]
wins_var = jnp.broadcast_to(e.exp_wins, (two, BATCH, NW))

for shared in (True, False):
    for bt in tiles:
        label = f"shared={int(shared)} bt={bt}"
        try:
            w = wins_shared if shared else wins_var
            out = pallas_rns_modexp2(bases, w, kc2, shared=shared,
                                     batch_tile=bt)
            np.asarray(jnp.ravel(out)[:1])
            t0 = time.time(); iters = 6
            for _ in range(iters):
                out = pallas_rns_modexp2(bases, w, kc2, shared=shared,
                                         batch_tile=bt)
            np.asarray(jnp.ravel(out)[:1])
            dt = (time.time() - t0) / iters * 1000
            log(f"{label}: {dt:8.2f} ms/batch ({BATCH/dt*1000:8.0f}/s)")
        except Exception as ex:
            log(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:200]}")
