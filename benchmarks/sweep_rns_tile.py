"""Sweep batch_tile for the grouped RNS modexp kernel (decrypt shape).

Usage: python benchmarks/sweep_rns_tile.py [tiles...]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random
import numpy as np
import jax.numpy as jnp

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops.pallas_rns import pallas_rns_modexp

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
tiles = [int(t) for t in sys.argv[1:]] or [128, 256, 512]

rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub, priv = key.pub_key, key.priv_key
e = priv._engine
vals = [rng.getrandbits(32) for _ in range(BATCH)]
ct = pub.encrypt(ptpu.PlainText(vals))
ct_dev = ct.device_payload()

ct_a, size = e._ct_operand(ct_dev, 2 * e.Lp2)
kc2, conv2 = e.rns_crt
k = int(kc2["neg_Ninv_A"].shape[-1])
K = int(kc2["mods"].shape[-1])
NW = int(e.exp_wins.shape[-1])
log(f"decrypt-shape: k={k} K={K} NW={NW} Lp2={e.Lp2}")

# stage-1 equivalent base (cheap stand-in: reuse low limbs, canonical enough
# for timing — kernel cost is data-independent)
two = e.sq_n.shape[0]
bases = jnp.broadcast_to(ct_a[None, :, : e.Lp2] % jnp.uint32(1 << 14),
                         (two, BATCH, e.Lp2)).astype(jnp.uint32)
wins = jnp.broadcast_to(e.exp_wins, (two, BATCH, NW))

for bt in tiles:
    try:
        out = pallas_rns_modexp(bases, wins, kc2, batch_tile=bt)
        np.asarray(jnp.ravel(out)[:1])
        t0 = time.time()
        iters = 6
        for _ in range(iters):
            out = pallas_rns_modexp(bases, wins, kc2, batch_tile=bt)
        np.asarray(jnp.ravel(out)[:1])
        dt = (time.time() - t0) / iters * 1000
        log(f"batch_tile={bt:4d}: {dt:8.2f} ms/batch  ({BATCH/dt*1000:8.0f}/s)")
    except Exception as ex:
        log(f"batch_tile={bt:4d}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
