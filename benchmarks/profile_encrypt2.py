"""Steady-state encrypt stage profile at batch 2048 (fixed-base path).

Times each pipeline stage of the DJN encrypt independently and jointly:
RNG bytes + upload, fb gather-multiply kernel, encrypt post (embedding +
obfuscation multiply in RNS), and the end-to-end engine call.
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
from pailliercryptolib_tpu.ops import paillier_ops as pops
from pailliercryptolib_tpu.utils import rng as prng


def log(m):
    print(m, file=sys.stderr, flush=True)


B = 2048
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub = key.pub_key
e = pub._engine
planes, NP = e.fixedbase
_, kc, conv = e.rns
rng = random.Random(3)
vals = [rng.getrandbits(32) for _ in range(B)]
pt = ptpu.PlainText(vals)


def timed(label, fn, iters=10, sync=None):
    out = fn()
    (sync or (lambda o: np.asarray(jnp.ravel(jax.tree.leaves(o)[0])[:1])))(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    (sync or (lambda o: np.asarray(jnp.ravel(jax.tree.leaves(o)[0])[:1])))(out)
    log(f"{label:42s} {(time.time()-t0)/iters*1000:8.2f} ms")
    return out


rb = prng.batch_random_bytes(B, e.randbits)
timed("host RNG bytes (os.urandom)", lambda: prng.batch_random_bytes(B, e.randbits), sync=lambda o: None)
r_b = timed("upload r bytes [2048, 128]", lambda: e._up_arr(rb))
m_p = e._pad(vals, 0)
m_a = timed("upload m (narrow limbs)", lambda: e._upload_narrow(m_p))
res = timed("fb gather-multiply kernel", lambda: pops.rns_fb_modexp_stage(planes, r_b, kc))
n2 = e.n2_args
timed("encrypt_post (embed + obf-mul + finalize)", lambda: pops.encrypt_post_stage(res, m_a, e.n_limbs, conv, n2[0], n2[1], n2[2]))
timed("END-TO-END pub.encrypt(pt)", lambda: pub.encrypt(pt), sync=lambda o: o.block_until_ready())
log(f"NP={NP} k={kc['sig0'].shape[-1]}")
