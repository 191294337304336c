"""Stage-level decrypt profile on TPU (CRT RNS path)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import random
import jax.numpy as jnp

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops import paillier_ops as pops
from pailliercryptolib_tpu.ops.pallas_rns2 import pallas_rns_modexp2

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub, priv = key.pub_key, key.priv_key
e = priv._engine
vals = [rng.getrandbits(32) for _ in range(BATCH)]
ct = pub.encrypt(ptpu.PlainText(vals))
ct_dev = ct.device_payload()

def timed(name, fn, iters=8):
    out = fn()
    np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[:1])
    log(f"{name:40s} {(time.time()-t0)/iters*1000:8.2f} ms")
    return out

ct_a, size = e._ct_operand(ct_dev, 2 * e.Lp2)
kc2, conv2 = e.rns_crt_grouped  # grouped layout (these scripts drive pallas_rns_modexp2)
from pailliercryptolib_tpu.ops.paillier_ops import (
    _rns_finalize, _cios_backend,
)
import jax
from pailliercryptolib_tpu.ops.bigint import mod_fold_combine
from pailliercryptolib_tpu.ops.dispatch import (
    mod_mul_backend_grouped, mont_raw_backend_grouped, mod_mul_backend,
)

# replicate decrypt_crt_rns_op stages piecewise
two = e.sq_n.shape[0]
Lp2 = e.Lp2

def stage1():
    x_hi = jnp.broadcast_to(ct_a[None, :, Lp2:], (two,) + ct_a[:, Lp2:].shape)
    x_lo = jnp.broadcast_to(ct_a[None, :, :Lp2], (two,) + ct_a[:, :Lp2].shape)
    folded = mont_raw_backend_grouped(x_hi, e.sq_r2[:, None, :], e.sq_n, e.sq_n0inv, "pallas")
    bases = jax.vmap(mod_fold_combine, in_axes=(0, 0, 0))(folded, x_lo, e.sq_n)
    plain_one = jnp.zeros((Lp2,), jnp.uint32).at[0].set(1)
    return mod_mul_backend_grouped(bases, plain_one[None, None, :], e.sq_n, e.sq_n0inv, e.sq_r2, "pallas")

bases = timed("stage1 fold into p^2/q^2 (CIOS)", stage1)

def stage2():
    return pallas_rns_modexp2(bases, e.exp_wins[:, 0], kc2, shared=True, streams=2)
res_rns = timed("stage2 grouped RNS modexp", stage2)

def stage3():
    return jax.vmap(_rns_finalize, in_axes=(0, 0, 0, None))(res_rns, conv2, e.sq_n, Lp2)
res = timed("stage3 rns finalize", stage3)

def full():
    return pops.decrypt_crt_rns_op(
        ct_a, e.sq_n, e.sq_n0inv, e.sq_r2, e.exp_wins, e.hensel, e.hfun,
        e.pq_n, e.pq_n0inv, e.pq_r2, e.pinv_q, e.p_limbs, kc2, conv2)
timed("full decrypt_crt op", full, iters=4)
log(f"k for p^2 RNS: {kc2['sig0'].shape[-1]}, NW={e.exp_wins.shape[-1]}")
