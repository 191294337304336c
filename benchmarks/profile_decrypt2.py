"""Jitted stage-level decrypt profile on TPU (CRT RNS path, v3 kernel)."""
import functools
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
from pailliercryptolib_tpu.ops.bigint import (
    mod_fold_combine, mul_low, mul_shared, sub_mod, sub_scalar,
)
from pailliercryptolib_tpu.ops.dispatch import (
    mod_mul_backend, mod_mul_backend_grouped, mont_raw_backend_grouped,
)
from pailliercryptolib_tpu.ops.montgomery import canonicalize
from pailliercryptolib_tpu.ops.paillier_ops import _rns_finalize
from pailliercryptolib_tpu.ops.pallas_rns2 import pallas_rns_modexp2


def log(m):
    print(m, file=sys.stderr, flush=True)


BATCH = 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub, priv = key.pub_key, key.priv_key
e = priv._engine
vals = [rng.getrandbits(32) for _ in range(BATCH)]
ct = pub.encrypt(ptpu.PlainText(vals))
ct_dev = ct.device_payload()
ct_a, size = e._ct_operand(ct_dev, 2 * e.Lp2)
kc2, conv2 = e.rns_crt_grouped  # grouped layout (drives pallas_rns_modexp2)
two = e.sq_n.shape[0]
Lp2 = e.Lp2
Lp = e.pq_n.shape[-1]


def timed(name, fn, *args, iters=8):
    out = fn(*args)
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])
    log(f"{name:44s} {(time.time()-t0)/iters*1000:8.2f} ms")
    return out


@jax.jit
def stage1a(ct_a, sq_r2, sq_n, sq_n0inv):
    x_hi = jnp.broadcast_to(ct_a[None, :, Lp2:], (two,) + ct_a[:, Lp2:].shape)
    x_lo = jnp.broadcast_to(ct_a[None, :, :Lp2], (two,) + ct_a[:, :Lp2].shape)
    folded = mont_raw_backend_grouped(x_hi, sq_r2[:, None, :], sq_n, sq_n0inv, "pallas")
    return jax.vmap(mod_fold_combine, in_axes=(0, 0, 0))(folded, x_lo, sq_n)


@jax.jit
def stage1b(bases, sq_n, sq_n0inv, sq_r2):
    plain_one = jnp.zeros((Lp2,), jnp.uint32).at[0].set(1)
    return mod_mul_backend_grouped(
        bases, plain_one[None, None, :], sq_n, sq_n0inv, sq_r2, "pallas"
    )


@functools.partial(jax.jit, static_argnames=())
def stage2(bases, wins, kc2):
    return pallas_rns_modexp2(bases, wins, kc2, shared=True, streams=2)


@jax.jit
def stage3a(res_rns, conv2, sq_n):
    return jax.vmap(_rns_finalize, in_axes=(0, 0, 0, None))(
        res_rns, conv2, sq_n, Lp2
    )


@jax.jit
def stage3b(res, hensel, hfun, pq_n, pq_n0inv, pq_r2, pinv_q, p_limbs):
    def lfun(r, hens):
        xm1 = sub_scalar(r, 1)
        return mul_low(hens, xm1, Lp)

    ts = jax.vmap(lfun, in_axes=(0, 0))(res, hensel)
    dphalves = mod_mul_backend_grouped(
        ts, hfun[:, None, :], pq_n, pq_n0inv, pq_r2, "pallas"
    )
    dp, dq = dphalves[0], dphalves[1]
    u = sub_mod(dq, dp, pq_n[1])
    u2 = mod_mul_backend(u, pinv_q, pq_n[1], pq_n0inv[1], pq_r2[1], "pallas")
    prod = mul_shared(p_limbs, u2)
    m = prod.at[..., :Lp].add(dp)
    m = canonicalize(m)
    return m[..., : 2 * Lp]


bases0 = timed("stage1a fold hi (CIOS raw) + combine", stage1a, ct_a, e.sq_r2, e.sq_n, e.sq_n0inv)
bases = timed("stage1b canonicalize (CIOS mul by 1)", stage1b, bases0, e.sq_n, e.sq_n0inv, e.sq_r2)
res_rns = timed("stage2 grouped RNS modexp (s=2)", stage2, bases, e.exp_wins[:, 0], kc2)
res = timed("stage3a rns_to_limbs + cond_sub", stage3a, res_rns, conv2, e.sq_n)
m = timed("stage3b lfun + hfun + CRT recombine", stage3b, res, e.hensel, e.hfun, e.pq_n, e.pq_n0inv, e.pq_r2, e.pinv_q, e.p_limbs)


def full():
    return pops.decrypt_crt_rns_op(
        ct_a, e.sq_n, e.sq_n0inv, e.sq_r2, e.exp_wins, e.hensel, e.hfun,
        e.pq_n, e.pq_n0inv, e.pq_r2, e.pinv_q, e.p_limbs, kc2, conv2)


timed("full decrypt_crt op", full, iters=4)
got = np.asarray(m[:, :1])
log(f"k={kc2['sig0'].shape[-1]} NW={e.exp_wins.shape[-1]} Lp2={Lp2}")
