"""Stage-level decrypt profile on TPU: grouped vs CRT-folded RNS modexp."""
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
from pailliercryptolib_tpu.ops.bigint import (
    mod_fold_combine, mul_low, mul_shared, sub_mod, sub_scalar,
)
from pailliercryptolib_tpu.ops.dispatch import (
    mod_mul_backend, mod_mul_backend_grouped, mont_raw_backend_grouped,
)
from pailliercryptolib_tpu.ops.montgomery import canonicalize
from pailliercryptolib_tpu.ops.paillier_ops import _rns_finalize
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    pallas_rns_modexp2, pallas_rns_modexp2f, stack_group_consts2,
    unfold_rns_out,
)
from pailliercryptolib_tpu.ops.rns import GUARD_FACTOR, RNSContext
from pailliercryptolib_tpu.ops.limbs import LIMB_BITS


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
kc2f, conv2 = e.rns_crt  # folded
# grouped consts for comparison
bits = max(2 * e._pbits + GUARD_FACTOR.bit_length(), LIMB_BITS * e.Lp2 + 1)
cp = RNSContext.create(e._p * e._p, in_limbs=e.Lp2, product_bits=bits)
cq = RNSContext.create(e._q * e._q, in_limbs=e.Lp2, product_bits=bits)
kc2g = stack_group_consts2([cp, cq])
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


@functools.partial(jax.jit, static_argnames=("streams",))
def stage2_grouped(bases, wins, kc2, streams=4):
    return pallas_rns_modexp2(bases, wins, kc2, shared=True, streams=streams)


@functools.partial(jax.jit, static_argnames=("streams",))
def stage2_folded(bases, wins, kc2, streams=4):
    base_f = jnp.concatenate([bases[0], bases[1]], axis=-1)
    k = kc2["sig0"].shape[-1] // 2
    return unfold_rns_out(
        pallas_rns_modexp2f(base_f, wins, kc2, streams=streams), k
    )


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


bases = timed("stage1a fold hi (CIOS raw) + combine", stage1a, ct_a, e.sq_r2, e.sq_n, e.sq_n0inv)
for s in (2, 4):
    timed(f"stage2 GROUPED modexp (streams={s})", functools.partial(stage2_grouped, streams=s), bases, e.exp_wins[:, 0], kc2g)
for s in (1, 2, 4, 8):
    res_rns = timed(f"stage2 FOLDED modexp (streams={s})", functools.partial(stage2_folded, streams=s), bases, e.exp_wins[:, 0], kc2f)
res = timed("stage3a rns_to_limbs + cond_sub", stage3a, res_rns, conv2, e.sq_n)
m = timed("stage3b lfun + hfun + CRT recombine", stage3b, res, e.hensel, e.hfun, e.pq_n, e.pq_n0inv, e.pq_r2, e.pinv_q, e.p_limbs)
got = np.asarray(m[:, :1])
log(f"k_folded={kc2f['sig0'].shape[-1]} k_grouped={kc2g['sig0'].shape[-1]} "
    f"NW={e.exp_wins.shape[-1]} Lp2={Lp2}")
