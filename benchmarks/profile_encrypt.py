"""Stage-level profile of the DJN encrypt path (TPU). Run standalone."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
import random

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.models import engine as eng
from pailliercryptolib_tpu.ops import paillier_ops as pops
from pailliercryptolib_tpu.ops.limbs import (
    ints_to_limbs, ints_to_windows, num_windows, max_bitlength,
)
from pailliercryptolib_tpu.utils import rng as _rng

def log(m):
    print(m, file=sys.stderr, flush=True)

BATCH = 2048
rng = random.Random(0xBEEF)
t = time.time()
key = ptpu.generate_keypair(2048, enable_DJN=True)
log(f"keygen: {time.time()-t:.1f}s")
pub = key.pub_key
e = pub._engine

vals = [rng.getrandbits(32) for _ in range(BATCH)]
m = [v % pub.n for v in vals]

def timeit(name, fn, iters=3):
    fn()  # warm
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    dt = (time.time() - t0) / iters
    log(f"{name:32s} {dt*1000:8.2f} ms")
    return out

# host stages
timeit("rng.batch_random_bits", lambda: _rng.batch_random_bits(BATCH, e.randbits))
r = _rng.batch_random_bits(BATCH, e.randbits)
m_p = eng._pad_batch(list(m), 0, e.backend)
r_p = eng._pad_batch(list(r), 0, e.backend)
ebits = max(e.randbits, max_bitlength(r_p))
nw = eng._round_windows(num_windows(ebits))
timeit("ints_to_limbs(m)", lambda: jnp.asarray(ints_to_limbs(m_p, e.Ln)))
timeit("ints_to_windows(r)", lambda: jnp.asarray(ints_to_windows(r_p, nw * 4)))
m_a = jnp.asarray(ints_to_limbs(m_p, e.Ln))
r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
n2_n, n2_n0inv, n2_r2, n2_one = e.n2_args
_, kc, conv = e.rns
hs_b = jnp.broadcast_to(e.hs_limbs, (len(m_p), e.L2))

# device stages
def s1():
    return pops.rns_modexp_stage(hs_b, r_w, kc).block_until_ready()
t0=time.time(); s1(); log(f"modexp compile: {time.time()-t0:.1f}s")
res = timeit("rns_modexp_stage (device)", s1)
res = pops.rns_modexp_stage(hs_b, r_w, kc)
def s2():
    return pops.rns_finalize_stage(res, conv, n2_n, e.L2).block_until_ready()
t0=time.time(); s2(); log(f"finalize compile: {time.time()-t0:.1f}s")
obf = timeit("rns_finalize_stage", s2)
obf = pops.rns_finalize_stage(res, conv, n2_n, e.L2)
raw = pops.encrypt_noobf_op(m_a, e.n_limbs, n2_n)
def s3():
    return pops.mod_mul_stage(raw, obf, n2_n, n2_n0inv, n2_r2, backend="pallas").block_until_ready()
t0=time.time(); s3(); log(f"mod_mul compile: {time.time()-t0:.1f}s")
out = timeit("mod_mul_stage (CIOS)", s3)
out = pops.mod_mul_stage(raw, obf, n2_n, n2_n0inv, n2_r2, backend="pallas")
timeit("download_limbs", lambda: eng._download_limbs(out) and None or 1)

# end-to-end
timeit("encrypt end-to-end", lambda: pub.encrypt(ptpu.PlainText(vals)))
log(f"k for n^2 RNS: {e.rns[0].k}, K={e.rns[0].K}, NW={nw}")
