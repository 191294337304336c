"""Split the encrypt sync cost: device compute vs wire transfer vs host decode."""
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
    unpack_pairs_np, limbs_to_ints,
)
from pailliercryptolib_tpu.utils import rng as _rng

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub = key.pub_key
e = pub._engine
vals = [rng.getrandbits(32) for _ in range(BATCH)]
m = [v % pub.n for v in vals]
r = _rng.batch_random_bits(BATCH, e.randbits)
m_p = eng._pad_batch(list(m), 0, e.backend)
r_p = eng._pad_batch(list(r), 0, e.backend)
ebits = max(e.randbits, max_bitlength(r_p))
nw = eng._round_windows(num_windows(ebits))
m_a = jnp.asarray(ints_to_limbs(m_p, e.Ln))
r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
n2_n, n2_n0inv, n2_r2, n2_one = e.n2_args
_, kc, conv = e.rns
hs_b = jnp.broadcast_to(e.hs_limbs, (len(m_p), e.L2))

# full pipeline once
res = pops.rns_modexp_stage(hs_b, r_w, kc)
obf = pops.rns_finalize_stage(res, conv, n2_n, e.L2)
raw = pops.encrypt_noobf_op(m_a, e.n_limbs, n2_n)
out = pops.mod_mul_stage(raw, obf, n2_n, n2_n0inv, n2_r2, backend="pallas")
packed = pops.pack_out_op(out)
np.asarray(packed)  # force everything

# 1. pure wire: re-download materialized buffer
t0 = time.time()
for _ in range(5):
    host = np.asarray(packed)
log(f"wire download {host.nbytes/1e6:.2f} MB: {(time.time()-t0)/5*1000:.2f} ms")

# 2. host decode
t0 = time.time()
for _ in range(5):
    ints = limbs_to_ints(unpack_pairs_np(host, out.shape[-1]))
log(f"host decode: {(time.time()-t0)/5*1000:.2f} ms")

# 3. host encode (upload side)
t0 = time.time()
for _ in range(5):
    _ = ints_to_limbs(m_p, e.Ln); _ = ints_to_windows(r_p, nw * 4)
log(f"host encode m+r: {(time.time()-t0)/5*1000:.2f} ms")

# 4. upload wire
mm = ints_to_limbs(m_p, e.Ln); ww = ints_to_windows(r_p, nw * 4)
t0 = time.time()
for _ in range(5):
    a = jax.device_put(mm); b = jax.device_put(ww)
    a.block_until_ready(); b.block_until_ready()
log(f"wire upload {(mm.nbytes+ww.nbytes)/1e6:.2f} MB: {(time.time()-t0)/5*1000:.2f} ms")

# 5. true device time of the modexp stage: chain N dependent calls, sync once
N = 8
t0 = time.time()
cur = res
for _ in range(N):
    cur = pops.rns_modexp_stage(hs_b, r_w, kc)
# tiny sync: pull one element
np.asarray(cur[:1, :1])
dt = (time.time() - t0) / N
log(f"modexp device-ish ({N} chained dispatch+1 sync): {dt*1000:.2f} ms")

# 6. whole device chain incl finalize/modmul, sync via tiny slice
t0 = time.time()
for _ in range(N):
    res2 = pops.rns_modexp_stage(hs_b, r_w, kc)
    obf2 = pops.rns_finalize_stage(res2, conv, n2_n, e.L2)
    out2 = pops.mod_mul_stage(raw, obf2, n2_n, n2_n0inv, n2_r2, backend="pallas")
    p2 = pops.pack_out_op(out2)
np.asarray(p2[:1, :1])
log(f"full device chain per iter: {(time.time()-t0)/N*1000:.2f} ms")
