"""TPU timing: fixed-base vs variable-base DJN obfuscator modexp."""
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
    ints_to_limbs, ints_to_windows, ints_to_bytes_le, num_windows, max_bitlength,
)
from pailliercryptolib_tpu.utils import rng as _rng

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
pub = key.pub_key
e = pub._engine
_, kc, conv = e.rns

t0 = time.time()
planes, NP = e.fixedbase
jax.block_until_ready(planes)
np.asarray(planes[0][:1, :1, :1, :1])
log(f"fixedbase table build (compile+run): {time.time()-t0:.1f}s  NP={NP}")

r = _rng.batch_random_bits(BATCH, e.randbits)
r_b = jnp.asarray(ints_to_bytes_le(r, NP))
nw = eng._round_windows(num_windows(e.randbits))
r_w = jnp.asarray(ints_to_windows(r, nw * 4))
hs_b = jnp.broadcast_to(e.hs_limbs, (BATCH, e.L2))

# compile both
t0 = time.time()
res_fb = pops.rns_fb_modexp_stage(planes, r_b, kc)
np.asarray(res_fb[:1, :1])
log(f"fb modexp compile: {time.time()-t0:.1f}s")

N_IT = 10
t0 = time.time()
for _ in range(N_IT):
    res_fb = pops.rns_fb_modexp_stage(planes, r_b, kc)
np.asarray(res_fb[:1, :1])
log(f"fb modexp batch={BATCH}: {(time.time()-t0)/N_IT*1000:.2f} ms")

t0 = time.time()
res_vb = pops.rns_modexp_stage(hs_b, r_w, kc)
np.asarray(res_vb[:1, :1])
log(f"vb modexp compile: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(4):
    res_vb = pops.rns_modexp_stage(hs_b, r_w, kc)
np.asarray(res_vb[:1, :1])
log(f"vb modexp batch={BATCH}: {(time.time()-t0)/4*1000:.2f} ms")

# correctness on device: decode a few
from pailliercryptolib_tpu.ops import rns as rnsmod
from pailliercryptolib_tpu.ops import limbs as lb
vals = lb.limbs_to_ints(np.asarray(rnsmod.rns_to_limbs(res_fb[:8], conv)))
for i in range(8):
    want = pow(e.hs_int, r[i], e.nsquare)
    assert vals[i] % e.nsquare == want, i
log("fb results verified vs pow() on 8 elements")

# end-to-end encrypt with fixed-base (current engine path, incl download)
pt = ptpu.PlainText([rng.getrandbits(32) for _ in range(BATCH)])
pub.encrypt(pt)
t0 = time.time()
for _ in range(5):
    ct = pub.encrypt(pt)
log(f"encrypt end-to-end (sync/call): {(time.time()-t0)/5*1000:.1f} ms -> {BATCH/((time.time()-t0)/5):.0f}/s")
