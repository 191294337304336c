"""Time the grouped RNS modexp kernel with units knocked out (results are
numerically WRONG — timing only; run one variant per process).

Usage: python benchmarks/expt_rns_variants.py {full|nomxu|novpu}
  nomxu: matmuls replaced by a cheap slice (measures VPU-side cost)
  novpu: barrett reduction replaced by a mask  (measures MXU-side cost)
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random
import numpy as np
import jax.numpy as jnp

variant = sys.argv[1] if len(sys.argv) > 1 else "full"

from pailliercryptolib_tpu.ops import pallas_rns as PR

if variant == "nomxu":
    def _mm_cheap(a, b):
        # same output shape [rows, b.shape[1]], no MXU
        out = a[:, : b.shape[1]]
        if out.shape[1] < b.shape[1]:
            pad = jnp.zeros((a.shape[0], b.shape[1] - out.shape[1]), out.dtype)
            out = jnp.concatenate([out, pad], axis=-1)
        return out.astype(jnp.float32)
    PR._mm = _mm_cheap
elif variant == "novpu":
    def _barrett_cheap(v, m, mu):
        return v & jnp.uint32((1 << 14) - 1)
    PR.barrett_reduce = _barrett_cheap
    PR.mulmod = lambda x, y, m, mu: _barrett_cheap(x * y, m, mu)

import pailliercryptolib_tpu as ptpu

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
rng = random.Random(0xBEEF)
key = ptpu.generate_keypair(2048, enable_DJN=True)
e = key.priv_key._engine
kc2, conv2 = e.rns_crt
NW = int(e.exp_wins.shape[-1])
two = e.sq_n.shape[0]
bases = jnp.asarray(
    np.random.default_rng(0).integers(0, 1 << 14, (two, BATCH, e.Lp2), dtype=np.uint32)
)
wins = jnp.broadcast_to(e.exp_wins, (two, BATCH, NW))

out = PR.pallas_rns_modexp(bases, wins, kc2)
np.asarray(jnp.ravel(out)[:1])
t0 = time.time(); iters = 6
for _ in range(iters):
    out = PR.pallas_rns_modexp(bases, wins, kc2)
np.asarray(jnp.ravel(out)[:1])
dt = (time.time() - t0) / iters * 1000
log(f"variant={variant:6s}: {dt:8.2f} ms/batch")
