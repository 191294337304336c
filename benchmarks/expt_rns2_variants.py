"""Time the v2 grouped RNS kernel with units knocked out (WRONG numerics,
timing only; one variant per process).

Usage: python benchmarks/expt_rns2_variants.py {full|nomxu|nored|nofrac}
  nomxu : matmuls replaced by slice       (VPU-side cost)
  nored : _red_mu replaced by a mask      (everything minus Barretts)
  nofrac: Kawamura frac sum replaced by 0 (sizes the lane-reduce)
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp

variant = sys.argv[1] if len(sys.argv) > 1 else "full"

from pailliercryptolib_tpu.ops import pallas_rns2 as PR

if variant == "nomxu":
    def _mm_cheap(a, b):
        out = a[:, : b.shape[1]]
        if out.shape[1] < b.shape[1]:
            pad = jnp.zeros((a.shape[0], b.shape[1] - out.shape[1]), out.dtype)
            out = jnp.concatenate([out, pad], axis=-1)
        return out.astype(jnp.float32)
    PR._mm = _mm_cheap
elif variant == "nored":
    PR._red_mu = lambda v, m, mu: v & jnp.uint32((1 << 14) - 1)
elif variant == "nofrac":
    import jax
    _sum = jnp.sum
    def fake_sum(x, axis=None, keepdims=False):
        return jnp.zeros(x.shape[:-1] + ((1,) if keepdims else ()), x.dtype)
    PR.jnp = type(jnp)("jnp_patched")
    for name in dir(jnp):
        try:
            setattr(PR.jnp, name, getattr(jnp, name))
        except Exception:
            pass
    PR.jnp.sum = fake_sum

import pailliercryptolib_tpu as ptpu

def log(m): print(m, file=sys.stderr, flush=True)

BATCH = 2048
key = ptpu.generate_keypair(2048, enable_DJN=True)
e = key.priv_key._engine
kc2, conv2 = e.rns_crt_grouped  # grouped layout (these scripts drive pallas_rns_modexp2)
two = e.sq_n.shape[0]
bases = jnp.asarray(
    np.random.default_rng(0).integers(0, 1 << 14, (two, BATCH, e.Lp2),
                                      dtype=np.uint32)
)
wins = e.exp_wins[:, 0]

out = PR.pallas_rns_modexp2(bases, wins, kc2, shared=True)
np.asarray(jnp.ravel(out)[:1])
t0 = time.time(); iters = 6
for _ in range(iters):
    out = PR.pallas_rns_modexp2(bases, wins, kc2, shared=True)
np.asarray(jnp.ravel(out)[:1])
log(f"variant={variant:7s}: {(time.time()-t0)/iters*1000:8.2f} ms/batch")
