"""Roofline analysis of the RNS Montgomery modexp kernels (BASELINE.md:29).

Measures the decrypt-shape shared-exponent kernel and the fixed-base
encrypt kernel at 1024/2048/4096-bit moduli on the real TPU, then derives

* ns per Montgomery multiply per 128-row batch tile,
* exact int8 MXU MACs issued and the achieved fraction of the chip's
  published int8 peak,
* the implied VPU vector-op issue rate against an op-count model of the
  kernel body (the kernel is VPU-bound: the MXU runs at a few percent).

Peak assumptions (public v5e spec sheet): 394 TOPS int8, VPU = 8x128
lanes x 4 ALUs at 1.74 GHz ~= 2.85e12 lane-ops/s.  Usage:
  python benchmarks/roofline.py [--batch 2048] [--bits 1024,2048,4096]
Prints one JSON line per (kernel, bits) plus a human table on stderr.
"""

import argparse
import json
import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import rns as rnsmod
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    BATCH_TILE,
    FB_TABLE,
    fb_digit_planes2,
    pallas_fb_modexp2,
    pallas_fb_table2,
    pallas_rns_modexp2,
    stack_group_consts2,
)
from pailliercryptolib_tpu.ops.rns import RNSContext

INT8_PEAK_MACS = 394e12 / 2  # 394 TOPS counts mul+add; MACs/s = half
VPU_LANE_OPS_PEAK = 8 * 128 * 4 * 1.74e9  # lanes x ALUs x clock

# Elementwise full-width vector-op count per Montgomery multiply in
# _make_mont_mul2 (f32 _red_mu flavor), hand-counted from the kernel
# body: products+splits 5, sigma chain 10, sigma digit-split 6, z_B
# fused reduction (recombine 12 + terms 6 + red 7) 25, z_B digit-split
# 6, r_A (recombine 12 + pad/corr 3 + red 7) 22 -- ~74 ops touching
# [Bt, ~2x128-lane] arrays (A and B sides each ~2 vregs wide per row).
MONT_MUL_VECTOR_OPS = 74


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:1])


def timed(fn, iters=8):
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.time() - t0) / iters


def emit(row):
    print(json.dumps(row), flush=True)


def shared_modexp_roofline(nbits, batch):
    """Decrypt-shape kernel: one residue system, shared exponent."""
    rng = random.Random(42)
    N = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    c = RNSContext.create(N)
    kc = stack_group_consts2([c], f32_mu=True)
    k = c.k
    ebits = nbits // 2  # CRT decrypt: exponent ~ half the modulus width
    NW = max(8, -(-lb.num_windows(ebits) // 8) * 8)
    e = rng.getrandbits(ebits) | (1 << (ebits - 1))
    wins = jnp.asarray(lb.ints_to_windows([e], NW * 4))
    bases = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 1 << 14, (1, batch, c.Lin), dtype=np.uint32
        )
    )
    dt = timed(
        lambda: pallas_rns_modexp2(bases, wins, kc, shared=True, streams=4)
    )
    tiles = batch // BATCH_TILE
    mont_muls = 5 * NW + (1 << 4) + 2  # squarings+muls, table, entry/exit
    per_mm_ns = dt / (tiles * mont_muls) * 1e9
    # exact MXU int8 MACs: two base extensions of 4 digit-plane matmuls
    macs_mm = 4 * BATCH_TILE * k * (k + 2) + 4 * BATCH_TILE * k * (k + 1)
    macs_s = macs_mm * mont_muls * tiles / dt
    # VPU model: ops touch A (~k lanes) + B (~k+1 lanes) rows
    lane_ops_s = (
        MONT_MUL_VECTOR_OPS * BATCH_TILE * 2 * (-(-k // 128) * 128)
        * mont_muls * tiles / dt
    )
    row = {
        "kernel": "shared_modexp(f32,s=4)",
        "bits": nbits,
        "k": k,
        "NW": NW,
        "batch": batch,
        "ms": round(dt * 1e3, 2),
        "mont_mul_ns_per_tile": round(per_mm_ns, 1),
        "mxu_util_pct": round(100 * macs_s / INT8_PEAK_MACS, 2),
        "vpu_util_pct": round(100 * lane_ops_s / VPU_LANE_OPS_PEAK, 1),
        "modexp_per_s": round(batch / dt),
    }
    emit(row)
    log(f"shared {nbits}b: {dt*1e3:7.2f} ms  {per_mm_ns:7.0f} ns/mont_mul"
        f"  MXU {row['mxu_util_pct']:5.2f}%  VPU~{row['vpu_util_pct']:5.1f}%")


def fb_modexp_roofline(nbits, batch):
    """Fixed-base encrypt kernel: table gather + mont_mul per 8-bit window."""
    rng = random.Random(43)
    N = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    c = RNSContext.create(N)
    kc = stack_group_consts2([c], f32_mu=False)
    k = c.k
    ebits = nbits // 4  # DJN obfuscator exponent: randbits = keybits/2
    NP = max(8, -(-(-(-ebits // 8)) // 8) * 8)
    g = [rng.randrange(1, N)]
    for _ in range(NP - 1):
        g.append(pow(g[-1], 256, N))
    g_limbs = jnp.asarray(lb.ints_to_limbs(g, c.Lin))
    res = rnsmod.limbs_to_rns(g_limbs, c.device_consts())
    gm = rnsmod.rns_mont_mul(res, jnp.asarray(c.mont_sq)[None], c.device_consts())
    wv = kc["wvec"][0]
    gB = rnsmod.mulmod(
        gm[:, k:], wv[None, :], jnp.asarray(c.mods[k:]),
        jnp.asarray(c.barrett[k:]),
    )
    tabA, tabB = pallas_fb_table2(gm[None, :, :k], gB[None], kc)
    planes = fb_digit_planes2(tabA, tabB)
    wins = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (1, batch, NP), np.uint32)
    )
    dt = timed(lambda: pallas_fb_modexp2(*planes, wins, kc))
    tiles = batch // BATCH_TILE
    mont_muls = NP  # one multiply per window (plus gathers; no squarings)
    per_mm_ns = dt / (tiles * mont_muls) * 1e9
    # per window: 4 one-hot bf16 gather matmuls [Bt,256]@[256,~k] + the
    # mont_mul's 8 digit-plane int8 matmuls
    gather_macs = 4 * BATCH_TILE * FB_TABLE * (k + 1)
    mm_macs = 4 * BATCH_TILE * k * (k + 2) + 4 * BATCH_TILE * k * (k + 1)
    macs_s = (gather_macs + mm_macs) * mont_muls * tiles / dt
    lane_ops_s = (
        MONT_MUL_VECTOR_OPS * BATCH_TILE * 2 * (-(-k // 128) * 128)
        * mont_muls * tiles / dt
    )
    row = {
        "kernel": "fb_modexp(barrett)",
        "bits": nbits,
        "k": k,
        "NP": NP,
        "batch": batch,
        "ms": round(dt * 1e3, 2),
        "mont_mul_ns_per_tile": round(per_mm_ns, 1),
        "mxu_util_pct": round(100 * macs_s / INT8_PEAK_MACS, 2),
        "vpu_util_pct": round(100 * lane_ops_s / VPU_LANE_OPS_PEAK, 1),
        "modexp_per_s": round(batch / dt),
    }
    emit(row)
    log(f"fb     {nbits}b: {dt*1e3:7.2f} ms  {per_mm_ns:7.0f} ns/mont_mul"
        f"  MXU {row['mxu_util_pct']:5.2f}%  VPU~{row['vpu_util_pct']:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--bits", type=str, default="1024,2048,4096")
    args = ap.parse_args()
    log(f"devices={jax.devices()}")
    for b in (int(x) for x in args.bits.split(",")):
        shared_modexp_roofline(b, args.batch)
        fb_modexp_roofline(b, args.batch)


if __name__ == "__main__":
    main()
