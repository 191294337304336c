#!/usr/bin/env python
"""Headline benchmark: batched 2048-bit DJN Paillier encryption per chip.

Mirrors the reference's BM_Encrypt (benchmark/bench_cryptography.cpp:73-96)
at its largest batch size, against BASELINE.json's north-star target of
100k encrypts/s/chip.  Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Detail lines go to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

import random

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops.dispatch import default_backend

BASELINE_TARGET = 100_000.0  # encrypts/s/chip (BASELINE.json north star)
KEY_BITS = 2048
BATCH = 2048
ITERS = 30  # deep pipeline: the device queue hides host codec + dispatch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    rng = random.Random(0xBEEF)
    log(f"backend={default_backend()} devices={jax.devices()}")
    t = time.time()
    key = ptpu.generate_keypair(KEY_BITS, enable_DJN=True)
    log(f"keygen({KEY_BITS}, DJN): {time.time()-t:.1f}s")

    vals = [rng.getrandbits(32) for _ in range(BATCH)]
    pt = ptpu.PlainText(vals)

    t = time.time()
    ct = key.pub_key.encrypt(pt)
    ct.block_until_ready()
    log(f"encrypt first (compile): {time.time()-t:.1f}s")

    # Pipelined throughput: ciphertexts are device-resident (no host
    # round-trip per batch); the device executes dispatches in order, so
    # syncing the last batch bounds the wall time of all of them.
    t = time.time()
    for _ in range(ITERS):
        ct = key.pub_key.encrypt(pt)
    ct.block_until_ready()
    enc_dt = (time.time() - t) / ITERS
    enc_rate = BATCH / enc_dt
    log(f"encrypt batch={BATCH}: {enc_dt*1000:.1f} ms -> {enc_rate:.0f}/s")

    t = time.time()
    dt_pt = key.priv_key.decrypt(ct)
    dt_pt.block_until_ready()
    log(f"decrypt first (compile): {time.time()-t:.1f}s")
    t = time.time()
    for _ in range(ITERS):
        dt_pt = key.priv_key.decrypt(ct)
    dt_pt.block_until_ready()
    dec_dt = (time.time() - t) / ITERS
    dec_rate = BATCH / dec_dt
    log(f"decrypt batch={BATCH}: {dec_dt*1000:.1f} ms -> {dec_rate:.0f}/s")

    assert dt_pt.texts == vals, "roundtrip mismatch!"
    log("roundtrip verified")

    print(
        json.dumps(
            {
                "metric": "paillier_2048_djn_encrypts_per_s_per_chip",
                "value": round(enc_rate, 1),
                "unit": "encrypts/s",
                "vs_baseline": round(enc_rate / BASELINE_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
