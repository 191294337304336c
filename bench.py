#!/usr/bin/env python
"""Headline benchmark: batched 2048-bit DJN Paillier encryption per chip.

Mirrors the reference's BM_Encrypt / BM_Decrypt
(benchmark/bench_cryptography.cpp:73-121) at their largest batch size,
against BASELINE.json's north-star target of 100k encrypts/s/chip.

**Incremental artifact discipline** (the reference uploads a CSV artifact
per run, .github/workflows/github-ci.yml:100-116): the remote compile
service has documented intermittent multi-minute stalls
(.claude/skills/verify/SKILL.md), so a single end-of-run JSON line would
be voided by one stall anywhere.  Instead a parseable JSON line with the
same schema is printed (and superseded) at every milestone:

  1. right after the FIRST encrypt timing block  (decrypt fields null)
  2. after all encrypt timing blocks             (refined value)
  3. after decrypt                               (complete line)

A timeout kill at any point still leaves the latest line in the log tail;
consumers should take the LAST parseable JSON line.

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "decrypts_per_s": N|null, "encrypt_ms": N, "decrypt_ms": N|null,
   "encrypt_compile_s": N, "decrypt_compile_s": N|null,
   "partial": true|false}

Detail lines go to stderr as each stage completes.  Throughput is the
best of ``BLOCKS`` timing blocks (the tunneled TPU shows ~2x run-to-run
noise; the best block is the achievable per-chip rate).
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
ITERS = 20  # deep pipeline: the device queue hides host codec + dispatch
BLOCKS = 4  # timing blocks; report the best (tunnel noise is one-sided)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(enc_dt, enc_compile, dec_dt=None, dec_compile=None, partial=True):
    """Print the driver-parseable metric line (flushed immediately)."""
    enc_rate = BATCH / enc_dt
    print(
        json.dumps(
            {
                "metric": "paillier_2048_djn_encrypts_per_s_per_chip",
                "value": round(enc_rate, 1),
                "unit": "encrypts/s",
                "vs_baseline": round(enc_rate / BASELINE_TARGET, 4),
                "decrypts_per_s": (
                    round(BATCH / dec_dt, 1) if dec_dt else None
                ),
                "encrypt_ms": round(enc_dt * 1000, 2),
                "decrypt_ms": round(dec_dt * 1000, 2) if dec_dt else None,
                "encrypt_compile_s": round(enc_compile, 1),
                "decrypt_compile_s": (
                    round(dec_compile, 1) if dec_compile is not None else None
                ),
                "partial": partial,
            }
        ),
        flush=True,
    )


def _one_block(fn, sync):
    t = time.time()
    out = None
    for _ in range(ITERS):
        out = fn()
    sync(out)
    return (time.time() - t) / ITERS


def _best_block(fn, sync, nblocks, first_cb=None):
    """Best per-iteration seconds over ``nblocks`` blocks of ITERS calls.

    ``first_cb`` runs after the first block (used to emit a partial
    metric line as early as possible)."""
    best = float("inf")
    per = []
    for i in range(nblocks):
        dt = _one_block(fn, sync)
        per.append(dt)
        best = min(best, dt)
        if i == 0 and first_cb is not None:
            first_cb(dt)
    log(f"  blocks (ms): {[round(p * 1000, 1) for p in per]}")
    return best


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
    enc_compile = time.time() - t
    log(f"encrypt first (compile): {enc_compile:.1f}s")

    # Pipelined throughput: ciphertexts are device-resident (no host
    # round-trip per batch); the device executes dispatches in order, so
    # syncing the last batch bounds the wall time of all of them.
    enc_dt = _best_block(
        lambda: key.pub_key.encrypt(pt),
        lambda ct: ct.block_until_ready(),
        BLOCKS,
        first_cb=lambda dt: emit(dt, enc_compile),
    )
    enc_rate = BATCH / enc_dt
    log(f"encrypt batch={BATCH}: {enc_dt*1000:.1f} ms -> {enc_rate:.0f}/s")
    emit(enc_dt, enc_compile)

    t = time.time()
    dt_pt = key.priv_key.decrypt(ct)
    dt_pt.block_until_ready()
    dec_compile = time.time() - t
    log(f"decrypt first (compile): {dec_compile:.1f}s")
    dec_dt = _best_block(
        lambda: key.priv_key.decrypt(ct),
        lambda p: p.block_until_ready(),
        BLOCKS,
        first_cb=lambda dt: emit(enc_dt, enc_compile, dt, dec_compile),
    )
    dec_rate = BATCH / dec_dt
    log(f"decrypt batch={BATCH}: {dec_dt*1000:.1f} ms -> {dec_rate:.0f}/s")

    dt_pt = key.priv_key.decrypt(ct)
    assert dt_pt.texts == vals, "roundtrip mismatch!"
    log("roundtrip verified")

    emit(enc_dt, enc_compile, dec_dt, dec_compile, partial=False)


if __name__ == "__main__":
    main()
