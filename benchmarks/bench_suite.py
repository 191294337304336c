#!/usr/bin/env python
"""Full benchmark suite mirroring the reference harness
(benchmark/bench_cryptography.cpp + bench_ops.cpp): keygen, encrypt,
decrypt, CT+CT, CT+PT, CT*PT across the reference batch sizes.

Usage:  python benchmarks/bench_suite.py [--bits 2048] [--batches 16,256,2048]
Prints one JSON line per (op, batch).

Methodology matches bench.py's headline exactly — best of ``--blocks``
timing blocks of ``--iters`` pipelined calls (the tunneled TPU shows ~2x
one-sided run-to-run noise; the best block is the achievable rate) — and
the first output line stamps method/config/date so artifacts from
different runs are comparable (round-4 review flagged an unexplained 60%
spread between the differently-methoded headline and suite artifacts).
"""

import argparse
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

DEFAULT_BATCHES = [16, 64, 128, 256, 512, 1024, 2048]  # bench_cryptography.cpp:10-19


def timed(fn, iters=3, blocks=3):
    """Best per-call seconds over ``blocks`` blocks of ``iters`` pipelined
    calls (same method as bench.py's headline)."""

    def sync(x):
        if hasattr(x, "block_until_ready"):
            x.block_until_ready()
        return x

    sync(fn())  # warm / compile
    best = float("inf")
    for _ in range(blocks):
        t = time.time()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.time() - t) / iters)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=2048)
    ap.add_argument("--batches", type=str, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=3)
    args = ap.parse_args()
    batches = (
        [int(b) for b in args.batches.split(",")] if args.batches else DEFAULT_BATCHES
    )
    rng = random.Random(1)

    print(json.dumps({
        "meta": "bench_suite",
        "method": f"best of {args.blocks} blocks x {args.iters} "
                  "pipelined iters, device-synced per block",
        "bits": args.bits,
        "date": time.strftime("%Y-%m-%d"),
        "device": str(jax.devices()[0]),
    }), flush=True)

    t = time.time()
    key = ptpu.generate_keypair(args.bits, enable_DJN=True)
    print(json.dumps({"op": "keygen", "bits": args.bits,
                      "ms": round((time.time() - t) * 1e3, 1)}), flush=True)

    for B in batches:
        vals = [rng.getrandbits(32) for _ in range(B)]
        pt = ptpu.PlainText(vals)
        three = ptpu.PlainText([3] * B)

        dt, ct = timed(lambda: key.pub_key.encrypt(pt), args.iters, args.blocks)
        print(json.dumps({"op": "encrypt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: key.priv_key.decrypt(ct), args.iters, args.blocks)
        print(json.dumps({"op": "decrypt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct + ct, args.iters, args.blocks)
        print(json.dumps({"op": "add_ctct", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct + pt, args.iters, args.blocks)
        print(json.dumps({"op": "add_ctpt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct * three, args.iters, args.blocks)
        print(json.dumps({"op": "mul_ctpt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)


if __name__ == "__main__":
    main()
