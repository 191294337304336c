#!/usr/bin/env python
"""Full benchmark suite mirroring the reference harness
(benchmark/bench_cryptography.cpp + bench_ops.cpp): keygen, encrypt,
decrypt, CT+CT, CT+PT, CT*PT across the reference batch sizes.

Usage:  python benchmarks/bench_suite.py [--bits 2048] [--batches 16,256,2048]
Prints one JSON line per (op, batch).
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


def timed(fn, iters=3):
    def sync(x):
        if hasattr(x, "block_until_ready"):
            x.block_until_ready()
        return x

    sync(fn())  # warm / compile
    t = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.time() - t) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=2048)
    ap.add_argument("--batches", type=str, default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    batches = (
        [int(b) for b in args.batches.split(",")] if args.batches else DEFAULT_BATCHES
    )
    rng = random.Random(1)

    t = time.time()
    key = ptpu.generate_keypair(args.bits, enable_DJN=True)
    print(json.dumps({"op": "keygen", "bits": args.bits,
                      "ms": round((time.time() - t) * 1e3, 1)}), flush=True)

    for B in batches:
        vals = [rng.getrandbits(32) for _ in range(B)]
        pt = ptpu.PlainText(vals)
        three = ptpu.PlainText([3] * B)

        dt, ct = timed(lambda: key.pub_key.encrypt(pt), args.iters)
        print(json.dumps({"op": "encrypt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: key.priv_key.decrypt(ct), args.iters)
        print(json.dumps({"op": "decrypt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct + ct, args.iters)
        print(json.dumps({"op": "add_ctct", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct + pt, args.iters)
        print(json.dumps({"op": "add_ctpt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)
        dt, _ = timed(lambda: ct * three, args.iters)
        print(json.dumps({"op": "mul_ctpt", "batch": B, "ms": round(dt * 1e3, 1),
                          "per_s": round(B / dt)}), flush=True)


if __name__ == "__main__":
    main()
