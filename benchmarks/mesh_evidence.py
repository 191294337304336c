#!/usr/bin/env python
"""Prove the mesh (shard_map) path on real TPU hardware.

The multi-chip path is normally validated on an 8-device *virtual CPU*
mesh (tests/test_parallel.py) because only one physical chip is
available; that leaves "shard_map-wrapped Pallas kernels compile and run
on hardware" unproven.  This script closes that gap: with
PAILLIER_TPU_FORCE_MESH=1 the engines accept a 1-device mesh, so the
full public-API encrypt + CRT-decrypt pipeline runs through the exact
shard_map stage wrapping (parallel/mesh.shard_stage) used at N devices —
on the real chip.  Writes benchmarks/results/mesh_evidence_v5e.json.

Run:  timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
        PAILLIER_TPU_FORCE_MESH=1 python benchmarks/mesh_evidence.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["PAILLIER_TPU_FORCE_MESH"] = "1"

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

import random

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.parallel.context import initialize_context

KEY_BITS = 2048
BATCH = 512


def main():
    ctx = initialize_context("TPU")
    devs = jax.devices()
    print(f"devices={devs} mesh={ctx.mesh}", file=sys.stderr, flush=True)
    assert ctx.mesh is not None

    rng = random.Random(0x4D455348)  # "MESH"
    key = ptpu.generate_keypair(KEY_BITS, enable_DJN=True)
    pe, de = key.pub_key._engine, key.priv_key._engine
    assert pe.mesh is not None and de.mesh is not None, "mesh not wired"

    vals = [rng.getrandbits(32) for _ in range(BATCH)]
    t = time.time()
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    ct.block_until_ready()
    enc_s = time.time() - t
    t = time.time()
    out = key.priv_key.decrypt(ct).texts
    dec_s = time.time() - t
    ok = out == vals
    print(f"roundtrip={ok} enc={enc_s:.1f}s dec={dec_s:.1f}s",
          file=sys.stderr, flush=True)
    assert ok, "mesh roundtrip mismatch"

    evidence = {
        "what": "public-API encrypt + CRT decrypt through shard_map "
                "stages (parallel/mesh.shard_stage) on a 1-device TPU "
                "mesh, PAILLIER_TPU_FORCE_MESH=1",
        "device": str(devs[0]),
        "mesh_axes": dict(ctx.mesh.shape),
        "key_bits": KEY_BITS,
        "batch": BATCH,
        "backend": pe.backend,
        "roundtrip_ok": ok,
        "encrypt_first_s": round(enc_s, 1),
        "decrypt_first_s": round(dec_s, 1),
        "date": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(
        os.path.dirname(__file__), "results", "mesh_evidence_v5e.json"
    )
    with open(path, "w") as f:
        json.dump(evidence, f, indent=1)
    print(json.dumps(evidence))


if __name__ == "__main__":
    main()
