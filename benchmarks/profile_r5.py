#!/usr/bin/env python
"""Round-5 TPU profile: decrypt layout/stream A-B + encrypt stage split.

Measures, at 2048-bit keys and batch 2048 on the real chip:

  1. CRT decrypt end-to-end: FOLDED lane layout (new: fold-free input,
     _group_bcast alphas) vs GROUPED (round-4 default), each at
     (batch_tile, streams) in {(128, 4), (256, 8)}.
  2. Decrypt stage split on the winner: kernel / finalize / tail.
  3. Encrypt stage split: fb kernel / post stage / end-to-end.

Every result prints to stderr the moment it exists (stall-tolerant) and
is appended to benchmarks/results/profile_r5_v5e.jsonl with a method
stamp.  Run:
  timeout 3000 env PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/profile_r5.py
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

import random

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops import paillier_ops as pops
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    pallas_rns_modexp2,
    pallas_rns_modexp2f,
)

KEY_BITS = 2048
BATCH = 2048
ITERS = 10
BLOCKS = 3

OUT = os.path.join(os.path.dirname(__file__), "results", "profile_r5_v5e.jsonl")
METHOD = {
    "method": f"best of {BLOCKS} blocks x {ITERS} pipelined iters, "
              "sync via 1-element device_get",
    "key_bits": KEY_BITS,
    "batch": BATCH,
    "date": time.strftime("%Y-%m-%d"),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def record(name, ms, **extra):
    row = {"name": name, "ms_per_batch": round(ms, 2), **extra, **METHOD}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"  -> {name}: {ms:.2f} ms/batch {extra if extra else ''}")


def sync(x):
    if hasattr(x, "sync"):  # DevLimbs
        x.sync()
        return
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:1]))


def timeit(name, fn, **extra):
    t0 = time.time()
    out = fn()
    sync(out)
    log(f"  {name}: first call {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(BLOCKS):
        t = time.time()
        for _ in range(ITERS):
            out = fn()
        sync(out)
        best = min(best, (time.time() - t) / ITERS)
    record(name, best * 1000, **extra)
    return out


def main():
    rng = random.Random(0xA5)
    key = ptpu.generate_keypair(KEY_BITS, enable_DJN=True)
    pe, de = key.pub_key._engine, key.priv_key._engine
    log(f"devices={jax.devices()} backend={pe.backend}")

    vals = [rng.getrandbits(32) for _ in range(BATCH)]
    pt = ptpu.PlainText(vals)
    ct = key.pub_key.encrypt(pt)
    ct.block_until_ready()
    dev = ct._dev
    ct_a, _ = de._ct_operand(dev, 2 * de.Lp2)

    # ---- 1. decrypt layout / tile A-B ------------------------------------
    layouts = () if "--skip-kernels" in sys.argv else ("folded", "grouped")
    for layout in layouts:
        os.environ["PAILLIER_TPU_DECRYPT_LAYOUT"] = layout
        de._rns_crt = None
        kc2, conv2 = de.rns_crt
        for bt, streams in ((128, 4), (256, 8)):
            if layout == "folded":
                fn = functools.partial(
                    _folded_kernel, ct_a, de.exp_wins[:, 0], kc2, bt, streams
                )
            else:
                fn = functools.partial(
                    _grouped_kernel, ct_a, de.exp_wins[:, 0], kc2, bt, streams
                )
            timeit(f"decrypt_kernel[{layout},bt={bt},s={streams}]", fn)

    # engine end-to-end per layout (engine picks bt=256/s=8 at B=2048)
    for layout in ("folded", "grouped"):
        os.environ["PAILLIER_TPU_DECRYPT_LAYOUT"] = layout
        de._rns_crt = None
        out = timeit(
            f"decrypt_e2e[{layout}]",
            lambda: de.decrypt_crt_dev(dev),
        )
        got = out.fetch()
        assert got == vals, f"decrypt[{layout}] roundtrip MISMATCH on TPU"
        log(f"  decrypt[{layout}] roundtrip verified")

    # ---- 2. decrypt stage split on the folded path -----------------------
    os.environ["PAILLIER_TPU_DECRYPT_LAYOUT"] = "folded"
    de._rns_crt = None
    kc2, conv2 = de.rns_crt
    k = kc2["sig0"].shape[-1] // 2

    res_f = _folded_kernel(ct_a, de.exp_wins[:, 0], kc2, 256, 8)
    sync(res_f)

    @jax.jit
    def finalize(res_f):
        from pailliercryptolib_tpu.ops.pallas_rns2 import unfold_rns_out

        res_rns = unfold_rns_out(res_f, k)
        return jax.vmap(pops._rns_finalize, in_axes=(0, 0, 0, None))(
            res_rns, conv2, de.sq_n, de.Lp2
        )

    res = timeit("decrypt_finalize", lambda: finalize(res_f))
    sync(res)

    @jax.jit
    def tail(res):
        from pailliercryptolib_tpu.ops.bigint import (
            mul_low, mul_shared, sub_mod, sub_scalar,
        )
        from pailliercryptolib_tpu.ops.dispatch import (
            mod_mul_backend, mod_mul_backend_grouped,
        )
        from pailliercryptolib_tpu.ops.montgomery import canonicalize

        Lp = de.pq_n.shape[-1]

        def lfun(r, hens):
            return mul_low(hens, sub_scalar(r, 1), Lp)

        ts = jax.vmap(lfun, in_axes=(0, 0))(res, de.hensel)
        dphalves = mod_mul_backend_grouped(
            ts, de.hfun[:, None, :], de.pq_n, de.pq_n0inv, de.pq_r2, "pallas"
        )
        dp, dq = dphalves[0], dphalves[1]
        u = sub_mod(dq, dp, de.pq_n[1])
        u2 = mod_mul_backend(
            u, de.pinv_q, de.pq_n[1], de.pq_n0inv[1], de.pq_r2[1], "pallas"
        )
        prod = mul_shared(de.p_limbs, u2)
        m = canonicalize(prod.at[..., :Lp].add(dp))
        return m[..., : 2 * Lp]

    timeit("decrypt_tail", lambda: tail(res))

    # ---- 3. encrypt stage split -----------------------------------------
    from pailliercryptolib_tpu.utils.rng import batch_random_bytes

    _, kc, conv = pe.rns
    planes, NP = pe.fixedbase
    r = batch_random_bytes(BATCH, pe.randbits)
    rb = np.zeros((BATCH, NP), np.uint8)
    rb[:, : r.shape[1]] = r
    r_b = jnp.asarray(rb)
    m_p = pe._pad(vals, 0)
    m_a = pe._upload_narrow(m_p)
    n2_n, n2_n0inv, n2_r2, _ = pe.n2_args

    res_fb = timeit(
        "encrypt_fb_kernel",
        lambda: pops.rns_fb_modexp_stage(planes, r_b, kc, mont_out=True),
    )
    timeit(
        "encrypt_post",
        lambda: pops.encrypt_post_stage(
            res_fb, m_a, pe.n_limbs, conv, n2_n, n2_n0inv, n2_r2,
            res_mont=True,
        ),
    )
    out = timeit("encrypt_e2e", lambda: pe.encrypt_djn_dev(vals, r))
    # oracle check on the last batch: encryption with known r must equal pow()
    n, n2 = key.pub_key.n, key.pub_key.n ** 2
    rs = [int.from_bytes(bytes(row), "little") for row in r[:4]]
    got = out.fetch()[:4]
    hs = key.pub_key.hs
    ok = all(
        g == (n * m + 1) * pow(hs, ri, n2) % n2
        for g, m, ri in zip(got, vals[:4], rs)
    )
    assert ok, "encrypt oracle MISMATCH on TPU"
    log("  encrypt oracle verified")

    log("done")


def _folded_kernel(ct_a, wins, kc2, bt, streams):
    return pallas_rns_modexp2f(
        ct_a, wins, kc2, batch_tile=bt, streams=streams
    )


def _grouped_kernel(ct_a, wins, kc2, bt, streams):
    bases = jnp.broadcast_to(ct_a[None], (2,) + ct_a.shape)
    return pallas_rns_modexp2(
        bases, wins, kc2, shared=True, batch_tile=bt, streams=streams
    )


if __name__ == "__main__":
    main()
