"""v2 fused RNS kernels (ops/pallas_rns2.py) vs Python pow() (interpret)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import rns
from pailliercryptolib_tpu.ops.pallas_rns2 import (
    BATCH_TILE,
    fold_group_consts2,
    pallas_rns_modexp2,
    pallas_rns_modexp2f,
    stack_group_consts2,
    unfold_rns_out,
)


@pytest.fixture(scope="module")
def ctx256():
    rng = random.Random(177)
    N = rng.getrandbits(256) | (1 << 255) | 1
    return rng, N, rns.RNSContext.create(N)


def test_modexp2_variable_windows(ctx256):
    rng, N, c = ctx256
    consts = stack_group_consts2([c])
    B, ebits = BATCH_TILE, 32
    bases = [rng.randrange(N) for _ in range(B - 2)] + [0, 1]
    exps = [rng.getrandbits(ebits) for _ in range(B - 2)] + [0, 1]
    x = jnp.asarray(lb.ints_to_limbs(bases, c.Lin))[None]
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))[None]
    out = pallas_rns_modexp2(x, wins, consts, interpret=True)
    vals = lb.limbs_to_ints(
        np.asarray(rns.rns_to_limbs(out[0], c.device_consts()))
    )
    for b, e, v in zip(bases, exps, vals):
        assert v % N == pow(b, e, N)
        assert v <= 2 * N


@pytest.mark.parametrize("f32_mu", [False, True])
def test_modexp2_shared_windows_grouped(ctx256, f32_mu):
    """Two modulus systems, one shared exponent each (the CRT decrypt
    configuration: SMEM windows, no per-row selects); both _red_mu
    flavors (integer Barrett and f32 reciprocal)."""
    rng = random.Random(199)
    n1 = rng.getrandbits(200) | (1 << 199) | 1
    n2 = rng.getrandbits(200) | (1 << 199) | 1
    c1 = rns.RNSContext.create(n1, product_bits=204)
    c2 = rns.RNSContext.create(n2, product_bits=204)
    assert c1.k == c2.k
    consts = stack_group_consts2([c1, c2], f32_mu=f32_mu)
    B, ebits = BATCH_TILE, 24
    bases = [[rng.randrange(m) for _ in range(B)] for m in (n1, n2)]
    exps = [rng.getrandbits(ebits) for _ in range(2)]
    x = jnp.asarray(np.stack([lb.ints_to_limbs(b, c1.Lin) for b in bases]))
    wins = jnp.asarray(
        np.concatenate([lb.ints_to_windows([e], ebits) for e in exps])
    )  # [2, NW]
    out = pallas_rns_modexp2(x, wins, consts, shared=True, interpret=True)
    for g, (m, c) in enumerate(((n1, c1), (n2, c2))):
        vals = lb.limbs_to_ints(
            np.asarray(rns.rns_to_limbs(out[g], c.device_consts()))
        )
        for b, v in zip(bases[g], vals):
            assert v % m == pow(b, exps[g], m)


@pytest.mark.slow
def test_modexp2_wide_pool_6400():
    """The fused kernel on a WIDE-POOL context (moduli below 2^13 — the
    4096-bit-key n^2 class): the constant builders must auto-select the
    f32-reciprocal flavor and stay exact vs pow()."""
    from pailliercryptolib_tpu.ops.rns import is_wide_pool

    rng = random.Random(31)
    N = rng.getrandbits(6400) | (1 << 6399) | 1
    c = rns.RNSContext.create(N)
    assert is_wide_pool(c)
    consts = stack_group_consts2([c])  # f32_mu forced by the wide pool
    assert consts["muA"].dtype == jnp.float32
    B, ebits = BATCH_TILE, 12
    bases = [rng.randrange(N) for _ in range(B - 2)] + [0, 1]
    exps = [rng.getrandbits(ebits) for _ in range(B - 2)] + [0, 1]
    x = jnp.asarray(lb.ints_to_limbs(bases, c.Lin))[None]
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))[None]
    out = pallas_rns_modexp2(x, wins, consts, interpret=True)
    vals = lb.limbs_to_ints(
        np.asarray(rns.rns_to_limbs(out[0], c.device_consts()))
    )
    for b, e, v in zip(bases, exps, vals):
        assert v % N == pow(b, e, N)


def test_modexp2_shared_production_tile(ctx256):
    """The production decrypt configuration — batch_tile=256 with 8
    streams (models/engine.py decrypt_crt stage) — in interpret mode, so
    a stream-slicing bug specific to h = 256/8 = 32 rows cannot reach
    TPU-only code paths untested."""
    rng, N, c = ctx256
    consts = stack_group_consts2([c], f32_mu=True)
    B, ebits = 256, 12
    bases = [rng.randrange(N) for _ in range(B - 2)] + [0, 1]
    e = rng.getrandbits(ebits) | 1
    x = jnp.asarray(lb.ints_to_limbs(bases, c.Lin))[None]
    wins = jnp.asarray(lb.ints_to_windows([e], ebits))
    out = pallas_rns_modexp2(
        x, wins, consts, shared=True, batch_tile=256, streams=8,
        interpret=True,
    )
    vals = lb.limbs_to_ints(
        np.asarray(rns.rns_to_limbs(out[0], c.device_consts()))
    )
    for b, v in zip(bases, vals):
        assert v % N == pow(b, e, N)


@pytest.mark.parametrize(
    "streams,f32_mu", [(1, False), (4, False), (4, True)]
)
def test_modexp2_folded_crt(streams, f32_mu):
    """CRT-folded kernel: both residue systems side by side on the lane
    axis of ONE kernel step, two SMEM shared exponents."""
    rng = random.Random(211)
    n1 = rng.getrandbits(200) | (1 << 199) | 1
    n2 = rng.getrandbits(200) | (1 << 199) | 1
    c1 = rns.RNSContext.create(n1, product_bits=204)
    c2 = rns.RNSContext.create(n2, product_bits=204)
    consts = fold_group_consts2([c1, c2], f32_mu=f32_mu)
    B, ebits = BATCH_TILE, 24
    bases = [[rng.randrange(m) for _ in range(B - 2)] + [0, 1] for m in (n1, n2)]
    exps = [rng.getrandbits(ebits) | 1 for _ in range(2)]
    x = np.concatenate(
        [lb.ints_to_limbs(b, c1.Lin) for b in bases], axis=-1
    )  # [B, 2L]: p-limbs | q-limbs per row
    wins = jnp.asarray(
        np.concatenate([lb.ints_to_windows([e], ebits) for e in exps])
    )  # [2, NW]
    out = pallas_rns_modexp2f(
        jnp.asarray(x), wins, consts, streams=streams, interpret=True
    )
    res = unfold_rns_out(out, c1.k)
    for g, (m, c) in enumerate(((n1, c1), (n2, c2))):
        vals = lb.limbs_to_ints(
            np.asarray(rns.rns_to_limbs(res[g], c.device_consts()))
        )
        for b, v in zip(bases[g], vals):
            assert v % m == pow(b, exps[g], m)
            assert v <= 2 * m
