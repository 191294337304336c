"""Pallas kernel correctness via the interpreter (CPU CI).

The fused kernels must compute exactly what the XLA reference path computes;
these tests run them in Pallas interpret mode against Python pow() and the
XLA implementations.  Real-TPU execution of the same kernels is covered by
bench.py and the tpu-marked tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import montgomery as mg
from pailliercryptolib_tpu.ops.pallas_modexp import (
    BATCH_TILE,
    pallas_mod_mul,
    pallas_modexp,
    pallas_mont_raw,
)


@pytest.fixture(scope="module")
def setup():
    import random

    rng = random.Random(11)
    nbits = 128
    n = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    ctx = mg.MontConstants.create(n)
    return rng, n, ctx


def _consts(ctx, G=1):
    n = jnp.asarray(np.stack([ctx.n_limbs] * G))
    n0 = jnp.asarray(np.array([ctx.n0inv] * G, np.uint32))
    r2 = jnp.asarray(np.stack([ctx.r2_limbs] * G))
    one = jnp.asarray(np.stack([ctx.one_limbs] * G))
    return n, n0, r2, one


def test_pallas_modexp_matches_pow(setup):
    rng, n_int, ctx = setup
    L, B, ebits = ctx.num_limbs, BATCH_TILE, 64
    bases = [rng.randrange(n_int) for _ in range(B)]
    exps = [rng.getrandbits(ebits) for _ in range(B - 2)] + [0, 1]
    base = jnp.asarray(lb.ints_to_limbs(bases, L))[None]
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))[None]
    n, n0, r2, one = _consts(ctx)
    out = pallas_modexp(base, wins, n, n0, r2, one, interpret=True)
    got = lb.limbs_to_ints(np.asarray(out[0]))
    assert got == [pow(b, e, n_int) for b, e in zip(bases, exps)]


def test_pallas_modexp_grouped(setup):
    """Two modulus systems in one launch (the CRT decrypt shape)."""
    import random

    rng = random.Random(13)
    n1 = rng.getrandbits(128) | (1 << 127) | 1
    n2 = rng.getrandbits(128) | (1 << 127) | 1
    c1, c2 = mg.MontConstants.create(n1), mg.MontConstants.create(n2)
    assert c1.num_limbs == c2.num_limbs
    L, B, ebits = c1.num_limbs, BATCH_TILE, 32
    bases = [[rng.randrange(m) for _ in range(B)] for m in (n1, n2)]
    exps = [[rng.getrandbits(ebits) for _ in range(B)] for _ in range(2)]
    base = jnp.asarray(
        np.stack([lb.ints_to_limbs(b, L) for b in bases])
    )
    wins = jnp.asarray(np.stack([lb.ints_to_windows(e, ebits) for e in exps]))
    n = jnp.asarray(np.stack([c1.n_limbs, c2.n_limbs]))
    n0 = jnp.asarray(np.array([c1.n0inv, c2.n0inv], np.uint32))
    r2 = jnp.asarray(np.stack([c1.r2_limbs, c2.r2_limbs]))
    one = jnp.asarray(np.stack([c1.one_limbs, c2.one_limbs]))
    out = pallas_modexp(base, wins, n, n0, r2, one, interpret=True)
    for g, m in enumerate((n1, n2)):
        got = lb.limbs_to_ints(np.asarray(out[g]))
        assert got == [pow(b, e, m) for b, e in zip(bases[g], exps[g])]


def test_pallas_mod_mul_matches(setup):
    rng, n_int, ctx = setup
    L, B = ctx.num_limbs, BATCH_TILE
    a_i = [rng.randrange(n_int) for _ in range(B)]
    b_i = [rng.randrange(n_int) for _ in range(B)]
    a = jnp.asarray(lb.ints_to_limbs(a_i, L))[None]
    b = jnp.asarray(lb.ints_to_limbs(b_i, L))[None]
    n, n0, r2, one = _consts(ctx)
    out = pallas_mod_mul(a, b, n, n0, r2, interpret=True)
    got = lb.limbs_to_ints(np.asarray(out[0]))
    assert got == [x * y % n_int for x, y in zip(a_i, b_i)]


def test_pallas_mont_raw_matches(setup):
    rng, n_int, ctx = setup
    L, B = ctx.num_limbs, BATCH_TILE
    R = 1 << (lb.LIMB_BITS * L)
    rinv = pow(R, -1, n_int)
    a_i = [rng.randrange(n_int) for _ in range(B)]
    b_i = [rng.randrange(n_int) for _ in range(B)]
    a = jnp.asarray(lb.ints_to_limbs(a_i, L))[None]
    b = jnp.asarray(lb.ints_to_limbs(b_i, L))[None]
    n, n0, r2, one = _consts(ctx)
    out = pallas_mont_raw(a, b, n, n0, interpret=True)
    got = lb.limbs_to_ints(np.asarray(mg.canonicalize(out[0])))
    for x, y, g in zip(a_i, b_i, got):
        assert g % n_int == x * y * rinv % n_int
        assert g < 2 * n_int


def test_engine_pallas_interpret_end_to_end():
    """Full scheme through the engines with backend=pallas_interpret."""
    import pailliercryptolib_tpu as ptpu

    key = ptpu.generate_keypair(256, enable_DJN=True)
    key.pub_key._engine.backend = "pallas_interpret"
    key.priv_key._engine.backend = "pallas_interpret"
    vals = [7, 1234567, 0, 2**31 - 1]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == vals
