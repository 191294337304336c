"""Property tests of the Montgomery core against Python pow()."""

import jax.numpy as jnp
import numpy as np
import pytest

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import montgomery as mg


def _random_odd(rng, nbits):
    n = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    return n


@pytest.mark.parametrize("nbits", [64, 256, 1024])
def test_mont_mul_matches_pow(nbits, rng):
    n = _random_odd(rng, nbits)
    ctx = mg.MontConstants.create(n)
    L = ctx.num_limbs
    R = 1 << (lb.LIMB_BITS * L)
    batch = 8
    a_int = [rng.randrange(n) for _ in range(batch)]
    b_int = [rng.randrange(n) for _ in range(batch)]
    a = jnp.asarray(lb.ints_to_limbs(a_int, L))
    b = jnp.asarray(lb.ints_to_limbs(b_int, L))
    n_d, n0inv, r2, one = ctx.as_device_args()
    out = mg.mont_mul(a, b, n_d, n0inv)
    out_c = mg.canonicalize(out)
    got = lb.limbs_to_ints(np.asarray(out_c))
    rinv = pow(R, -1, n)
    for ai, bi, gi in zip(a_int, b_int, got):
        want = ai * bi * rinv % n
        assert gi % n == want
        assert gi < 2 * n  # "without final subtraction" bound


@pytest.mark.parametrize("nbits,ebits", [(64, 64), (256, 128), (1024, 512)])
def test_mont_exp_matches_pow(nbits, ebits, rng):
    n = _random_odd(rng, nbits)
    ctx = mg.MontConstants.create(n)
    L = ctx.num_limbs
    batch = 6
    bases = [rng.randrange(n) for _ in range(batch)]
    exps = [rng.getrandbits(ebits) for _ in range(batch - 2)] + [0, 1]
    base = jnp.asarray(lb.ints_to_limbs(bases, L))
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))
    n_d, n0inv, r2, one = ctx.as_device_args()
    out = mg.mont_exp(base, wins, n_d, n0inv, r2, one)
    got = lb.limbs_to_ints(np.asarray(out))
    for bi, ei, gi in zip(bases, exps, got):
        assert gi == pow(bi, ei, n)


def test_mont_exp_shared_exponent(rng):
    """Shared exponent broadcasting: windows [1, NW] against base [B, L]."""
    n = _random_odd(rng, 256)
    ctx = mg.MontConstants.create(n)
    L = ctx.num_limbs
    bases = [rng.randrange(n) for _ in range(5)]
    e = rng.getrandbits(256)
    base = jnp.asarray(lb.ints_to_limbs(bases, L))
    wins = jnp.asarray(lb.ints_to_windows([e], 256))
    n_d, n0inv, r2, one = ctx.as_device_args()
    out = mg.mont_exp(base, wins, n_d, n0inv, r2, one)
    got = lb.limbs_to_ints(np.asarray(out))
    for bi, gi in zip(bases, got):
        assert gi == pow(bi, e, n)


def test_mont_mod_mul(rng):
    n = _random_odd(rng, 512)
    ctx = mg.MontConstants.create(n)
    L = ctx.num_limbs
    a_int = [rng.randrange(n) for _ in range(4)]
    b_int = [rng.randrange(n) for _ in range(4)]
    a = jnp.asarray(lb.ints_to_limbs(a_int, L))
    b = jnp.asarray(lb.ints_to_limbs(b_int, L))
    n_d, n0inv, r2, one = ctx.as_device_args()
    out = mg.mont_mod_mul(a, b, n_d, n0inv, r2)
    got = lb.limbs_to_ints(np.asarray(out))
    for ai, bi, gi in zip(a_int, b_int, got):
        assert gi == ai * bi % n


def test_cond_sub_and_canonicalize(rng):
    n = _random_odd(rng, 200)
    ctx = mg.MontConstants.create(n)
    L = ctx.num_limbs
    vals = [0, 1, n - 1, n, n + 1, 2 * n - 1]
    x = jnp.asarray(lb.ints_to_limbs(vals, L))
    out = mg.cond_sub_n(x, jnp.asarray(ctx.n_limbs))
    got = lb.limbs_to_ints(np.asarray(out))
    assert got == [v % n for v in vals]
