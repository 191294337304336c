"""Unit tests for the big-integer helper ops (ops/bigint.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pailliercryptolib_tpu.ops import bigint as bi
from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops.montgomery import MontConstants


def test_mul_shared_full_product(rng):
    La, Lx = 20, 30
    a = rng.getrandbits(La * 15)
    xs = [rng.getrandbits(Lx * 15) for _ in range(5)]
    a_l = jnp.asarray(lb.int_to_limbs(a, La))
    x_l = jnp.asarray(lb.ints_to_limbs(xs, Lx))
    out = bi.mul_shared(a_l, x_l)
    got = lb.limbs_to_ints(np.asarray(out))
    assert got == [a * x for x in xs]


def test_mul_low_hensel_division(rng):
    """Exact division (x*p)/p via multiplication by p^{-1} mod 2^(15L)."""
    L = 20
    p = rng.getrandbits(200) | 1
    ts = [rng.getrandbits(90) for _ in range(4)]
    xs = [t * p for t in ts]
    inv = pow(p, -1, 1 << (15 * L))
    inv_l = jnp.asarray(lb.int_to_limbs(inv, L))
    x_l = jnp.asarray(lb.ints_to_limbs(xs, L + 14))
    out = bi.mul_low(inv_l, x_l, L)
    got = lb.limbs_to_ints(np.asarray(out))
    assert got == ts


def test_sub_mod(rng):
    m = rng.getrandbits(150) | (1 << 149) | 1
    L = lb.limbs_for_bits(150)
    xs = [rng.randrange(m) for _ in range(6)]
    ys = [rng.randrange(m) for _ in range(6)]
    x_l = jnp.asarray(lb.ints_to_limbs(xs, L))
    y_l = jnp.asarray(lb.ints_to_limbs(ys, L))
    m_l = jnp.asarray(lb.int_to_limbs(m, L))
    out = bi.sub_mod(x_l, y_l, m_l)
    got = lb.limbs_to_ints(np.asarray(out))
    assert got == [(x - y) % m for x, y in zip(xs, ys)]


def test_add_and_sub_scalar(rng):
    L = 12
    xs = [rng.getrandbits(L * 15 - 20) + 1 for _ in range(4)]
    x_l = jnp.asarray(lb.ints_to_limbs(xs, L))
    plus = bi.add_scalar(x_l, 5)
    minus = bi.sub_scalar(x_l, 1)
    assert lb.limbs_to_ints(np.asarray(plus)) == [x + 5 for x in xs]
    assert lb.limbs_to_ints(np.asarray(minus)) == [x - 1 for x in xs]


def test_mod_fold(rng):
    """Double-width reduction: x mod m with value < R guarantee."""
    mbits = 200
    m = rng.getrandbits(mbits) | (1 << (mbits - 1)) | 1
    ctx = MontConstants.create(m)
    L = ctx.num_limbs
    xs = [rng.getrandbits(2 * 15 * L - 2) for _ in range(5)]
    x_l = jnp.asarray(lb.ints_to_limbs(xs, 2 * L))
    n_d, n0inv, r2, _ = ctx.as_device_args()
    out = bi.mod_fold(x_l, n_d, n0inv, r2)
    got = lb.limbs_to_ints(np.asarray(out))
    R = 1 << (15 * L)
    for x, g in zip(xs, got):
        assert g % m == x % m
        assert g < R
