"""RNS Montgomery arithmetic vs Python ints (the MXU-path correctness suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import rns
from pailliercryptolib_tpu.ops.montgomery import MontConstants


def _odd(rng, nbits):
    return rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1


@pytest.fixture(scope="module")
def ctx256():
    import random

    rng = random.Random(21)
    N = _odd(rng, 256)
    return rng, N, rns.RNSContext.create(N)


def test_context_invariants(ctx256):
    _, N, c = ctx256
    assert c.MA >= rns.GUARD_FACTOR * N
    assert c.MB >= rns.GUARD_FACTOR * N
    assert c.k < c.mr
    mods = [int(m) for m in c.mods]
    assert len(set(mods)) == len(mods)
    assert all((1 << 13) < m < (1 << 14) for m in mods)


@pytest.mark.slow
def test_max_modulus_gate_matches_allocator():
    """The width gate and create()'s allocator must agree exactly: create
    succeeds at rns_max_modulus_bits() and raises just past it (the gate
    simulates the allocator, so drift means a wrong fallback decision)."""
    import math

    top = rns.rns_max_modulus_bits()
    N = (1 << top) - 3  # odd, exactly `top` bits
    pool_prod = math.prod(rns._prime_pool())
    while math.gcd(N, pool_prod) != 1:  # N must be coprime to the pool
        N -= 2  # (Paillier moduli p*q / p^2 always are)
    c = rns.RNSContext.create(N)
    assert c.MA > N and c.MB > N
    with pytest.raises(ValueError):
        rns.RNSContext.create((1 << (top + 16)) - 3)


@pytest.mark.slow
def test_wide_pool_oracle_6400():
    """Wide-pool contexts (moduli below 2^13, reached by 6k+ -bit N — the
    4096-bit-key n^2 class) must stay exact: the f32-reciprocal
    barrett_reduce flavor ships via device_consts and every conversion /
    Montgomery product matches Python ints."""
    import random

    rng = random.Random(5)
    N = rng.getrandbits(6400) | (1 << 6399) | 1
    c = rns.RNSContext.create(N)
    assert rns.is_wide_pool(c)
    conv = c.device_consts()
    assert conv["barrett"].dtype == jnp.float32
    B = 4
    xs = [rng.randrange(N) for _ in range(B)]
    ys = [rng.randrange(N) for _ in range(B)]
    xr = rns.limbs_to_rns(jnp.asarray(lb.ints_to_limbs(xs, c.Lin)), conv)
    back = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(xr, conv)))
    assert [int(b) for b in back] == xs
    yr = rns.limbs_to_rns(jnp.asarray(lb.ints_to_limbs(ys, c.Lin)), conv)
    zr = rns.rns_mont_mul(xr, yr, conv)
    zv = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(zr, conv)))
    MAinv = pow(c.MA, -1, N)
    for v, a, b in zip(zv, xs, ys):
        assert v % N == (a * b * MAinv) % N and v < 3 * N
    es = [rng.getrandbits(24) for _ in range(B)]
    wins = jnp.asarray(lb.ints_to_windows(es, 24))
    out = rns.rns_mont_exp(xr, wins, conv)
    ov = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(out, conv)))
    for v, a, e in zip(ov, xs, es):
        assert v % N == pow(a, e, N)


def test_residue_conversion_roundtrip(ctx256):
    rng, N, c = ctx256
    cd = c.device_consts()
    vals = [rng.randrange(N) for _ in range(6)] + [0, 1, N - 1]
    x = jnp.asarray(lb.ints_to_limbs(vals, c.Lin))
    res = rns.limbs_to_rns(x, cd)
    got = np.asarray(res)
    for b, v in enumerate(vals):
        want = np.array([v % int(m) for m in c.mods], np.uint32)
        assert (got[b] == want).all(), f"residue mismatch at {b}"
    # back to limbs (values < 3N requirement satisfied: v < N)
    back = rns.rns_to_limbs(res, cd)
    ints = lb.limbs_to_ints(np.asarray(back))
    assert ints == vals


def test_rns_mont_mul(ctx256):
    rng, N, c = ctx256
    cd = c.device_consts()
    B = 8
    MAinv = pow(c.MA, -1, N)
    xs = [rng.randrange(3 * N) for _ in range(B - 1)] + [3 * N - 1]
    ys = [rng.randrange(3 * N) for _ in range(B - 1)] + [3 * N - 1]
    x = jnp.asarray(np.stack([c.to_residues(v) for v in xs]))
    y = jnp.asarray(np.stack([c.to_residues(v) for v in ys]))
    out = rns.rns_mont_mul(x, y, cd)
    vals = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(out, cd)))
    for xi, yi, v in zip(xs, ys, vals):
        assert v < 3 * N, "invariant violated"
        assert v % N == xi * yi * MAinv % N


def test_rns_mont_mul_iterated(ctx256):
    """Invariant stability over a chain of multiplications."""
    rng, N, c = ctx256
    cd = c.device_consts()
    MAinv = pow(c.MA, -1, N)
    x = jnp.asarray(np.stack([c.to_residues(rng.randrange(N)) for _ in range(4)]))
    ref = [int(v) for v in []]
    cur = x
    want = [lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(x, cd)))[i] for i in range(4)]
    for _ in range(16):
        cur = rns.rns_mont_mul(cur, cur, cd)
        want = [w * w * MAinv % N for w in want]
    got = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(cur, cd)))
    for g, w in zip(got, want):
        assert g < 3 * N and g % N == w


@pytest.mark.parametrize("ebits", [1, 16, 64])
def test_rns_mont_exp(ctx256, ebits):
    rng, N, c = ctx256
    cd = c.device_consts()
    B = 8
    bases = [rng.randrange(N) for _ in range(B)]
    exps = [rng.getrandbits(ebits) for _ in range(B - 2)] + [0, 1]
    x = jnp.asarray(np.stack([c.to_residues(v) for v in bases]))
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))
    out = rns.rns_mont_exp(x, wins, cd)
    vals = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(out, cd)))
    for b, e, v in zip(bases, exps, vals):
        assert v % N == pow(b, e, N)
        assert v <= 2 * N


@pytest.mark.slow
def test_rns_mont_exp_2048key_shape():
    """Full 4096-bit modulus (2048-bit-key n^2 shape), 128-bit exponents."""
    import random

    rng = random.Random(31)
    N = _odd(rng, 4096)
    c = rns.RNSContext.create(N)
    cd = c.device_consts()
    B = 4
    bases = [rng.randrange(N) for _ in range(B)]
    exps = [rng.getrandbits(128) for _ in range(B)]
    x = jnp.asarray(np.stack([c.to_residues(v) for v in bases]))
    wins = jnp.asarray(lb.ints_to_windows(exps, 128))
    out = rns.rns_mont_exp(x, wins, cd)
    vals = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(out, cd)))
    for b, e, v in zip(bases, exps, vals):
        assert v % N == pow(b, e, N)
