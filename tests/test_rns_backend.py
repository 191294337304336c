"""RNS/MXU backend: kernel correctness (interpret) + engine end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops import limbs as lb
from pailliercryptolib_tpu.ops import rns
from pailliercryptolib_tpu.ops.pallas_rns import (
    BATCH_TILE,
    pallas_rns_modexp,
    stack_group_consts,
)


@pytest.fixture(scope="module")
def ctx256():
    import random

    rng = random.Random(77)
    N = rng.getrandbits(256) | (1 << 255) | 1
    return rng, N, rns.RNSContext.create(N)


def test_pallas_rns_modexp_limb_input(ctx256):
    rng, N, c = ctx256
    consts = stack_group_consts([c])
    B, ebits = BATCH_TILE, 32
    bases = [rng.randrange(N) for _ in range(B - 2)] + [0, 1]
    exps = [rng.getrandbits(ebits) for _ in range(B - 2)] + [0, 1]
    x = jnp.asarray(lb.ints_to_limbs(bases, c.Lin))[None]
    wins = jnp.asarray(lb.ints_to_windows(exps, ebits))[None]
    out = pallas_rns_modexp(x, wins, consts, interpret=True)
    cd = c.device_consts()
    vals = lb.limbs_to_ints(np.asarray(rns.rns_to_limbs(out[0], cd)))
    for b, e, v in zip(bases, exps, vals):
        assert v % N == pow(b, e, N)
        assert v <= 2 * N


def test_pallas_rns_modexp_grouped(ctx256):
    """Two modulus systems, one launch, with product_bits pinning equal k
    (the CRT decrypt configuration)."""
    import random

    rng = random.Random(99)
    n1 = rng.getrandbits(200) | (1 << 199) | 1
    n2 = rng.getrandbits(200) | (1 << 199) | 1
    c1 = rns.RNSContext.create(n1, product_bits=204)
    c2 = rns.RNSContext.create(n2, product_bits=204)
    assert c1.k == c2.k and c1.Lin == c2.Lin
    consts = stack_group_consts([c1, c2])
    B, ebits = BATCH_TILE, 16
    bases = [[rng.randrange(m) for _ in range(B)] for m in (n1, n2)]
    exps = [[rng.getrandbits(ebits) for _ in range(B)] for _ in range(2)]
    x = jnp.asarray(
        np.stack([lb.ints_to_limbs(b, c1.Lin) for b in bases])
    )
    wins = jnp.asarray(np.stack([lb.ints_to_windows(e, ebits) for e in exps]))
    out = pallas_rns_modexp(x, wins, consts, interpret=True)
    for g, (m, c) in enumerate(((n1, c1), (n2, c2))):
        vals = lb.limbs_to_ints(
            np.asarray(rns.rns_to_limbs(out[g], c.device_consts()))
        )
        for b, e, v in zip(bases[g], exps[g], vals):
            assert v % m == pow(b, e, m)


def test_engine_rns_interpret_end_to_end():
    key = ptpu.generate_keypair(256, enable_DJN=True)
    for e in (key.pub_key._engine, key.priv_key._engine):
        e.backend = "rns_interpret"
    vals = [7, 1234567, 0, 2**31 - 1]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    assert key.priv_key.decrypt(ct).texts == vals
    m3 = ct * ptpu.PlainText([3, 3, 3, 3])
    assert key.priv_key.decrypt(m3).texts == [3 * v for v in vals]
    key.priv_key.enable_crt = False
    assert key.priv_key.decrypt(ct).texts == vals


def test_engine_rns_interpret_normal_mode():
    key = ptpu.generate_keypair(256, enable_DJN=False)
    for e in (key.pub_key._engine, key.priv_key._engine):
        e.backend = "rns_interpret"
    vals = [5, 99]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    assert key.priv_key.decrypt(ct).texts == vals
