"""RNS/MXU backend: engine end-to-end on the interpreted v2 kernels.

Kernel-level numerical contracts live in tests/test_rns2.py; this file
drives the full scheme (encrypt / decrypt CRT+RAW / CT*PT / obfuscation)
through the engines with backend="rns_interpret".
"""

import pailliercryptolib_tpu as ptpu


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


def test_engine_rns_interpret_scalar_ctpt():
    """Scalar CT*PT routes through the shared-exponent kernel (size-1 PT
    is NOT replicated host-side)."""
    key = ptpu.generate_keypair(256, enable_DJN=True)
    for e in (key.pub_key._engine, key.priv_key._engine):
        e.backend = "rns_interpret"
    vals = [3, 14, 159]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    out = ct * ptpu.PlainText([7])
    assert key.priv_key.decrypt(out).texts == [7 * v for v in vals]


def test_engine_rns_interpret_apply_obfuscator():
    key = ptpu.generate_keypair(256, enable_DJN=True)
    for e in (key.pub_key._engine, key.priv_key._engine):
        e.backend = "rns_interpret"
    vals = [42, 0, 7]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    ct2 = key.pub_key.apply_obfuscator(ct)
    assert ct2.texts != ct.texts  # fresh randomness changed the bytes
    assert key.priv_key.decrypt(ct2).texts == vals


def test_width_fallback_beyond_prime_pool():
    """The 12..14-bit prime pool reaches ~8.5k-bit moduli, so the FULL
    supported key envelope (n^2 to 8192 bits for 4096-bit keys) stays on
    the RNS/MXU backend; only hypothetical wider moduli downgrade to the
    width-generic CIOS backend instead of crashing at RNS context
    creation."""
    import random

    from pailliercryptolib_tpu.models.engine import PublicEngine
    from pailliercryptolib_tpu.ops.rns import rns_max_modulus_bits, rns_supported

    assert rns_supported(4096)
    assert rns_supported(8192)  # 4096-bit keys' n^2: on the MXU path
    assert not rns_supported(16384)
    assert rns_max_modulus_bits() >= 8192

    rng = random.Random(9)
    # a 4096-bit n (n^2 = 8192 bits) STAYS on RNS since round 5
    n = rng.getrandbits(4096) | (1 << 4095) | 1
    assert PublicEngine(n, 4096, hs=None, randbits=2048,
                        backend="rns").backend == "rns"
    # synthetic 4300-bit odd n (n^2 ~ 8600 bits): beyond the pool, the
    # public engine downgrades
    nw = rng.getrandbits(4300) | (1 << 4299) | 1
    pub = PublicEngine(nw, 4300, hs=None, randbits=2150, backend="rns")
    assert pub.backend == "pallas"
    pub_i = PublicEngine(nw, 4300, hs=None, randbits=2150,
                         backend="rns_interpret")
    assert pub_i.backend == "pallas_interpret"
    # a 2048-bit n stays on RNS
    n2 = rng.getrandbits(2048) | (1 << 2047) | 1
    assert PublicEngine(n2, 2048, hs=None, randbits=1024,
                        backend="rns").backend == "rns"


def test_chacha20_rfc8439_vector():
    """The on-device obfuscator DRBG is RFC 8439 ChaCha20 — bit-exact
    against the specification's §2.3.2 keystream test vector (key =
    00..1f, nonce = 000000090000004a00000000, block counter 1)."""
    import jax.numpy as jnp
    import numpy as np

    from pailliercryptolib_tpu.ops.paillier_ops import _chacha20_blocks

    key = np.frombuffer(bytes(range(32)), np.uint32)
    nonce = np.frombuffer(bytes.fromhex("000000090000004a00000000"), np.uint32)
    ks = np.asarray(_chacha20_blocks(jnp.asarray(key), jnp.asarray(nonce), 2))
    want = (
        "10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert ks[1].tobytes().hex() == want


def test_engine_grouped_decrypt_layout(rng):
    """PAILLIER_TPU_DECRYPT_LAYOUT=grouped (the wide-key auto choice and
    the A/B knob) through the engine: roundtrip-correct in interpret
    mode with the production streams=4 configuration."""
    import os

    import pailliercryptolib_tpu as ptpu

    key = ptpu.generate_keypair(256, enable_DJN=True)
    for e in (key.pub_key._engine, key.priv_key._engine):
        e.backend = "rns_interpret"
    vals = [rng.getrandbits(32) for _ in range(4)]
    ct = key.pub_key.encrypt(ptpu.PlainText(vals))
    os.environ["PAILLIER_TPU_DECRYPT_LAYOUT"] = "grouped"
    try:
        key.priv_key._engine._rns_crt = None
        kc2, _ = key.priv_key._engine.rns_crt
        assert "maskB" not in kc2  # grouped, not folded
        assert key.priv_key.decrypt(ct).texts == vals
    finally:
        del os.environ["PAILLIER_TPU_DECRYPT_LAYOUT"]
