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
