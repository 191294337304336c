"""Serialization roundtrips (reference: test/test_serialization.cpp:13-106).

PublicKey / PrivateKey survive a serialize->deserialize cycle and still
encrypt/decrypt against their original counterpart; PlainText/CipherText
roundtrip element-exactly.  The deserialized PrivateKey recomputes its CRT
tables from {bits, p, q} only.
"""

import io

import pytest

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu import CipherText, PlainText, PrivateKey, PublicKey
from pailliercryptolib_tpu.utils import serialize as ser


@pytest.fixture(scope="module")
def key():
    return ptpu.generate_keypair(512, enable_DJN=True)


def test_public_key_roundtrip(key, rng):
    data = ser.dumps(key.pub_key)
    pk2 = ser.loads(data, PublicKey)
    assert pk2.n == key.pub_key.n
    assert pk2.bits == key.pub_key.bits
    assert pk2.enable_djn_flag == key.pub_key.enable_djn_flag
    assert pk2.hs == key.pub_key.hs
    assert pk2.randbits == key.pub_key.randbits
    # restored pk encrypts; original sk decrypts
    vals = [rng.getrandbits(32) for _ in range(4)]
    ct = pk2.encrypt(PlainText(vals))
    assert key.priv_key.decrypt(ct).texts == vals


def test_private_key_roundtrip(key, rng):
    data = ser.dumps(key.priv_key)
    sk2 = ser.loads(data, PrivateKey)
    assert sk2.n == key.priv_key.n
    assert sk2.p == key.priv_key.p and sk2.q == key.priv_key.q
    # CRT tables recomputed on load
    assert sk2.hp == key.priv_key.hp and sk2.x == key.priv_key.x
    vals = [rng.getrandbits(32) for _ in range(4)]
    ct = key.pub_key.encrypt(PlainText(vals))
    assert sk2.decrypt(ct).texts == vals


def test_plaintext_roundtrip(rng):
    vals = [rng.getrandbits(256) for _ in range(5)] + [0]
    pt = PlainText(vals)
    pt2 = ser.loads(ser.dumps(pt), PlainText)
    assert pt2.texts == vals


def test_ciphertext_roundtrip(key, rng):
    vals = [rng.getrandbits(32) for _ in range(4)]
    ct = key.pub_key.encrypt(PlainText(vals))
    ct2 = ser.loads(ser.dumps(ct), CipherText)
    assert ct2.texts == ct.texts
    assert ct2.public_key.n == key.pub_key.n
    assert key.priv_key.decrypt(ct2).texts == vals


def test_file_helpers(tmp_path, key):
    path = str(tmp_path / "pk.bin")
    assert ser.serialize_to_file(path, key.pub_key)
    pk2 = ser.deserialize_from_file(path, PublicKey)
    assert pk2.n == key.pub_key.n


def test_archive_layout_stability(key):
    """The first bytes follow the documented cereal-PortableBinary layout:
    endian flag, uint32 class version, int32 bits."""
    data = ser.dumps(key.pub_key)
    assert data[0] == 1
    assert int.from_bytes(data[1:5], "little") == 0  # class version
    assert int.from_bytes(data[5:9], "little") == key.pub_key.bits


def test_negative_and_zero_bignum_roundtrip():
    buf = io.BytesIO()
    w = ser._Writer(buf)
    w.bignum(0)
    w.bignum(-(2**70))
    r = ser._Reader(io.BytesIO(buf.getvalue()))
    assert r.bignum() == 0
    assert r.bignum() == -(2**70)
