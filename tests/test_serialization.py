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


# --- golden byte fixtures ----------------------------------------------------
#
# Frozen wire images hand-derived (independently of the writer) from the
# cereal 1.3.2 PortableBinary grammar the reference emits
# (ipcl/include/ipcl/utils/serialize.hpp:25-57, bignum.h:133-150,
# pub_key.hpp:133-147, pri_key.hpp:93-99, base_text.hpp:108-114,
# ciphertext.hpp:70-74).  Any format drift in utils/serialize.py fails here
# byte-for-byte.  Construction: p=2^32-5, q=2^32-17 (both prime),
# n=p*q (64-bit), DJN hs=0x0102030405060708090a0b0c, randbits=32.

_G_P, _G_Q = 4294967291, 4294967279
_G_N = _G_P * _G_Q
_G_HS = 0x0102030405060708090A0B0C

_GOLDEN_PK = bytes.fromhex(
    "010000000040000000012000000000000000020000000000000055000000eaffff"
    "ff0100000003000000000000000c0b0a09080706050403020101000000"
)
_GOLDEN_SK = bytes.fromhex(
    "010000000020000000000000000100000000000000efffffff0100000001000000"
    "00000000fbffffff01000000"
)
_GOLDEN_PT = bytes.fromhex(
    "010000000000000000020000000000000002000000000000000000000001000000"
    "0000000005000000010000000200000000000000000000000001000001000000"
)
_GOLDEN_CT = bytes.fromhex(
    "010000000000000000010000000000000001000000000000000000000001000000"
    "000000000300000001000000000000004000000001200000000200000000000000"
    "55000000eaffffff0100000003000000000000000c0b0a090807060504030201"
    "01000000"
)


def test_golden_public_key_bytes():
    pk = PublicKey(_G_N, 64, hs=_G_HS, randbits=32)
    assert ser.dumps(pk) == _GOLDEN_PK
    pk2 = ser.loads(_GOLDEN_PK, PublicKey)
    assert (pk2.n, pk2.bits, pk2.hs, pk2.randbits) == (_G_N, 64, _G_HS, 32)


def test_golden_private_key_bytes():
    sk = PrivateKey(_G_N, _G_P, _G_Q)
    assert ser.dumps(sk) == _GOLDEN_SK
    sk2 = ser.loads(_GOLDEN_SK, PrivateKey)
    assert (sk2.p, sk2.q) == (min(_G_P, _G_Q), max(_G_P, _G_Q))


def test_golden_plaintext_bytes():
    pt = PlainText([5, 1 << 40])
    assert ser.dumps(pt) == _GOLDEN_PT
    assert ser.loads(_GOLDEN_PT, PlainText).texts == [5, 1 << 40]


def test_golden_ciphertext_bytes():
    pk = PublicKey(_G_N, 64, hs=_G_HS, randbits=32)
    ct = CipherText(pk, [3])
    assert ser.dumps(ct) == _GOLDEN_CT
    ct2 = ser.loads(_GOLDEN_CT, CipherText)
    assert ct2.texts == [3] and ct2.public_key.n == _G_N


def test_negative_and_zero_bignum_roundtrip():
    buf = io.BytesIO()
    w = ser._Writer(buf)
    w.bignum(0)
    w.bignum(-(2**70))
    r = ser._Reader(io.BytesIO(buf.getvalue()))
    assert r.bignum() == 0
    assert r.bignum() == -(2**70)
