"""Homomorphic-op semantics matrix (reference: test/test_ops.cpp:126-608).

Covers CT+CT, CT+PT, PT+CT, CT*PT, PT*CT in whole-array and per-element
styles, scalar broadcast (size-1 operand), multiply-by-zero, rotate, and the
a + b*3 composite — verified against Python integer arithmetic on the
plaintexts.
"""

import pytest

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu import CipherText, PlainText

NBITS = 512
SIZE = 8


@pytest.fixture(scope="module")
def key():
    return ptpu.generate_keypair(NBITS, enable_DJN=True)


@pytest.fixture()
def data(rng):
    a = [rng.getrandbits(32) for _ in range(SIZE)]
    b = [rng.getrandbits(32) for _ in range(SIZE)]
    return a, b


def test_add_ctct(key, data):
    a, b = data
    ct = key.pub_key.encrypt(PlainText(a)) + key.pub_key.encrypt(PlainText(b))
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x + y) % key.pub_key.n for x, y in zip(a, b)]


def test_add_ctpt(key, data):
    a, b = data
    ct = key.pub_key.encrypt(PlainText(a)) + PlainText(b)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x + y) % key.pub_key.n for x, y in zip(a, b)]


def test_add_ptct_commutes(key, data):
    a, b = data
    ct = PlainText(b) + key.pub_key.encrypt(PlainText(a))
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x + y) % key.pub_key.n for x, y in zip(a, b)]


def test_mul_ctpt(key, data):
    a, b = data
    ct = key.pub_key.encrypt(PlainText(a)) * PlainText(b)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x * y) % key.pub_key.n for x, y in zip(a, b)]


def test_mul_ptct_commutes(key, data):
    a, b = data
    ct = PlainText(b) * key.pub_key.encrypt(PlainText(a))
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x * y) % key.pub_key.n for x, y in zip(a, b)]


def test_add_ctct_scalar_broadcast(key, data):
    a, _ = data
    scalar = 9999
    ct = key.pub_key.encrypt(PlainText(a)) + key.pub_key.encrypt(
        PlainText(scalar)
    )
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x + scalar) % key.pub_key.n for x in a]


def test_mul_ctpt_scalar_broadcast(key, data):
    a, _ = data
    ct = key.pub_key.encrypt(PlainText(a)) * PlainText(7)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x * 7) % key.pub_key.n for x in a]


def test_mul_by_zero(key, data):
    a, _ = data
    ct = key.pub_key.encrypt(PlainText(a)) * PlainText(0)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [0] * len(a)


def test_add_and_mul_composite(key, data):
    """a + b*3 (reference: test_ops.cpp:409-448)."""
    a, b = data
    ct_a = key.pub_key.encrypt(PlainText(a))
    ct_b = key.pub_key.encrypt(PlainText(b))
    ct = ct_a + ct_b * PlainText(3)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == [(x + y * 3) % key.pub_key.n for x, y in zip(a, b)]


def test_per_element_style(key, data):
    """getElement-loop style (reference per-element test variants)."""
    a, b = data
    ct_a = key.pub_key.encrypt(PlainText(a))
    ct_b = key.pub_key.encrypt(PlainText(b))
    for i in range(len(a)):
        s = ct_a.get_ciphertext(i) + ct_b.get_ciphertext(i)
        dt = key.priv_key.decrypt(s)
        assert dt.get_element(0) == (a[i] + b[i]) % key.pub_key.n


def test_rotate(key, data):
    a, _ = data
    ct = key.pub_key.encrypt(PlainText(a))
    rot = ct.rotate(2)
    dt = key.priv_key.decrypt(rot)
    assert dt.texts == [a[(i - 2) % len(a)] for i in range(len(a))]
    back = rot.rotate(-2)
    assert key.priv_key.decrypt(back).texts == a


def test_rotate_pt(data):
    a, _ = data
    pt = PlainText(a).rotate(3)
    assert pt.texts == [a[(i - 3) % len(a)] for i in range(len(a))]


def test_key_mismatch_rejected(key, data):
    a, _ = data
    other = ptpu.generate_keypair(NBITS, enable_DJN=True)
    ct1 = key.pub_key.encrypt(PlainText(a))
    ct2 = other.pub_key.encrypt(PlainText(a))
    with pytest.raises(ValueError):
        _ = ct1 + ct2


def test_size_mismatch_rejected(key, data):
    a, _ = data
    ct1 = key.pub_key.encrypt(PlainText(a))
    ct2 = key.pub_key.encrypt(PlainText(a[:3]))
    with pytest.raises(ValueError):
        _ = ct1 + ct2


def test_container_accessors(key, data):
    a, _ = data
    pt = PlainText(a)
    assert pt.get_size() == len(a)
    assert pt.get_chunk(2, 3) == a[2:5]
    assert pt.get_element_vec(0)[0] == a[0] & 0xFFFFFFFF
    assert pt.get_element_hex(0) == hex(a[0])
    pt.insert(0, 42)
    assert pt.get_element(0) == 42
    pt.remove(0)
    assert pt.texts == a
    pt.clear()
    assert len(pt) == 0
