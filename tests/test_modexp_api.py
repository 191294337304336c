"""Public modexp API (the ipcl::modExp equivalent)."""

import pytest

import pailliercryptolib_tpu as ptpu


def test_modexp_scalar(rng):
    m = rng.getrandbits(128) | (1 << 127) | 1
    b, e = rng.randrange(m), rng.getrandbits(64)
    assert ptpu.modexp(b, e, m) == pow(b, e, m)


def test_modexp_vectors(rng):
    m = rng.getrandbits(256) | (1 << 255) | 1
    bs = [rng.randrange(m) for _ in range(7)]
    es = [rng.getrandbits(48) for _ in range(7)]
    assert ptpu.modexp(bs, es, m) == [pow(b, e, m) for b, e in zip(bs, es)]


def test_modexp_vector_of_moduli(rng):
    m1 = rng.getrandbits(128) | (1 << 127) | 1
    m2 = rng.getrandbits(160) | (1 << 159) | 1
    bs = [rng.getrandbits(100) for _ in range(6)]
    es = [rng.getrandbits(32) for _ in range(6)]
    ms = [m1, m2, m1, m2, m1, m1]
    got = ptpu.modexp(bs, es, ms)
    assert got == [pow(b, e, m) for b, e, m in zip(bs, es, ms)]


def test_modexp_rejects_even_modulus():
    with pytest.raises(ValueError):
        ptpu.modexp(2, 3, 100)


def test_modexp_size_mismatch():
    with pytest.raises(ValueError):
        ptpu.modexp([1, 2], [3], [5, 7])
