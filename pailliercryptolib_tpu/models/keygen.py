"""Key generation: host-side prime generation + keypair assembly.

Replaces the reference's ipp-crypto prime generator (``ippsPrimeGen_BN`` with
10 Miller-Rabin trials, ipcl/keygen.cpp:13-41) with a pure-Python
Miller-Rabin over the OS CSPRNG.  Keygen is a one-time host operation — the
reference never offloads it either (SURVEY.md §3.1) — so there is no device
path here.  Conditions enforced (ipcl/keygen.cpp:43-117):

* key size in [200, 2048]... extended here to 4096 (the TPU kernels are
  width-generic; the reference caps at 2048 only because mbx_exp_mb8 tops
  out at 4096-bit operands), divisible by 4;
* |p - q| > 2^(keysize/2 - 100);
* DJN variant: p = q = 3 (mod 4) and gcd(p-1, q-1) == 2;
* n = p*q has exactly ``n_length`` bits.
"""

from __future__ import annotations

import math

from ..utils import rng as _rng
from .keys import KeyPair, PrivateKey, PublicKey

N_BIT_SIZE_MAX = 4096
N_BIT_SIZE_MIN = 200

_SMALL_PRIMES = [
    3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139,
    149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223,
    227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293,
    307, 311, 313, 317, 331, 337, 347, 349, 353, 359, 367, 373, 379, 383,
    389, 397, 401, 409, 419, 421, 431, 433, 439, 443, 449, 457, 461, 463,
]


def miller_rabin(n: int, rounds: int = 24) -> bool:
    """Probabilistic primality test (matches the reference's MR approach,
    nTrials=10 at ipcl/keygen.cpp:34; we use more rounds for margin)."""
    if n < 2:
        return False
    for sp in _SMALL_PRIMES:
        if n == sp:
            return True
        if n % sp == 0:
            return False
    d = n - 1
    s = 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for _ in range(rounds):
        a = 2 + _rng.random_bits(64) % (n - 3)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def get_prime(bits: int, mod4_is_3: bool = False) -> int:
    """Random ``bits``-bit probable prime; optionally p = 3 (mod 4)."""
    while True:
        cand = _rng.random_bits(bits) | (1 << (bits - 1)) | 1
        if mod4_is_3:
            cand |= 2  # low bits 11 -> cand = 3 (mod 4)
        if miller_rabin(cand):
            return cand


def _primes_too_close(p: int, q: int, n_length: int) -> bool:
    """|p - q| must exceed 2^(keysize/2 - 100) (ipcl/keygen.cpp:43-58)."""
    return abs(p - q) <= (1 << (n_length // 2 - 100))


def generate_keypair(n_length: int = 2048, enable_DJN: bool = True) -> KeyPair:
    """Generate a Paillier keypair (reference: ipcl/keygen.cpp:92-117)."""
    if n_length > N_BIT_SIZE_MAX:
        raise ValueError("generateKeypair: key size exceeds supported range")
    if n_length < N_BIT_SIZE_MIN or n_length % 4 != 0:
        raise ValueError("generateKeypair: key size should >=200 and divisible by 4")

    half = n_length // 2
    while True:
        p = get_prime(half, mod4_is_3=enable_DJN)
        q = get_prime(half, mod4_is_3=enable_DJN)
        if p == q:
            continue
        n = p * q
        if n.bit_length() != n_length:
            continue
        if _primes_too_close(p, q, n_length):
            continue
        if enable_DJN and math.gcd(p - 1, q - 1) != 2:
            continue
        break

    pk = PublicKey(n, n_length, enable_DJN)
    sk = PrivateKey(pk, p, q)
    return KeyPair(pk, sk)
