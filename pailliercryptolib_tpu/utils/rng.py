"""Randomness for key material and obfuscators.

The reference selects RDSEED -> RDRAND -> IPP PRNG at runtime
(ipcl/utils/common.cpp:18-77, util.hpp:46-74).  On a TPU host the analogous
split is:

* **key material / obfuscators**: the OS CSPRNG (``secrets`` / ``os.urandom``)
  — there is no on-chip TRNG to prefer, and these values are secret.
* **deterministic test vectors**: explicit injection via
  ``PublicKey.set_random`` (the analog of the reference's ``setRandom`` hook,
  ipcl/pub_key.cpp:92-95), which makes encryption a pure function for the
  ISO/IEC 18033-6 compliance tests.
"""

from __future__ import annotations

import os
import secrets
from typing import List


def random_bits(nbits: int) -> int:
    """Uniform integer in [0, 2**nbits)."""
    return secrets.randbits(nbits)


def batch_random_bits(count: int, nbits: int) -> List[int]:
    """``count`` independent uniform integers in [0, 2**nbits).

    Bulk-reads the OS CSPRNG once (cheap even for thousands of 2048-bit
    values) instead of per-element syscalls.
    """
    nbytes = -(-nbits // 8)
    buf = os.urandom(count * nbytes)
    mask = (1 << nbits) - 1
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little") & mask
        for i in range(count)
    ]


def batch_random_bytes(count: int, nbits: int):
    """``count`` uniform integers in [0, 2**nbits) as a [count, ceil(nbits/8)]
    uint8 array, LEAST-significant byte first — the exponent wire format of
    the fixed-base kernel.  Skips Python-int materialization entirely (the
    encrypt hot path: ~12 ms/2048-batch saved vs batch_random_bits +
    re-encoding)."""
    import numpy as np

    nbytes = -(-nbits // 8)
    arr = np.frombuffer(os.urandom(count * nbytes), np.uint8).reshape(
        count, nbytes
    )
    top = nbits % 8
    if top:
        arr = arr.copy()
        arr[:, -1] &= (1 << top) - 1
    return arr
