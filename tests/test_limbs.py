import random

import numpy as np
import pytest

from pailliercryptolib_tpu.ops import limbs as lb


@pytest.mark.parametrize("nbits", [16, 61, 256, 1024, 2049])
def test_limb_roundtrip(nbits, rng):
    L = lb.limbs_for_bits(nbits)
    xs = [rng.getrandbits(nbits) for _ in range(17)] + [0, 1, (1 << nbits) - 1]
    arr = lb.ints_to_limbs(xs, L)
    assert arr.shape == (len(xs), L)
    assert arr.dtype == np.uint32
    assert (arr <= lb.LIMB_MASK).all()
    back = lb.limbs_to_ints(arr)
    assert back == xs


def test_limb_values_match_radix(rng):
    x = rng.getrandbits(500)
    L = lb.limbs_for_bits(500)
    arr = lb.int_to_limbs(x, L)
    rebuilt = sum(int(v) << (lb.LIMB_BITS * i) for i, v in enumerate(arr))
    assert rebuilt == x


@pytest.mark.parametrize("ebits", [1, 4, 15, 64, 1027])
def test_window_roundtrip(ebits, rng):
    xs = [rng.getrandbits(ebits) for _ in range(9)] + [0]
    wins = lb.ints_to_windows(xs, ebits)
    nw = lb.num_windows(ebits)
    assert wins.shape == (len(xs), nw)
    assert (wins < 16).all()
    for x, row in zip(xs, wins):
        rebuilt = 0
        for w in row:  # MS window first
            rebuilt = (rebuilt << lb.WINDOW_BITS) | int(w)
        assert rebuilt == x


def test_window_rejects_oversize():
    with pytest.raises(ValueError):
        lb.ints_to_windows([1 << 8], 8)
