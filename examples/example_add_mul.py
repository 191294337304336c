"""Homomorphic add/mul walkthrough (reference: example/example_add_mul.cpp)."""

import pailliercryptolib_tpu as ptpu


def main():
    key = ptpu.generate_keypair(1024, enable_DJN=True)
    a, b = [10, 20, 30, 40], [5, 6, 7, 8]
    ct_a = key.pub_key.encrypt(ptpu.PlainText(a))
    ct_b = key.pub_key.encrypt(ptpu.PlainText(b))

    sum_ct = ct_a + ct_b                      # CT + CT
    sum_pt = ct_a + ptpu.PlainText(b)         # CT + PT
    prod = ct_a * ptpu.PlainText(b)           # CT * PT
    combo = ct_a + ct_b * ptpu.PlainText(3)   # a + 3b

    dec = key.priv_key.decrypt
    assert dec(sum_ct).texts == [x + y for x, y in zip(a, b)]
    assert dec(sum_pt).texts == [x + y for x, y in zip(a, b)]
    assert dec(prod).texts == [x * y for x, y in zip(a, b)]
    assert dec(combo).texts == [x + 3 * y for x, y in zip(a, b)]
    print("homomorphic add/mul OK")


if __name__ == "__main__":
    main()
