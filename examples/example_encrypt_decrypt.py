"""Encrypt/decrypt walkthrough (reference: example/example_encrypt_decrypt.cpp).

Generates a 1024-bit DJN keypair, encrypts 8 plaintexts, decrypts, verifies.
"""

import pailliercryptolib_tpu as ptpu


def main():
    key = ptpu.generate_keypair(1024, enable_DJN=True)
    values = [11, 22, 33, 44, 55, 66, 77, 88]
    pt = ptpu.PlainText(values)
    ct = key.pub_key.encrypt(pt)
    dt = key.priv_key.decrypt(ct)
    assert dt.texts == values
    print("encrypt/decrypt roundtrip OK:", dt.texts)


if __name__ == "__main__":
    main()
