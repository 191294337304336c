"""Key/ciphertext persistence (reference: test/test_serialization.cpp usage)."""

import io

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.utils import serialize as ser


def main():
    key = ptpu.generate_keypair(1024, enable_DJN=True)
    ct = key.pub_key.encrypt(ptpu.PlainText([42, 43]))

    blob_pk = ser.dumps(key.pub_key)
    blob_sk = ser.dumps(key.priv_key)
    blob_ct = ser.dumps(ct)
    print(f"pk {len(blob_pk)}B  sk {len(blob_sk)}B  ct {len(blob_ct)}B")

    pk2 = ser.loads(blob_pk, ptpu.PublicKey)
    sk2 = ser.loads(blob_sk, ptpu.PrivateKey)
    ct2 = ser.loads(blob_ct, ptpu.CipherText)
    assert sk2.decrypt(ct2).texts == [42, 43]
    print("serialization roundtrip OK")


if __name__ == "__main__":
    main()
