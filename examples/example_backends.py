"""Backend dispatch walkthrough (reference: example/example_hybridmode.cpp).

Where the reference splits a modexp vector between QAT and AVX512 by a
tunable ratio, this framework routes whole batches between TPU kernels
("pallas" CIOS / "rns" MXU) and the XLA fallback, keeping the same policy
API (set_hybrid_mode / set_hybrid_ratio / set_hybrid_off).
"""

import time

import pailliercryptolib_tpu as ptpu
from pailliercryptolib_tpu.ops import dispatch


def time_encrypt(key, pt, label):
    key.pub_key.encrypt(pt)  # warm (compile)
    t = time.time()
    ct = key.pub_key.encrypt(pt)
    print(f"{label:>8}: {(time.time()-t)*1000:7.1f} ms / {len(pt)} encrypts")
    return ct


def main():
    print("default backend:", dispatch.default_backend())
    dispatch.set_hybrid_ratio(1.0)  # all-accelerator, like HybridMode::QAT
    key = ptpu.generate_keypair(1024, enable_DJN=True)
    pt = ptpu.PlainText(list(range(1, 129)))

    ct = time_encrypt(key, pt, "default")
    assert key.priv_key.decrypt(ct).texts == pt.texts

    # force the XLA fallback for comparison
    key.pub_key._engine.backend = "xla"
    ct = time_encrypt(key, pt, "xla")
    assert key.priv_key.decrypt(ct).texts == pt.texts
    dispatch.set_hybrid_off()


if __name__ == "__main__":
    main()
