"""Jitted device pipelines for the Paillier scheme.

Each function is a pure, batched program over uint32 limb tensors; jit
specializations are shared across keys of the same bit size (constants are
traced arguments, not closure captures).  These pipelines replace the
reference's per-op OpenMP loops + modExp dispatch:

* ``encrypt_djn_op`` / ``encrypt_normal_op``  <- ipcl/pub_key.cpp:51-110
* ``decrypt_crt_op``                          <- ipcl/pri_key.cpp:114-152
* ``decrypt_raw_op``                          <- ipcl/pri_key.cpp:92-111
* ``add_ctct_op``                             <- ipcl/ciphertext.cpp:135-141
* ``mul_ctpt_op``                             <- ipcl/ciphertext.cpp:143-162

The CRT decrypt runs both half-width residue systems as one vmapped program
(a leading axis of size 2), the TPU analog of the reference's two
``mbx_exp_mb8`` batches (SURVEY.md §2.4 item 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bigint import (
    add_scalar,
    mod_fold,
    mod_fold_combine,
    mul_low,
    mul_shared,
    sub_mod,
    sub_scalar,
)
from .dispatch import (
    mod_mul_backend,
    mod_mul_backend_grouped,
    modexp_backend,
    modexp_backend_grouped,
    mont_raw_backend_grouped,
)
from .montgomery import (
    canonicalize,
    cond_sub_n,
    mont_exp,
    mont_mod_mul,
    mont_mul,
)

_sjit = functools.partial(jax.jit, static_argnames=("backend",))

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# encryption
# ---------------------------------------------------------------------------


def _raw_encrypt(m, n_limbs, L2):
    """ct = n*m + 1 (no reduction needed: m < n  =>  n*m+1 < n^2).

    Exploits g = n+1 exactly as the reference does (ipcl/pub_key.cpp:99-110):
    (n+1)^m = 1 + n*m mod n^2, so plaintext embedding costs one shared-operand
    product instead of a modexp.  ``m`` may arrive narrower than n (callers
    upload only the limbs that cover the widest plaintext in the batch).
    """
    raw = mul_shared(n_limbs, m)  # [B, Ln+Lm]; value < n^2
    pad = L2 - raw.shape[-1]
    if pad > 0:
        raw = jnp.concatenate(
            [raw, jnp.zeros(raw.shape[:-1] + (pad,), _U32)], axis=-1
        )
    else:
        raw = raw[..., :L2]
    # +1 keeps digit 0 <= 2**15: safe redundant input for mont_mul.
    return raw.at[..., 0].add(_U32(1))


@_sjit
def encrypt_djn_op(m, r_wins, n_limbs, n2_n, n2_n0inv, n2_r2, n2_one, hs, backend="xla"):
    """DJN encrypt: ct = (n*m+1) * hs^r mod n^2.

    m:      [B, Ln]  plaintext (already reduced mod n)
    r_wins: [B, NW]  obfuscator exponent windows (randbits = bits/2)
    hs:     [L2]     shared DJN base (table built once, not per element)
    """
    L2 = n2_n.shape[-1]
    raw = _raw_encrypt(m, n_limbs, L2)
    obf = modexp_backend(hs, r_wins, n2_n, n2_n0inv, n2_r2, n2_one, backend)
    return mod_mul_backend(raw, obf, n2_n, n2_n0inv, n2_r2, backend)


@_sjit
def encrypt_normal_op(m, r, n_wins, n_limbs, n2_n, n2_n0inv, n2_r2, n2_one, backend="xla"):
    """Normal (non-DJN) encrypt: ct = (n*m+1) * r^n mod n^2.

    r:      [B, L2]  per-element obfuscator bases
    n_wins: [1, NW]  shared exponent n as windows
    """
    L2 = n2_n.shape[-1]
    raw = _raw_encrypt(m, n_limbs, L2)
    obf = modexp_backend(r, n_wins, n2_n, n2_n0inv, n2_r2, n2_one, backend)
    return mod_mul_backend(raw, obf, n2_n, n2_n0inv, n2_r2, backend)


@_sjit
def obfuscate_op(ct, base, wins, n2_n, n2_n0inv, n2_r2, n2_one, backend="xla"):
    """Standalone re-obfuscation (ipcl/pub_key.cpp:82-90):
    ct * base^wins mod n^2.  base is the shared DJN hs [L2] with per-row
    windows, or per-row r bases [B, L2] with the shared exponent n."""
    obf = modexp_backend(base, wins, n2_n, n2_n0inv, n2_r2, n2_one, backend)
    return mod_mul_backend(ct, obf, n2_n, n2_n0inv, n2_r2, backend)


@jax.jit
def encrypt_noobf_op(m, n_limbs, n2_n):
    """Encrypt without obfuscation (make_secure=false path,
    ipcl/pub_key.cpp:105-107): ct = n*m + 1 exactly."""
    L2 = n2_n.shape[-1]
    return canonicalize(_raw_encrypt(m, n_limbs, L2))


# ---------------------------------------------------------------------------
# decryption
# ---------------------------------------------------------------------------


@_sjit
def decrypt_crt_op(
    ct,
    sq_n,  # [2, Lp2]   p^2 / q^2 limbs
    sq_n0inv,  # [2]
    sq_r2,  # [2, Lp2]
    sq_one,  # [2, Lp2]
    exp_wins,  # [2, 1, NW]  windows of p-1 / q-1
    hensel,  # [2, Lp]     p^{-1} / q^{-1} mod 2^(15*Lp)
    hfun,  # [2, Lp]     hp / hq
    pq_n,  # [2, Lp]     p / q limbs
    pq_n0inv,  # [2]
    pq_r2,  # [2, Lp]
    pinv_q,  # [Lq]        p^{-1} mod q
    p_limbs,  # [Lp]
    backend="xla",
):
    """CRT decrypt (ipcl/pri_key.cpp:114-152), both halves in one vmapped
    program:  m_h = L_h(c^{h-1} mod h^2) * hh mod h  for h in {p, q},
    then  m = m_p + ((m_q - m_p) * p^{-1} mod q) * p.
    """
    Lp = pq_n.shape[-1]
    Lp2 = sq_n.shape[-1]

    # stage 1: fold ct into both residue systems (ct mod p^2 / q^2):
    # x_hi * R mod h^2 via one grouped Montgomery product, then combine.
    two = sq_n.shape[0]
    x_hi = jnp.broadcast_to(ct[None, :, Lp2:], (two,) + ct[:, Lp2:].shape)
    x_lo = jnp.broadcast_to(ct[None, :, :Lp2], (two,) + ct[:, :Lp2].shape)
    folded = mont_raw_backend_grouped(
        x_hi, sq_r2[:, None, :], sq_n, sq_n0inv, backend
    )  # [2, B, Lp2]
    bases = jax.vmap(mod_fold_combine, in_axes=(0, 0, 0))(folded, x_lo, sq_n)

    # stage 2: both half-width modexp batches in ONE grouped launch
    res = modexp_backend_grouped(
        bases, exp_wins, sq_n, sq_n0inv, sq_r2, sq_one, backend
    )  # [2, B, Lp2]

    # stage 3: L-function (Hensel exact division) + h multiplier
    def lfun(r, hens):
        xm1 = sub_scalar(r, 1)
        return mul_low(hens, xm1, Lp)  # exact (r-1)/h, < h

    ts = jax.vmap(lfun, in_axes=(0, 0))(res, hensel)  # [2, B, Lp]
    dphalves = mod_mul_backend_grouped(
        ts, hfun[:, None, :], pq_n, pq_n0inv, pq_r2, backend
    )  # [2, B, Lp]
    dp, dq = dphalves[0], dphalves[1]
    u = sub_mod(dq, dp, pq_n[1])  # (dq - dp) mod q
    u2 = mod_mul_backend(u, pinv_q, pq_n[1], pq_n0inv[1], pq_r2[1], backend)
    prod = mul_shared(p_limbs, u2)  # [B, Lp+Lq]
    m = prod.at[..., :Lp].add(dp)
    m = canonicalize(m)
    return m[..., : 2 * Lp]


@_sjit
def decrypt_raw_op(
    ct, lam_wins, n2_n, n2_n0inv, n2_r2, n2_one, hensel_n, x_limbs, n_n, n_n0inv,
    n_r2, backend="xla",
):
    """RAW decrypt (ipcl/pri_key.cpp:92-111):
    m = L(c^lambda mod n^2) * x mod n, L(y) = (y-1)/n via Hensel division."""
    Ln = n_n.shape[-1]
    res = modexp_backend(ct, lam_wins, n2_n, n2_n0inv, n2_r2, n2_one, backend)
    xm1 = sub_scalar(res, 1)
    t = mul_low(hensel_n, xm1, Ln)  # (res-1)/n < n
    return mod_mul_backend(t, x_limbs, n_n, n_n0inv, n_r2, backend)


# ---------------------------------------------------------------------------
# homomorphic ops
# ---------------------------------------------------------------------------


@_sjit
def add_ctct_op(a, b, n2_n, n2_n0inv, n2_r2, backend="xla"):
    """CT+CT: elementwise a*b mod n^2 (ipcl/ciphertext.cpp:135-141)."""
    return mod_mul_backend(a, b, n2_n, n2_n0inv, n2_r2, backend)


@_sjit
def mul_ctpt_op(ct, pt_wins, n2_n, n2_n0inv, n2_r2, n2_one, backend="xla"):
    """CT*PT: ct^pt mod n^2 (ipcl/ciphertext.cpp:143-162)."""
    return modexp_backend(ct, pt_wins, n2_n, n2_n0inv, n2_r2, n2_one, backend)


# ---------------------------------------------------------------------------
# RNS (MXU) pipelines — the fast path for every modexp-bearing operation.
#
# Same scheme semantics as the ops above, but the exponentiation runs in the
# residue number system (ops/rns.py) via the fused MXU kernel
# (ops/pallas_rns2.py): ~10x the CIOS kernel's throughput at 2048-bit keys.
# Conversions limbs<->RNS are loop-free XLA matmuls; the final multiply and
# the CRT fold still use the CIOS kernels (they are a rounding error in the
# op mix).
# ---------------------------------------------------------------------------

from .pallas_rns2 import (  # noqa: E402
    fb_digit_planes2,
    pallas_fb_modexp2,
    pallas_fb_table2,
    pallas_rns_modexp2,
    pallas_rns_modexp2f,
    unfold_rns_out,
)
from .rns import rns_to_limbs  # noqa: E402

_rjit = functools.partial(jax.jit, static_argnames=("interpret",))


def _rns_finalize(res, conv, n_limbs, out_limbs):
    """RNS residues of a value <= 2N -> canonical fully-reduced limbs."""
    limbs = rns_to_limbs(res, conv)  # [B, Lout], canonical, value <= 2N
    Lout = limbs.shape[-1]
    pad = jnp.zeros((Lout - n_limbs.shape[-1],), _U32)
    n_ext = jnp.concatenate([n_limbs, pad], axis=-1)
    limbs = cond_sub_n(cond_sub_n(limbs, n_ext), n_ext)
    return limbs[..., :out_limbs]


def _cios_backend(interpret):
    return "pallas_interpret" if interpret else "pallas"


@_rjit
def decrypt_crt_rns_op(
    ct,
    sq_n,  # [2, Lp2]   p^2 / q^2 limbs (finalize conditional subtracts)
    exp_wins,  # [2, 1, NW]
    hensel, hfun,
    pq_n, pq_n0inv, pq_r2,
    pinv_q, p_limbs,
    kc2,  # RNS kernel consts for p^2 / q^2 (folded or grouped layout)
    conv2,  # grouped conversion consts ([2, ...] stacked device_consts)
    interpret=False,
):
    """CRT decrypt with both half-width modexp batches on the RNS kernel.

    The kernel consumes the FULL n^2-width ciphertext: each group's Cin
    weights are (2^(15 l) mod h^2) mod m (ops/rns.py RNSContext.Cin), so
    the reference's per-element "ct mod p^2 / q^2" loop
    (ipcl/pri_key.cpp:122-130) IS the input-conversion matmul — the
    separate CIOS fold stage that cost ~4 ms/2048 in round 4 no longer
    exists.  With FOLDED constants (fold_group_consts2 shared_input,
    the default from engine.rns_crt) both residue systems ride the lane
    axis of one kernel step, so every squaring serves both CRT halves;
    grouped constants fall back to the two-group grid."""
    Lp = pq_n.shape[-1]
    Lp2 = sq_n.shape[-1]
    cios = _cios_backend(interpret)
    B = ct.shape[0]

    if "maskB" in kc2:  # folded lane layout, shared full-width input
        # (bt=256, streams=4) measured fastest on a v5e: 25.7 ms/2048 vs
        # 26.7 (256/8), 27.0 (256/2), 27.7 (128/4), 32.2 (256/1); the
        # window-table scratch (16 rows x bt x lane width x 4 B x 2
        # sides) must stay inside the ~16 MB scoped-VMEM limit, so wide
        # lane layouts (4096-bit keys' p^2: 2k = 610 lanes) drop to
        # 128-row tiles (benchmarks/results/profile_r5_v5e.jsonl).
        ka = kc2["sig0"].shape[-1]
        kb = kc2["oneB"].shape[-1]
        tab_bytes = 16 * 256 * (ka + kb) * 4
        bt = 256 if B % 256 == 0 and tab_bytes <= 12 * 2**20 else 128
        k = ka // 2
        res_f = pallas_rns_modexp2f(
            ct, exp_wins[:, 0], kc2, batch_tile=bt,
            streams=4, interpret=interpret,
        )
        res_rns = unfold_rns_out(res_f, k)
    else:
        # grouped layout (wide keys, engine.rns_crt "auto"): 256-row
        # tiles with 4 streams measure fastest at 4096-bit/full batch on
        # a v5e (92.1 ms vs 99.3 at s=8, 93.4 at s=2 —
        # benchmarks/results/profile_r5_v5e.jsonl); batches only
        # tile-aligned to 128 (or lane layouts whose window tables
        # exceed the scoped-VMEM budget, as the folded branch) keep 128.
        k1 = kc2["sig0"].shape[-1]
        tab_bytes = 16 * 256 * (2 * k1 + 1) * 4
        bt = 256 if B % 256 == 0 and tab_bytes <= 12 * 2**20 else 128
        two = sq_n.shape[0]
        bases = jnp.broadcast_to(ct[None], (two,) + ct.shape)
        res_rns = pallas_rns_modexp2(
            bases, exp_wins[:, 0], kc2, shared=True,
            streams=4, batch_tile=bt,
            interpret=interpret,
        )
    res = jax.vmap(_rns_finalize, in_axes=(0, 0, 0, None))(
        res_rns, conv2, sq_n, Lp2
    )  # [2, B, Lp2] canonical < h^2

    # stage 3: L-function + h multiplier + CRT recombine (as the CIOS path)
    def lfun(r, hens):
        xm1 = sub_scalar(r, 1)
        return mul_low(hens, xm1, Lp)

    ts = jax.vmap(lfun, in_axes=(0, 0))(res, hensel)
    dphalves = mod_mul_backend_grouped(
        ts, hfun[:, None, :], pq_n, pq_n0inv, pq_r2, cios
    )
    dp, dq = dphalves[0], dphalves[1]
    u = sub_mod(dq, dp, pq_n[1])
    u2 = mod_mul_backend(u, pinv_q, pq_n[1], pq_n0inv[1], pq_r2[1], cios)
    prod = mul_shared(p_limbs, u2)
    m_out = prod.at[..., :Lp].add(dp)
    m_out = canonicalize(m_out)
    return m_out[..., : 2 * Lp]


# ---------------------------------------------------------------------------
# Separately-jitted RNS stages.
#
# The TPU toolchain's compile time is superlinear in program size: the fused
# encrypt op above compiles in ~200s while its pieces compile in ~30s total.
# The engines therefore sequence these small jitted stages for the RNS
# backend (the extra dispatches cost microseconds; the intermediates are a
# few MB of HBM).
# ---------------------------------------------------------------------------


@_rjit
def rns_modexp_stage(base, wins, kc, interpret=False):
    """Single-group RNS modexp, per-row windows: limbs [B, L] -> [B, K]."""
    return pallas_rns_modexp2(
        base[None], wins[None], kc, interpret=interpret
    )[0]


@_rjit
def rns_modexp_shared_stage(base, wins, kc, interpret=False):
    """Single-group RNS modexp with ONE exponent for every row (SMEM
    shared-window kernel): base [B, L], wins [1, NW] -> [B, K]."""
    return pallas_rns_modexp2(
        base[None], wins, kc, shared=True, streams=2, interpret=interpret
    )[0]


@_rjit
def fb_table_stage(g_limbs, kc, conv, interpret=False):
    """Build the fixed-base table planes from g_limbs [NP, L]: canonical
    limbs of g_i = base^(2^(8 i)) mod N (host-computed square chain).
    Returns (tAlo, tAhi, tBlo, tBhi): bf16 [1, NP, 256, k(+1)]."""
    from .rns import limbs_to_rns, mulmod, rns_mont_mul

    k = kc["sig0"].shape[-1]
    res = limbs_to_rns(g_limbs, conv)  # [NP, K], values < N
    gm = rns_mont_mul(res, conv["mont_sq"][None, :], conv)  # Montgomery form
    # the kernel carries the B lanes in the scaled domain (z = r * w):
    # pre-scale g's B-side once (kc["wvec"] holds w over the Bx lanes)
    gB = mulmod(
        gm[:, k:], kc["wvec"][0][None, :], conv["mods"][k:],
        conv["barrett"][k:],
    )
    tabA, tabB = pallas_fb_table2(
        gm[None, :, :k], gB[None], kc, interpret=interpret
    )
    return fb_digit_planes2(tabA, tabB)


@functools.partial(jax.jit, static_argnames=("interpret", "mont_out"))
def rns_fb_modexp_stage(planes, win_bytes, kc, interpret=False,
                        mont_out=False):
    """Fixed-base modexp: exponent bytes [B, NP] (LS first) -> residues
    [B, K] of a representative <= 2N of base^e mod N (or of
    base^e * M_A <= 3N when ``mont_out`` — see pallas_fb_modexp2).

    256-row tiles with 4 streams measure ~5% faster than 128/2 at full
    batch on a v5e (6.72 vs 7.08 ms/2048); 128-aligned batches keep the
    small configuration."""
    B = win_bytes.shape[0]
    bt = 256 if B % 256 == 0 else 128
    return pallas_fb_modexp2(
        *planes, win_bytes[None], kc, interpret=interpret,
        batch_tile=bt, streams=4 if bt == 256 else 2, mont_out=mont_out,
    )[0]


@functools.partial(jax.jit, static_argnames=("out_limbs",))
def rns_finalize_stage(res, conv, n_limbs, out_limbs):
    return _rns_finalize(res, conv, n_limbs, out_limbs)


def _encrypt_post(res, m_a, n_limbs, conv, n2_n, res_mont):
    """The shared encrypt tail: plaintext embedding (n*m+1) and the
    obfuscation multiply, entirely in RNS.  With ``res_mont`` the kernel
    left the obfuscator in Montgomery form (mont_out), so the
    obfuscation multiply doubles as the leave-Montgomery multiply: ONE
    product."""
    from .rns import limbs_to_rns, rns_mont_mul

    L2 = n2_n.shape[-1]
    raw = _raw_encrypt(m_a, n_limbs, L2)  # < n^2 = N, digits <= 2^15
    raw_res = limbs_to_rns(raw, conv)
    if res_mont:
        ct_res = rns_mont_mul(raw_res, res, conv)  # raw*obf, value < 3N
    else:
        t = rns_mont_mul(raw_res, conv["mont_sq"][None, :], conv)  # raw*MA
        ct_res = rns_mont_mul(t, res, conv)  # raw*obf, value < 3N
    return _rns_finalize(ct_res, conv, n2_n, L2)


@functools.partial(jax.jit, static_argnames=("interpret", "res_mont"))
def encrypt_post_stage(
    res, m_a, n_limbs, conv, n2_n, n2_n0inv, n2_r2, interpret=False,
    res_mont=False,
):
    """Encrypt tail in ONE dispatch (see _encrypt_post): the obfuscator
    arrives as residues from the modexp kernel, so multiplying in
    residue space (XLA-level RNS Montgomery products on the MXU)
    replaces the residue->limb conversion AND the serial CIOS modular
    multiply (~5 ms/2048-batch at 4096-bit)."""
    return _encrypt_post(res, m_a, n_limbs, conv, n2_n, res_mont)


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _chacha20_blocks(key8, nonce3, nblocks):
    """RFC 8439 ChaCha20 keystream: ``nblocks`` 64-byte blocks as a
    [nblocks, 64] uint8 array (counter starts at 0).

    A vetted CSPRNG construction — NOT jax.random (whose generators are
    documented as non-cryptographic).  The 16-word state lives as 16
    [nblocks] u32 vectors, so every quarter-round is elementwise across
    blocks (pure VPU ARX ops, ~0.1 ms per 2048-batch draw); only the
    counter word differs per block.  Validated against the RFC 8439
    §2.3.2 test vector (tests/test_rns_backend.py)."""
    consts = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
    ctr = jnp.arange(nblocks, dtype=_U32)
    ones = jnp.ones((nblocks,), _U32)

    def bcast(w):
        return ones * w

    init = (
        [bcast(_U32(c)) for c in consts]
        + [bcast(key8[i]) for i in range(8)]
        + [ctr]
        + [bcast(nonce3[i]) for i in range(3)]
    )
    x = list(init)

    def qr(a, b, c, d):
        a = a + b
        d = _rotl(d ^ a, 16)
        c = c + d
        b = _rotl(b ^ c, 12)
        a = a + b
        d = _rotl(d ^ a, 8)
        c = c + d
        b = _rotl(b ^ c, 7)
        return a, b, c, d

    for _ in range(10):  # 10 double-rounds = 20 rounds
        x[0], x[4], x[8], x[12] = qr(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = qr(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = qr(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = qr(x[3], x[7], x[11], x[15])
        x[0], x[5], x[10], x[15] = qr(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = qr(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = qr(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = qr(x[3], x[4], x[9], x[14])

    words = jnp.stack(
        [xi + ii for xi, ii in zip(x, init)], axis=1
    )  # [nblocks, 16], little-endian word order
    by = jnp.stack(
        [
            (words >> _U32(8 * i)).astype(jnp.uint8)
            for i in range(4)
        ],
        axis=-1,
    )  # [nblocks, 16, 4]
    return by.reshape(nblocks, 64)


def _device_obf_bytes(seed, mask, B):
    """Expand a per-call OS-CSPRNG seed into [B, NP] obfuscator exponent
    bytes with an on-device ChaCha20 keystream (RFC 8439) — a
    cryptographic DRBG in the reference's seeded-DRBG role
    (ipcl/utils/common.cpp:52-77), evaluated on the accelerator so the
    host uploads 44 bytes instead of the full exponent matrix.

    ``seed``: [S, 11] uint32 rows of (256-bit key, 96-bit nonce)
    (utils/rng.DeviceSeed); row 0 keys this expansion — under a sharded
    mesh each device's shard carries its OWN row, so shards draw
    independent keystreams.  ``mask`` [NP] uint8 zeroes bytes beyond
    randbits and trims the top byte when randbits % 8 != 0."""
    NP = mask.shape[-1]
    return _chacha_bytes(seed, B, NP) & mask[None, :]


def _chacha_bytes(seed, B, nbytes):
    """[B, nbytes] uint8 from the ChaCha20 keystream keyed by seed row 0."""
    total = B * nbytes
    ks = _chacha20_blocks(seed[0, :8], seed[0, 8:11], -(-total // 64))
    return ks.reshape(-1)[:total].reshape(B, nbytes)


@_rjit
def encrypt_fb_fused_rng_stage(
    planes, seed, mask, m_a, n_limbs, kc, conv, n2_n, interpret=False
):
    """encrypt_fb_fused_stage with the obfuscator exponents generated ON
    DEVICE from a 44-byte seed row (utils/rng.DeviceSeed) — removes the
    ~256 KB/2048-batch exponent upload whose variable tunnel bandwidth
    gated encrypt throughput."""
    wb = _device_obf_bytes(seed, mask, m_a.shape[0])
    return encrypt_fb_fused_stage(
        planes, wb, m_a, n_limbs, kc, conv, n2_n, interpret=interpret
    )


def _bytes_to_limbs_dev(by, L):
    """[B, nbytes] uint8 -> [B, L] canonical 15-bit limbs on device.

    Limb l covers bits [15l, 15l+15): three source bytes gathered by
    per-limb column indices, combined with the per-limb shift."""
    nbytes = by.shape[-1]
    ll = np.arange(L)
    i0 = (15 * ll) // 8
    sh = jnp.asarray((15 * ll) % 8, _U32)
    pad = jnp.zeros(by.shape[:-1] + (2,), by.dtype)
    bp = jnp.concatenate([by, pad], axis=-1).astype(_U32)
    b0 = jnp.take(bp, jnp.asarray(np.minimum(i0, nbytes + 1)), axis=-1)
    b1 = jnp.take(bp, jnp.asarray(np.minimum(i0 + 1, nbytes + 1)), axis=-1)
    b2 = jnp.take(bp, jnp.asarray(np.minimum(i0 + 2, nbytes + 1)), axis=-1)
    word = b0 | (b1 << _U32(8)) | (b2 << _U32(16))
    return (word >> sh[None, :]) & _U32((1 << 15) - 1)


@functools.partial(jax.jit, static_argnames=("ebits", "interpret"))
def encrypt_normal_rng_stage(
    seed, m_a, n_wins, n_limbs, kc, conv, n2_n, ebits, interpret=False
):
    """Normal-mode (non-DJN) encrypt in ONE jitted program with the
    obfuscator base generated ON DEVICE: ct = (n*m+1) * r^n mod n^2
    (ipcl/pub_key.cpp:66-80,99-110).

    The base is an UNREDUCED uniform r'' of ``ebits`` = 2*|n|+3 bits
    from the ChaCha20 keystream: (r + k*n)^n ≡ r^n (mod n^2) for any k
    (the j>=1 binomial terms carry n^2), so r'' acts exactly as
    r'' mod n drawn uniformly (bias ~2^-(|n|+3)) — no modular reduction
    and no ~2 MB host upload of base limbs.  r'' < 2^(2|n|+3) < M_A/2
    (the quantized target gives M_A >= 2^(2|n|+4)), so the kernel's
    first to-Montgomery multiply absorbs it: out < N/2 + 2N < 3N."""
    B = m_a.shape[0]
    L2 = n2_n.shape[-1]
    nbytes = -(-ebits // 8)
    by = _chacha_bytes(seed, B, nbytes)
    top = ebits % 8
    if top:
        mask = np.full((nbytes,), 0xFF, np.uint8)
        mask[-1] = (1 << top) - 1
        by = by & jnp.asarray(mask)[None, :]
    r_a = _bytes_to_limbs_dev(by, L2)
    # fusion barrier: without it, XLA:CPU fuses the gather/shift limb
    # producer into the interpreted kernel's bf16 dot operands and the
    # thunk runtime rejects the fused BF16xBF16=F32 dot (interpret-mode
    # tests); a no-op on TPU
    r_a = jax.lax.optimization_barrier(r_a)
    res = pallas_rns_modexp2(
        r_a[None], n_wins, kc, shared=True, streams=2, interpret=interpret
    )[0]
    return _encrypt_post(res, m_a, n_limbs, conv, n2_n, res_mont=False)


@_rjit
def obfuscate_fb_fused_rng_stage(
    planes, seed, mask, ct, kc, conv, n2_n, interpret=False
):
    """apply_obfuscator in ONE jitted program: on-device exponent
    expansion + fixed-base kernel (mont_out) + the obfuscation multiply
    + finalize (the encrypt_fb_fused_rng_stage twin for existing
    ciphertexts, ipcl/pub_key.cpp:82-90)."""
    wb = _device_obf_bytes(seed, mask, ct.shape[0])
    res = rns_fb_modexp_stage(
        planes, wb, kc, interpret=interpret, mont_out=True
    )
    return _mul_res_post(ct, res, conv, n2_n, res_mont=True)


@_rjit
def encrypt_fb_fused_stage(
    planes, win_bytes, m_a, n_limbs, kc, conv, n2_n, interpret=False
):
    """DJN encrypt in ONE jitted program: fixed-base modexp kernel
    (mont_out) + plaintext embedding + obfuscation multiply + finalize.

    One program instead of two halves the dispatch seams on the hot path
    AND the separately-compiled-program count on the cold path — each
    program is a round trip to the remote compile service, whose
    documented stalls dominate first-encrypt latency (VERDICT r4 item 1).
    """
    B = win_bytes.shape[0]
    bt = 256 if B % 256 == 0 else 128
    res = pallas_fb_modexp2(
        *planes, win_bytes[None], kc, interpret=interpret,
        batch_tile=bt, streams=4 if bt == 256 else 2, mont_out=True,
    )[0]
    return _encrypt_post(res, m_a, n_limbs, conv, n2_n, res_mont=True)


@functools.partial(jax.jit, static_argnames=("interpret", "res_mont"))
def mul_res_post_stage(ct, res, conv, n2_n, interpret=False, res_mont=False):
    """ct (limbs) * res (RNS residues straight from a modexp kernel)
    mod n^2 — the obfuscation multiply with the limb->RNS conversion of
    the second operand already paid (used by apply_obfuscator).
    ``res_mont`` as in encrypt_post_stage."""
    return _mul_res_post(ct, res, conv, n2_n, res_mont)


def _mul_res_post(ct, res, conv, n2_n, res_mont):
    from .rns import limbs_to_rns, rns_mont_mul

    L2 = n2_n.shape[-1]
    ra = limbs_to_rns(ct, conv)
    if res_mont:
        out = rns_mont_mul(ra, res, conv)  # ct*obf, value < 3N
    else:
        t = rns_mont_mul(ra, conv["mont_sq"][None, :], conv)  # ct*MA
        out = rns_mont_mul(t, res, conv)  # ct*obf, value < 3N
    return _rns_finalize(out, conv, n2_n, L2)


@jax.jit
def add_ctct_rns_op(a, b, conv, n2_n):
    """CT+CT = a*b mod n^2 in RNS: two exact conversions + two MXU-backed
    Montgomery products (vs a serial CIOS multiply, ~1.8x faster at
    4096-bit).  Broadcast semantics handled by callers."""
    from .rns import limbs_to_rns, rns_mont_mul

    L2 = n2_n.shape[-1]
    ra = limbs_to_rns(a, conv)
    rb = limbs_to_rns(b, conv)
    t = rns_mont_mul(ra, conv["mont_sq"][None, :], conv)  # a*MA
    out = rns_mont_mul(t, rb, conv)  # a*b, value < 3N
    return _rns_finalize(out, conv, n2_n, L2)


@_sjit
def mod_mul_stage(a, b, n, n0inv, r2, backend="pallas"):
    return mod_mul_backend(a, b, n, n0inv, r2, backend)


@_sjit
def hensel_post_stage(res, hensel_n, x_limbs, n_n, n_n0inv, n_r2, backend="pallas"):
    """L-function + x multiplier tail of RAW decryption."""
    Ln = n_n.shape[-1]
    xm1 = sub_scalar(res, 1)
    t = mul_low(hensel_n, xm1, Ln)
    return mod_mul_backend(t, x_limbs, n_n, n_n0inv, n_r2, backend)


# ---------------------------------------------------------------------------
# packed-transfer helpers (two 15-bit limbs per uint32 on the wire)
# ---------------------------------------------------------------------------


@jax.jit
def pack_out_op(x):
    """[B, L] canonical limbs -> [B, ceil(L/2)] packed words (device side)."""
    L = x.shape[-1]
    if L % 2:
        x = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (1,), _U32)], -1)
    return x[..., 0::2] | (x[..., 1::2] << jnp.uint32(15))


@functools.partial(jax.jit, static_argnames=("num_limbs",))
def unpack_in_op(packed, num_limbs):
    """Inverse of pack_out_op (device side)."""
    lo = packed & jnp.uint32(0x7FFF)
    hi = packed >> jnp.uint32(15)
    out = jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (2 * packed.shape[-1],)
    )
    return out[..., :num_limbs]
