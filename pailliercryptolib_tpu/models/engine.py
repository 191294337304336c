"""Per-key device engines: codec + batch padding + jitted pipeline dispatch.

The engine owns the precomputed device constants for one key (the analog of
the per-key state the reference precomputes in PublicKey/PrivateKey ctors,
ipcl/pub_key.cpp:18-49 and ipcl/pri_key.cpp:13-37) and converts between host
Python ints and fixed-shape limb tensors around every batched call.

Batch sizes are padded to the next power of two so the number of jit
specializations stays bounded (the TPU analog of the reference's chunks-of-8
padding policy, ipcl/mod_exp.cpp:480-516).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import paillier_ops as pops
from ..ops.dispatch import default_backend
from ..ops.pallas_modexp import BATCH_TILE
from ..ops.limbs import (
    LIMB_BITS,
    ints_to_bytes_le,
    ints_to_limbs,
    ints_to_windows,
    limbs_for_bits,
    limbs_to_ints,
    max_bitlength,
    num_windows,
    pack_pairs_np,
    unpack_pairs_np,
)


def _download_limbs(dev_arr) -> List[int]:
    """Device canonical limbs -> host ints via a packed (half-size) download."""
    packed = pops.pack_out_op(dev_arr)
    L = dev_arr.shape[-1]
    return limbs_to_ints(unpack_pairs_np(np.asarray(packed), L))


class DevLimbs:
    """A device-resident batch of canonical 15-bit limbs [Bp, L] plus the
    live (unpadded) batch size.

    This is what lets chained homomorphic pipelines stay on-chip: every
    engine op accepts and returns DevLimbs, and the host list-of-ints view
    materializes lazily (one packed download) only when .texts is read.
    The reference's analog is keeping BigNumber buffers pinned in QAT NUMA
    memory between calls (module/heqat/heqat/bnops.c:52-146) — here the
    buffers simply stay in HBM as jax.Arrays.
    """

    __slots__ = ("arr", "size")

    def __init__(self, arr, size: int):
        self.arr = arr
        self.size = size

    def fetch(self) -> List[int]:
        return _download_limbs(self.arr)[: self.size]

    def sync(self) -> None:
        """Block until the producing computation completed on device
        (downloads a single element; jax.Array.block_until_ready is a
        no-op on tunneled backends)."""
        np.asarray(jax.device_get(self.arr[:1, :1]))


def sync_device(dev: "DevLimbs") -> None:
    dev.sync()


def _upload_limbs(ints: Sequence[int], num_limbs: int):
    """Host ints -> device canonical limbs via a packed (half-size) upload."""
    packed = pack_pairs_np(ints_to_limbs(list(ints), num_limbs))
    return pops.unpack_in_op(jnp.asarray(packed), num_limbs)
from ..ops.montgomery import MontConstants


def _pad_batch(xs: List[int], fill: int, backend: str = "xla") -> List[int]:
    """Pad a batch so jit specializations stay bounded.

    XLA backend: next power of two.  Kernel backends (pallas / rns): next
    multiple of the 128-lane batch tile.
    """
    n = len(xs)
    if backend != "xla":
        target = -(-n // BATCH_TILE) * BATCH_TILE
    else:
        target = 1 << max(0, (n - 1).bit_length())
    return xs + [fill] * (target - n)


def _is_rns(backend: str) -> bool:
    return backend.startswith("rns")


def _rns_interp(backend: str) -> bool:
    return backend == "rns_interpret"


def _round_windows(nw: int) -> int:
    """Round a window count up to a multiple of 8 (bounds jit variants)."""
    return max(8, -(-nw // 8) * 8)


class PublicEngine:
    """Device pipelines for one public key."""

    def __init__(
        self,
        n: int,
        bits: int,
        hs: Optional[int],
        randbits: int,
        backend: Optional[str] = None,
    ):
        self.backend = backend or default_backend()
        self.n = n
        self.nbits = n.bit_length()
        self.nsquare = n * n
        self.Ln = limbs_for_bits(self.nbits)
        self.mont_n2 = MontConstants.create(self.nsquare, 2 * self.nbits)
        self.L2 = self.mont_n2.num_limbs
        self.n_limbs = jnp.asarray(ints_to_limbs([n], self.Ln)[0])
        self.n2_args = self.mont_n2.as_device_args()  # (n, n0inv, r2, one)
        # shared exponent n as windows for the normal obfuscator r^n mod n^2
        self.n_wins = jnp.asarray(ints_to_windows([n], self.nbits))
        self.randbits = randbits
        self.hs_int = hs
        self.hs_limbs = (
            jnp.asarray(ints_to_limbs([hs], self.L2)[0]) if hs is not None else None
        )

        self._rns = None
        self._fb = None

    def set_hs(self, hs: int, randbits: Optional[int] = None) -> None:
        """Install new DJN parameters.  ``randbits`` must accompany a
        late enable_djn/set_djn (ipcl/pub_key.cpp:131-137): the fixed-base
        table is sized from it, and an engine created before DJN was
        enabled would otherwise keep a stale obfuscator width."""
        self.hs_int = hs
        self.hs_limbs = jnp.asarray(ints_to_limbs([hs], self.L2)[0])
        if randbits is not None:
            self.randbits = randbits
        self._rns = None  # hs residues must be rebuilt
        self._fb = None  # table is sized from randbits and built from hs

    @property
    def rns(self):
        """Lazy RNS machinery for n^2: (context, kernel consts, conversion
        consts, hs residues)."""
        if self._rns is None:
            from ..ops.pallas_rns2 import stack_group_consts2
            from ..ops.rns import RNSContext

            ctx = RNSContext.create(self.nsquare, in_limbs=self.L2)
            kc = stack_group_consts2([ctx])
            conv = ctx.device_consts()
            self._rns = (ctx, kc, conv)
        return self._rns

    @property
    def fixedbase(self):
        """Lazy per-key fixed-base table for hs^r (ops/pallas_rns2.py):
        (tablo, tabhi, NP).  Built once per key: a host square chain
        g_i = hs^(2^(8 i)) mod n^2 feeds the device table kernel."""
        if self._fb is None:
            from ..ops.pallas_rns2 import FB_WINDOW_BITS

            def fb_num_windows(ebits):
                nbytes = -(-ebits // FB_WINDOW_BITS)
                return max(8, -(-nbytes // 8) * 8)

            _, kc, conv = self.rns
            NP = fb_num_windows(self.randbits)
            g = [self.hs_int % self.nsquare]
            for _ in range(NP - 1):
                g.append(pow(g[-1], 256, self.nsquare))
            g_limbs = jnp.asarray(ints_to_limbs(g, self.L2))
            planes = pops.fb_table_stage(
                g_limbs, kc, conv, interpret=_rns_interp(self.backend)
            )
            self._fb = (planes, NP)
        return self._fb

    # -- operand normalization ------------------------------------------------

    def _upload_narrow(self, xs: List[int]):
        """Upload a batch using only the limbs that cover its widest value
        (rounded to 8 to bound jit variants) — plaintexts are usually tiny
        compared to n, so this shrinks the wire + codec cost ~17x."""
        lm = -(-max_bitlength(xs) // LIMB_BITS)  # limbs covering widest value
        Lm = min(self.Ln, max(8, -(-lm // 8) * 8))
        return jnp.asarray(ints_to_limbs(xs, Lm))

    def _ct_operand(self, x, fill: int):
        """CipherText operand (DevLimbs or int list) -> ([Bp, L2] array, size)."""
        if isinstance(x, DevLimbs):
            return x.arr, x.size
        xs = _pad_batch(list(x), fill, self.backend)
        if self.backend == "xla":
            return jnp.asarray(ints_to_limbs(xs, self.L2)), len(x)
        return _upload_limbs(xs, self.L2), len(x)

    def _cios(self) -> str:
        if _rns_interp(self.backend):
            return "pallas_interpret"
        return "pallas" if _is_rns(self.backend) else self.backend

    # -- pipelines ----------------------------------------------------------
    #
    # Every pipeline returns DevLimbs (device-resident canonical limbs);
    # legacy list-returning wrappers materialize immediately.

    def encrypt_djn_dev(self, m: Sequence[int], r) -> DevLimbs:
        """``r`` is either a list of ints (injected test randoms) or a
        [B, nbytes] uint8 array straight from the OS CSPRNG
        (utils/rng.batch_random_bytes) — the fast path feeds the fixed-base
        kernel's byte-window wire format without Python-int round-trips."""
        size = len(m)
        m_p = _pad_batch(list(m), 0, self.backend)
        r_is_bytes = isinstance(r, np.ndarray) and r.dtype == np.uint8
        if r_is_bytes and not _is_rns(self.backend):
            # non-RNS backends take window-encoded ints: decode once
            r = [
                int.from_bytes(row.tobytes(), "little") for row in r
            ]
            r_is_bytes = False
        if r_is_bytes:
            r_p, ebits = None, self.randbits
        else:
            r_p = _pad_batch(list(r), 0, self.backend)
            ebits = max(self.randbits, max_bitlength(r_p))
        nw = _round_windows(num_windows(ebits))
        m_a = self._upload_narrow(m_p)
        n2_n, n2_n0inv, n2_r2, n2_one = self.n2_args
        if _is_rns(self.backend):
            _, kc, conv = self.rns
            interp = _rns_interp(self.backend)
            planes, NP = self.fixedbase
            if -(-ebits // 8) <= NP:  # exponents fit the table
                if r_is_bytes:
                    rb = np.zeros((len(m_p), NP), np.uint8)
                    rb[: r.shape[0], : r.shape[1]] = r
                    r_b = jnp.asarray(rb)
                else:
                    r_b = jnp.asarray(ints_to_bytes_le(r_p, NP))
                res = pops.rns_fb_modexp_stage(
                    planes, r_b, kc, interpret=interp
                )
            else:  # injected oversized exponents: variable-base fallback
                r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
                hs_b = jnp.broadcast_to(self.hs_limbs, (len(m_p), self.L2))
                res = pops.rns_modexp_stage(hs_b, r_w, kc, interpret=interp)
            out = pops.encrypt_post_stage(
                res, m_a, self.n_limbs, conv, n2_n, n2_n0inv, n2_r2,
                interpret=interp,
            )
            return DevLimbs(out, size)
        r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
        out = pops.encrypt_djn_op(
            m_a, r_w, self.n_limbs, n2_n, n2_n0inv, n2_r2, n2_one,
            self.hs_limbs, backend=self.backend,
        )
        return DevLimbs(out, size)

    def encrypt_normal_dev(self, m: Sequence[int], r: Sequence[int]) -> DevLimbs:
        size = len(m)
        m_p = _pad_batch(list(m), 0, self.backend)
        r_p = _pad_batch(list(r), 1, self.backend)
        m_a = self._upload_narrow(m_p)
        r_a = jnp.asarray(ints_to_limbs(r_p, self.L2))
        n2_n, n2_n0inv, n2_r2, n2_one = self.n2_args
        if _is_rns(self.backend):
            _, kc, conv = self.rns
            interp = _rns_interp(self.backend)
            # the exponent (n) is shared by every row: SMEM shared-window path
            res = pops.rns_modexp_shared_stage(
                r_a, self.n_wins, kc, interpret=interp
            )
            out = pops.encrypt_post_stage(
                res, m_a, self.n_limbs, conv, n2_n, n2_n0inv, n2_r2,
                interpret=interp,
            )
            return DevLimbs(out, size)
        out = pops.encrypt_normal_op(
            m_a, r_a, self.n_wins, self.n_limbs, n2_n, n2_n0inv, n2_r2,
            n2_one, backend=self.backend,
        )
        return DevLimbs(out, size)

    def obfuscate_dev(self, ct, r) -> DevLimbs:
        """Standalone re-obfuscation: ct * hs^r (DJN, ipcl/pub_key.cpp:51-64)
        or ct * r^n (normal, :66-80) mod n^2.  ``ct`` is DevLimbs or a host
        int list; ``r`` follows encrypt_djn_dev's conventions."""
        ct_a, size = self._ct_operand(ct, 1)
        B = ct_a.shape[0]
        n2_n, n2_n0inv, n2_r2, n2_one = self.n2_args
        if self.hs_limbs is not None:  # DJN: obf = hs^r
            r_is_bytes = isinstance(r, np.ndarray) and r.dtype == np.uint8
            if r_is_bytes and not _is_rns(self.backend):
                r = [int.from_bytes(row.tobytes(), "little") for row in r]
                r_is_bytes = False
            if r_is_bytes:
                r_p, ebits = None, self.randbits
            else:
                r_p = _pad_batch(list(r), 0, self.backend)
                ebits = max(self.randbits, max_bitlength(r_p))
            if _is_rns(self.backend):
                _, kc, conv = self.rns
                interp = _rns_interp(self.backend)
                planes, NP = self.fixedbase
                if -(-ebits // 8) <= NP:
                    if r_is_bytes:
                        rb = np.zeros((B, NP), np.uint8)
                        rb[: r.shape[0], : r.shape[1]] = r
                        r_b = jnp.asarray(rb)
                    else:
                        r_b = jnp.asarray(ints_to_bytes_le(r_p, NP))
                    res = pops.rns_fb_modexp_stage(
                        planes, r_b, kc, interpret=interp
                    )
                else:
                    nw = _round_windows(num_windows(ebits))
                    r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
                    hs_b = jnp.broadcast_to(self.hs_limbs, (B, self.L2))
                    res = pops.rns_modexp_stage(hs_b, r_w, kc, interpret=interp)
                out = pops.mul_res_post_stage(ct_a, res, conv, n2_n,
                                              interpret=interp)
                return DevLimbs(out, size)
            nw = _round_windows(num_windows(ebits))
            r_w = jnp.asarray(ints_to_windows(r_p, nw * 4))
            out = pops.obfuscate_op(
                ct_a, self.hs_limbs, r_w, n2_n, n2_n0inv, n2_r2, n2_one,
                backend=self.backend,
            )
            return DevLimbs(out, size)
        # normal mode: obf = r^n, shared exponent n
        r_p = _pad_batch(list(r), 1, self.backend)
        r_a = jnp.asarray(ints_to_limbs(r_p, self.L2))
        if _is_rns(self.backend):
            _, kc, conv = self.rns
            interp = _rns_interp(self.backend)
            res = pops.rns_modexp_shared_stage(
                r_a, self.n_wins, kc, interpret=interp
            )
            out = pops.mul_res_post_stage(ct_a, res, conv, n2_n,
                                          interpret=interp)
            return DevLimbs(out, size)
        out = pops.obfuscate_op(
            ct_a, r_a, self.n_wins, n2_n, n2_n0inv, n2_r2, n2_one,
            backend=self.backend,
        )
        return DevLimbs(out, size)

    def encrypt_noobf_dev(self, m: Sequence[int]) -> DevLimbs:
        size = len(m)
        m_p = _pad_batch(list(m), 0, self.backend)
        m_a = self._upload_narrow(m_p)
        out = pops.encrypt_noobf_op(m_a, self.n_limbs, self.n2_args[0])
        return DevLimbs(out, size)

    def add_ctct_dev(self, a, b) -> DevLimbs:
        a_a, size = self._ct_operand(a, 0)
        b_a, b_size = self._ct_operand(b, 1)
        if b_size == 1 and size != 1:
            b_a = jnp.broadcast_to(b_a[:1], a_a.shape)
        n2_n, n2_n0inv, n2_r2, _ = self.n2_args
        if _is_rns(self.backend):
            _, kc, conv = self.rns
            out = pops.add_ctct_rns_op(a_a, b_a, conv, n2_n)
            return DevLimbs(out, size)
        out = pops.add_ctct_op(
            a_a, b_a, n2_n, n2_n0inv, n2_r2, backend=self._cios()
        )
        return DevLimbs(out, size)

    def mul_ctpt_dev(self, ct, pt: Sequence[int]) -> DevLimbs:
        ct_a, size = self._ct_operand(ct, 1)
        # a scalar PT keeps its size-1 row: the shared-exponent kernel path
        # (detected BEFORE padding, which would hide it behind a full tile)
        shared_pt = len(pt) == 1 and ct_a.shape[0] != 1
        pt_p = list(pt) if shared_pt else _pad_batch(list(pt), 0, self.backend)
        nw = _round_windows(num_windows(max_bitlength(pt_p)))
        pt_w = jnp.asarray(ints_to_windows(pt_p, nw * 4))
        n2_n, n2_n0inv, n2_r2, n2_one = self.n2_args
        if _is_rns(self.backend):
            _, kc, conv = self.rns
            interp = _rns_interp(self.backend)
            if shared_pt:  # one plaintext scalar: shared-exponent kernel
                res = pops.rns_modexp_shared_stage(
                    ct_a, pt_w, kc, interpret=interp
                )
            else:
                res = pops.rns_modexp_stage(ct_a, pt_w, kc, interpret=interp)
            out = pops.rns_finalize_stage(res, conv, n2_n, self.L2)
            return DevLimbs(out, size)
        if shared_pt:
            pt_w = jnp.broadcast_to(pt_w, (ct_a.shape[0], pt_w.shape[-1]))
        out = pops.mul_ctpt_op(
            ct_a, pt_w, n2_n, n2_n0inv, n2_r2, n2_one, backend=self.backend
        )
        return DevLimbs(out, size)

    # -- legacy list-returning wrappers --------------------------------------

    def encrypt_djn(self, m, r) -> List[int]:
        return self.encrypt_djn_dev(m, r).fetch()

    def encrypt_normal(self, m, r) -> List[int]:
        return self.encrypt_normal_dev(m, r).fetch()

    def encrypt_noobf(self, m) -> List[int]:
        return self.encrypt_noobf_dev(m).fetch()

    def add_ctct(self, a, b) -> List[int]:
        return self.add_ctct_dev(a, b).fetch()

    def mul_ctpt(self, ct, pt) -> List[int]:
        return self.mul_ctpt_dev(ct, pt).fetch()


class PrivateEngine:
    """Device pipelines for one private key (CRT + RAW decrypt)."""

    def __init__(
        self,
        n: int,
        p: int,
        q: int,
        lam: int,
        x: int,
        hp: int,
        hq: int,
        backend: Optional[str] = None,
    ):
        assert p < q
        self.backend = backend or default_backend()
        self.n = n
        self.nbits = n.bit_length()
        pbits = max(p.bit_length(), q.bit_length())
        self.Lp = limbs_for_bits(pbits)
        self.mont_p2 = MontConstants.create(p * p, 2 * pbits)
        self.mont_q2 = MontConstants.create(q * q, 2 * pbits)
        self.Lp2 = self.mont_p2.num_limbs
        assert self.mont_q2.num_limbs == self.Lp2
        self.mont_p = MontConstants.create(p, pbits)
        self.mont_q = MontConstants.create(q, pbits)
        assert self.mont_q.num_limbs == self.Lp

        def stack(attr_p, attr_q):
            return jnp.asarray(np.stack([attr_p, attr_q]))

        self.sq_n = stack(self.mont_p2.n_limbs, self.mont_q2.n_limbs)
        self.sq_n0inv = jnp.asarray(
            np.array([self.mont_p2.n0inv, self.mont_q2.n0inv], np.uint32)
        )
        self.sq_r2 = stack(self.mont_p2.r2_limbs, self.mont_q2.r2_limbs)
        self.sq_one = stack(self.mont_p2.one_limbs, self.mont_q2.one_limbs)
        ewbits = _round_windows(num_windows(pbits)) * 4
        self.exp_wins = jnp.asarray(
            np.stack(
                [ints_to_windows([p - 1], ewbits), ints_to_windows([q - 1], ewbits)]
            )
        )  # [2, 1, NW]
        R_lp = 1 << (LIMB_BITS * self.Lp)
        self.hensel = stack(
            ints_to_limbs([pow(p, -1, R_lp)], self.Lp)[0],
            ints_to_limbs([pow(q, -1, R_lp)], self.Lp)[0],
        )
        self.hfun = stack(
            ints_to_limbs([hp], self.Lp)[0], ints_to_limbs([hq], self.Lp)[0]
        )
        self.pq_n = stack(self.mont_p.n_limbs, self.mont_q.n_limbs)
        self.pq_n0inv = jnp.asarray(
            np.array([self.mont_p.n0inv, self.mont_q.n0inv], np.uint32)
        )
        self.pq_r2 = stack(self.mont_p.r2_limbs, self.mont_q.r2_limbs)
        self.pinv_q = jnp.asarray(ints_to_limbs([pow(p, -1, q)], self.Lp)[0])
        self.p_limbs = jnp.asarray(ints_to_limbs([p], self.Lp)[0])

        # RAW-mode constants (lambda exponent over n^2, then L-function by n)
        self.mont_n2 = MontConstants.create(n * n, 2 * self.nbits)
        self.mont_n = MontConstants.create(n, self.nbits)
        self.Ln = self.mont_n.num_limbs
        lam_bits = _round_windows(num_windows(self.nbits)) * 4
        self.lam_wins = jnp.asarray(ints_to_windows([lam], lam_bits))
        R_ln = 1 << (LIMB_BITS * self.Ln)
        self.hensel_n = jnp.asarray(ints_to_limbs([pow(n, -1, R_ln)], self.Ln)[0])
        self.x_limbs = jnp.asarray(ints_to_limbs([x], self.Ln)[0])
        self._p, self._q, self._pbits = p, q, pbits
        self._rns_crt = None
        self._rns_raw = None

    @property
    def rns_crt(self):
        """Grouped (p^2, q^2) RNS machinery: (kernel consts, conv consts)."""
        if self._rns_crt is None:
            import jax as _jax

            from ..ops.pallas_rns2 import stack_group_consts2
            from ..ops.rns import GUARD_FACTOR, RNSContext

            bits = 2 * self._pbits + GUARD_FACTOR.bit_length()
            cp = RNSContext.create(
                self._p * self._p, in_limbs=self.Lp2, product_bits=bits
            )
            cq = RNSContext.create(
                self._q * self._q, in_limbs=self.Lp2, product_bits=bits
            )
            kc2 = stack_group_consts2([cp, cq])
            conv2 = _jax.tree.map(
                lambda a, b: jnp.stack([jnp.asarray(a), jnp.asarray(b)]),
                cp.device_consts(), cq.device_consts(),
            )
            self._rns_crt = (kc2, conv2)
        return self._rns_crt

    @property
    def rns_raw(self):
        """RNS machinery for the RAW path (modulus n^2)."""
        if self._rns_raw is None:
            from ..ops.pallas_rns2 import stack_group_consts2
            from ..ops.rns import RNSContext

            ctx = RNSContext.create(
                self.n * self.n, in_limbs=self.mont_n2.num_limbs
            )
            self._rns_raw = (stack_group_consts2([ctx]), ctx.device_consts())
        return self._rns_raw

    def _ct_operand(self, ct, width: int):
        """Decrypt input (DevLimbs or int list) -> ([Bp, width] array, size)."""
        if isinstance(ct, DevLimbs):
            arr, size = ct.arr, ct.size
            pad = width - arr.shape[-1]
            if pad > 0:
                arr = jnp.concatenate(
                    [arr, jnp.zeros(arr.shape[:-1] + (pad,), jnp.uint32)], -1
                )
            elif pad < 0:
                raise ValueError("ciphertext limbs wider than decrypt expects")
            return arr, size
        ct_p = _pad_batch(list(ct), 1, self.backend)
        if self.backend != "xla":
            return _upload_limbs(ct_p, width), len(ct)
        return jnp.asarray(ints_to_limbs(ct_p, width)), len(ct)

    def decrypt_crt_dev(self, ct) -> DevLimbs:
        ct_a, size = self._ct_operand(ct, 2 * self.Lp2)
        if _is_rns(self.backend):
            kc2, conv2 = self.rns_crt
            out = pops.decrypt_crt_rns_op(
                ct_a,
                self.sq_n, self.sq_n0inv, self.sq_r2,
                self.exp_wins, self.hensel, self.hfun,
                self.pq_n, self.pq_n0inv, self.pq_r2,
                self.pinv_q, self.p_limbs,
                kc2, conv2,
                interpret=_rns_interp(self.backend),
            )
        else:
            out = pops.decrypt_crt_op(
                ct_a,
                self.sq_n,
                self.sq_n0inv,
                self.sq_r2,
                self.sq_one,
                self.exp_wins,
                self.hensel,
                self.hfun,
                self.pq_n,
                self.pq_n0inv,
                self.pq_r2,
                self.pinv_q,
                self.p_limbs,
                backend=self.backend,
            )
        return DevLimbs(out, size)

    def decrypt_raw_dev(self, ct) -> DevLimbs:
        ct_a, size = self._ct_operand(ct, self.mont_n2.num_limbs)
        n2_n, n2_n0inv, n2_r2, n2_one = self.mont_n2.as_device_args()
        n_n, n_n0inv, n_r2, _ = self.mont_n.as_device_args()
        if _is_rns(self.backend):
            kc, conv = self.rns_raw
            interp = _rns_interp(self.backend)
            cios = "pallas_interpret" if interp else "pallas"
            res_r = pops.rns_modexp_shared_stage(
                ct_a, self.lam_wins, kc, interpret=interp
            )
            res = pops.rns_finalize_stage(res_r, conv, n2_n, n2_n.shape[-1])
            out = pops.hensel_post_stage(
                res, self.hensel_n, self.x_limbs, n_n, n_n0inv, n_r2,
                backend=cios,
            )
        else:
            out = pops.decrypt_raw_op(
                ct_a,
                self.lam_wins,
                n2_n,
                n2_n0inv,
                n2_r2,
                n2_one,
                self.hensel_n,
                self.x_limbs,
                n_n,
                n_n0inv,
                n_r2,
                backend=self.backend,
            )
        return DevLimbs(out, size)

    # -- legacy list-returning wrappers --------------------------------------

    def decrypt_crt(self, ct) -> List[int]:
        return self.decrypt_crt_dev(ct).fetch()

    def decrypt_raw(self, ct) -> List[int]:
        return self.decrypt_raw_dev(ct).fetch()
