"""Fused-constant RNS Montgomery modexp kernels, v3.

Same Bajard-Imbert algorithm as the XLA oracle (ops/rns.py) with the VPU
side restructured around measured costs.  The kernel is VPU-issue-bound
(knockout experiments on a v5e: MXU 5%, Barrett chains 37%, everything
else muls/splits/casts), so v3 exists to minimize per-Montgomery-multiply
VPU op count.  Techniques, in decreasing order of measured impact:

1. The two RNS bases live in SEPARATE arrays (x_A [Bt, k], x_B [Bt, k+1]):
   a concatenated [Bt, K] layout pays a lane-relayout per multiply
   (offset-149 slices shift every vreg).
2. **Scaled-B carry**: the B-side residues are carried pre-multiplied by
   w_j = (M_B/b_j)^{-1} mod b_j (and M_B^{-1} mod m_r on the redundant
   lane).  The per-lane constants of the fused reduction absorb w, so the
   Shenoy weights sigma2 = r_B * w that v2 computed with a separate
   full-width mulmod now fall out of the reduction for free.  The scaled
   domain is internal: inputs are scaled via the conversion constants
   (CinB columns) and outputs unscaled once per kernel invocation.
3. **Deferred matmul reductions**: a base extension's raw digit-plane
   outputs are NOT Barrett-reduced; they enter the consumer's fused
   reduction as five 2^7/2^14/2^21/2^28-weighted terms (the 2^21/2^28
   weights folded as per-lane constants).  Each mont_mul runs exactly
   THREE full-width Barrett chains (sigma, z_B, r_A) instead of six.
4. The raw 28-bit product is split once (hi = u >> 14, lo = u & mask) and
   every consumer folds the 2^14 factor into its per-lane constant.
5. N * M_A^{-1} mod b rides the T1 matmul weights, so (s + q_hat*N)*MAinv
   is ONE fused reduction: z_B = red(u_hi*c1 + u_lo*c0 + q2t + alpha*c_a).
6. The Kawamura alpha fraction rides the T1 base-extension matmul as one
   extra weight column (floor(2^27/a_i)), replacing a full-width f32
   convert + multiply + cross-lane reduction with a narrow column fold.
7. Four-matmul int8 digit planes with i32 accumulation (the MXU is ~90%
   idle, s8s8s32 runs at 2x bf16 rate, and the i32 outputs need no
   float->int converts; Karatsuba's sum plane saved MXU time v3 doesn't
   need and cost VPU adds/casts it can't afford).
8. A shared-exponent kernel variant keeps the windows in SMEM and gathers
   the table row by scalar index — decrypt exponents (p-1, q-1), RAW
   lambda, and normal-mode n are the same for every batch row, so the
   16-way vector select and the window roll disappear.

Numerical contracts (checked in tests/test_rns_backend.py against pow()):
moduli in (2^12, 2^14); residues canonical (< m) between multiplies;
fused Barrett inputs < 2^29.7 with quotient error < 8 (three
conditional-subtract layers: 4m, 2m, m handle < 8m) — the integer
flavor is only valid for moduli > 2^13, so wide-pool constant sets
(any modulus < 2^13, reached by 6k+ -bit N) force the f32-reciprocal
flavor whose one-subtract bound holds for any m > 2^12; represented
values < 3N.

Reference anchor: this is the TPU replacement for the reference's entire
modexp acceleration stack (ipcl/mod_exp.cpp:446-533 mbx_exp_mb8 and the QAT
pipeline, module/heqat/heqat/bnops.c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import WINDOW_BITS
from .rns import ALPHA_MARGIN, DIGIT_BITS, DIGIT_MASK, MOD_BITS

_U32 = jnp.uint32
_I32 = jnp.int32
_F32 = jnp.float32
_BF16 = jnp.bfloat16
BATCH_TILE = 128
_TABLE = 1 << WINDOW_BITS
_MASK14 = (1 << MOD_BITS) - 1

FB_WINDOW_BITS = 8
FB_TABLE = 1 << FB_WINDOW_BITS

#: Kawamura alpha-column weight scale: floor(2^26 / a_i) — see
#: _per_ctx_consts2 for why 26 and not 27.
ALPHA_W_BITS = 26


def _red_mu(v, m, mu, layers=3):
    """Fused reduction: v < 2^29.7 -> v mod m (m in (2^13, 2^14)).

    Two statically-selected flavors, dispatched on ``mu``'s dtype (fixed
    at constant-build time, stack/fold_group_consts2 ``f32_mu``):

    * uint32 ``mu`` = floor(2^28/m) — integer Barrett.  Quotient error
      < 8 at this bound, so r < 8m after the estimate; the 4m/2m/m
      conditional-subtract chain canonicalizes.  Default for the
      fixed-base encrypt kernels (the f32 flavor regressed them 10x on
      TPU, VERDICT r03).
    * float32 ``mu`` = (1 - 2^-20)/m — reciprocal flavor.  The truncated
      quotient q = i32(f32(v) * mu) is in {q_true-1, q_true}: the 2^-20
      downward bias dominates the three rounding errors (v's i32->f32
      cast at <= 2^-24 rel for v < 2^30, mu's f32 rounding, the
      product's), so ONE conditional subtract canonicalizes — ~4 VPU
      ops saved per chain, 3 chains per mont_mul.  Casts go
      u32 -> i32 -> f32 (Mosaic has no uint<->float path).

    ``layers=2`` stops at r < 2m for consumers that tolerate a
    redundant residue.  (Mosaic cannot lower unsigned min, so the
    subtracts stay where-selects.)"""
    if mu.dtype == _F32:
        q = _to_u32(v.astype(_I32).astype(_F32) * mu)
        r = v - q * m
    else:
        q = ((v >> MOD_BITS) * mu) >> MOD_BITS
        r = v - q * m
        m4 = m << 2
        m2 = m << 1
        r = jnp.where(r >= m4, r - m4, r)
        r = jnp.where(r >= m2, r - m2, r)
    if layers >= 3:
        r = jnp.where(r >= m, r - m, r)
    return r


def _inv_f32(mods):
    """The f32 reciprocal rows for _red_mu's f32 flavor (rns.inv_f32)."""
    from .rns import inv_f32

    return inv_f32(mods)


def _mulmod(x, y, m, mu):
    return _red_mu(x * y, m, mu)


def _mm(a, b):
    """bf16 matmul with f32 accumulate (one-hot table gathers)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=_F32
    )


def _mm8(a, b):
    """Exact integer matmul on the MXU: int8 digit planes, i32 accumulate
    (v5e runs s8s8s32 at 2x the bf16 rate; the i32 output needs no
    float->int converts, unlike the bf16/f32 form)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=_I32
    )


def _group_bcast(vals, mask):
    """Broadcast per-group columns [Bt, 2] (u32) to their group's lanes:
    lanes with ``mask`` != 0 take column 0, the rest column 1.

    Replaces the v3 f32 selector matmuls ([Bt, 2] @ [2, lanes] pinned to
    Precision.HIGHEST for exactness, which cost ~2.4 ms/2048-batch and
    made the folded layout measure BEHIND grouped in round 4): two value
    lane-broadcasts plus one select are plain VPU ops with no precision
    caveat."""
    h = vals.shape[0]
    w = mask.shape[-1]
    a0 = jnp.broadcast_to(vals[:, 0:1], (h, w))
    a1 = jnp.broadcast_to(vals[:, 1:2], (h, w))
    return jnp.where(mask != 0, a0, a1)


def _to_u32(xf):
    return xf.astype(_I32).astype(_U32)


def _to_bf16(x):
    return x.astype(_I32).astype(_BF16)


_I8 = jnp.int8


def _mm_terms(x, Tlo, Thi, c28, c21, ncols=None, lean=False):
    """Deferred-reduction base extension: the 2^14-radix fold of x @ T.

    x [Bt, k] < 2^14 (7-bit digit planes as int8; products <= 127^2
    accumulate exactly in i32); T pre-split into 7-bit int8 planes.
    Returns a u32 value congruent to (x @ T) columnwise mod m, with the
    out-of-range plane weights folded through the per-lane constants
    c28 = 2^28 mod m (and c21 = 2^21 mod m in the full fold).  The
    single Barrett lives in the CONSUMER's fused reduction.

    ``lean`` (f32-flavor consumers only): keep the mid plane UNsplit —
    t = ll + (mid << 7) + ((hh & m14) << 14) + (hh >> 14) * c28, four
    VPU ops fewer, value < 2^30.6 (mid < 2^23.3 so mid << 7 < 2^30.3).
    That bound exceeds the integer-Barrett reach but sits inside the
    f32-reciprocal flavor's v < 2^31 contract — callers must only pass
    ``lean`` when ``mu`` is f32 (asserted via the constant dtype at the
    call sites).

    ``ncols``: when T carries extra non-modular columns (the Kawamura
    alpha weights), fold only the first ``ncols`` columns and return the
    raw (ll, mid, hh) i32 planes alongside for the caller to combine."""
    xlo = (x & DIGIT_MASK).astype(_I32).astype(_I8)
    xhi = (x >> DIGIT_BITS).astype(_I32).astype(_I8)
    ll = _mm8(xlo, Tlo)
    mid = _mm8(xlo, Thi) + _mm8(xhi, Tlo)
    hh = _mm8(xhi, Thi)
    raw = (ll, mid, hh)
    if ncols is not None:
        ll = ll[:, :ncols]
        mid = mid[:, :ncols]
        hh = hh[:, :ncols]
    llu, midu, hhu = ll.astype(_U32), mid.astype(_U32), hh.astype(_U32)
    if lean:
        t = (
            llu
            + (midu << DIGIT_BITS)
            + ((hhu & _MASK14) << MOD_BITS)
            + (hhu >> MOD_BITS) * c28
        )  # < 2^23.3 + 2^30.3 + 2^28 + 2^22.3 < 2^30.6
    else:
        t = (
            (hhu >> MOD_BITS) * c28
            + ((hhu & _MASK14) << MOD_BITS)
            + (midu >> MOD_BITS) * c21
            + ((midu & _MASK14) << DIGIT_BITS)
            + llu
        )  # < 2^28 + 2^23.3 + 2^25 + 2^21 + 2^23.3 < 2^28.3
    if ncols is not None:
        return t, raw
    return t


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

def _per_ctx_consts2(c, f32_mu=False):
    """v3 fused constants for ONE RNSContext (see stack_group_consts2).

    ``f32_mu`` selects _red_mu's f32-reciprocal flavor for the full-width
    reduction chains (decrypt kernels measure faster with it; the
    fixed-base encrypt kernels measure much slower — keep the default)."""
    import numpy as np

    k = c.k
    A = c.mods[:k].astype(np.uint64)
    Bx = c.mods[k:].astype(np.uint64)  # B primes + m_r
    if f32_mu:
        muA = _inv_f32(c.mods[:k])
        muBx = _inv_f32(c.mods[k:])
    else:
        muA = c.barrett[:k]
        muBx = c.barrett[k:]
    N = c.N
    mr = int(c.mods[-1])
    sig0 = c.sigma_c_A.astype(np.uint64)
    sig1 = (sig0 << MOD_BITS) % A
    # scaled-B carry weights over the Bx lanes
    wvec = np.concatenate(
        [c.MBj_inv_B, np.array([c.MBinv_mr], np.uint32)]
    ).astype(np.uint64)
    winv = np.array(
        [pow(int(w), -1, int(m)) for w, m in zip(wvec, Bx)], np.uint64
    )
    MAinv = c.MAinv_B.astype(np.uint64)  # over Bx
    c0 = (MAinv * winv) % Bx
    c1 = (c0 << MOD_BITS) % Bx
    NMAinvW = (
        np.array([N % int(m) for m in Bx], np.uint64) * MAinv % Bx
    ) * wvec % Bx
    negMA = np.array([(-c.MA) % int(m) for m in Bx], np.uint64)
    cAlpha = (negMA * NMAinvW) % Bx
    # T1p = T1 * (N * MAinv * w) mod m_j   [k, k+1], plus one extra
    # column of Kawamura alpha weights floor(2^26 / a_i): the alpha
    # fraction sum rides the SAME base-extension matmul.  2^26 (not
    # 2^27) keeps the weight < 2^14 for wide pools (a_i down to 2^12),
    # so its 7-bit int8 digit planes stay valid; the coarser
    # quantization error <= k * 2^-12 plus ALPHA_MARGIN still undershoots
    # by at most 1 for k <= ~3800 (both errors are one-sided downward,
    # so the estimate can never overshoot).
    T1p = (c.T1.astype(np.uint64) * NMAinvW[None, :]) % Bx[None, :]
    aw = ((np.uint64(1) << ALPHA_W_BITS) // A).astype(np.uint64)
    T1p = np.concatenate([T1p, aw[:, None]], axis=1)  # [k, k+2]
    # T2 extended with the m_r column scaled by M_B^{-1} mod m_r
    # (folds the alpha2 = diff * MBinv multiply into the weights)
    T2r_s = (c.T2r.astype(np.uint64) * np.uint64(c.MBinv_mr)) % np.uint64(mr)
    T2x = np.concatenate(
        [c.T2.astype(np.uint64), T2r_s[:, None]], axis=1
    )
    # fused Shenoy pad row: 2^14 * a >= alpha2 * (M_B mod a)
    padA = (A << MOD_BITS).astype(np.uint32)
    # modsAr: A-moduli columns + m_r column (T2x reduction targets)
    modsAr = np.concatenate([c.mods[:k], c.mods[-1:]])
    muAr = (
        _inv_f32(modsAr)
        if f32_mu
        else np.concatenate([muA, c.barrett[-1:]])
    )

    def planes(T):
        lo = (T & DIGIT_MASK).astype(np.int8)
        hi = (T >> DIGIT_BITS).astype(np.int8)
        return lo, hi

    T1lo, T1hi = planes(T1p.astype(np.uint32))
    T2lo, T2hi = planes(T2x.astype(np.uint32))
    # deferred-reduction plane weights per target column
    c28B = ((np.uint64(1) << 28) % Bx).astype(np.uint32)
    c21B = ((np.uint64(1) << 21) % Bx).astype(np.uint32)
    Ar = modsAr.astype(np.uint64)
    c28A = ((np.uint64(1) << 28) % Ar).astype(np.uint32)
    c21A = ((np.uint64(1) << 21) % Ar).astype(np.uint32)
    return dict(
        modsA=c.mods[:k], muA=muA,
        modsBx=c.mods[k:], muBx=muBx,
        modsAr=modsAr, muAr=muAr,
        sig0=sig0.astype(np.uint32), sig1=sig1.astype(np.uint32),
        c0=c0.astype(np.uint32), c1=c1.astype(np.uint32),
        cAlpha=cAlpha.astype(np.uint32),
        c28B=c28B, c21B=c21B, c28A=c28A, c21A=c21A,
        MB_mod_A=c.MB_mod_A,
        padA=padA,
        winv=winv.astype(np.uint32),
        wvec=wvec.astype(np.uint32),
        inv_a_f32=c.inv_a_f32,
        T1lo=T1lo, T1hi=T1hi,
        T2lo=T2lo, T2hi=T2hi,
        # scalars: m_r, mu_r (int Barrett), (unused), 2*m_r (alpha2 pad)
        scal=np.array(
            [mr, int(c.barrett[-1]), 0, 2 * mr], np.uint32
        ),
        # f32 reciprocal of m_r (lane 0; padded to width 4) — the m_r
        # chain's mu when f32_mu is selected (flavor is dispatched on
        # muA's dtype, so both rows always ship)
        scalf=np.concatenate(
            [_inv_f32(c.mods[-1:]), np.zeros((3,), np.float32)]
        ),
        sqA=c.mont_sq[:k],
        sqB=((c.mont_sq[k:].astype(np.uint64) * wvec) % Bx).astype(
            np.uint32
        ),
        oneA=c.mont_one[:k],
        oneB=((c.mont_one[k:].astype(np.uint64) * wvec) % Bx).astype(
            np.uint32
        ),
        poneB=wvec.astype(np.uint32),  # plain 1 in the scaled domain
        CinA=c.Cin[:, :k],
        CinB=(
            (c.Cin[:, k:].astype(np.uint64) * wvec[None, :]) % Bx[None, :]
        ).astype(np.uint32),
    )

def stack_group_consts2(ctxs, f32_mu=False) -> dict:
    """Build the v3 fused constants from RNSContexts (all same k).

    The B-side (and m_r) lanes of every Montgomery-domain constant are
    pre-multiplied by w = [(M_B/b_j)^{-1} mod b_j | M_B^{-1} mod m_r]
    (the scaled-B carry, see module docstring); ``wvec`` is kept in the
    dict for host-side scaling of extra kernel inputs (fixed-base g).
    ``f32_mu`` selects _red_mu's f32-reciprocal flavor (see there);
    wide-pool contexts (rns.is_wide_pool: any modulus < 2^13) force it —
    the integer-Barrett error bound does not hold for them."""
    import numpy as np

    from .rns import is_wide_pool

    f32_mu = f32_mu or any(is_wide_pool(c) for c in ctxs)
    k = ctxs[0].k
    assert all(c.k == k for c in ctxs)
    ds = [_per_ctx_consts2(c, f32_mu=f32_mu) for c in ctxs]
    out = {}
    for key in ds[0]:
        out[key] = jnp.asarray(np.stack([d[key] for d in ds]))
    return out


def fold_group_consts2(ctxs, f32_mu=False, shared_input=False) -> dict:
    """Fold TWO same-k RNSContexts (CRT's p^2 / q^2) into ONE set of
    kernel constants whose LANE axis carries both groups side by side.

    Folding turns the G=2 grid axis of the grouped kernel into lane
    concatenation: a [Bt, 2k] / [Bt, 2k+2] elementwise op covers both
    residue systems at once — every squaring in the exponentiation
    serves both CRT halves, halving the VPU issue per represented
    mont_mul, and the ~40% lane padding the half-width groups pay
    individually (k ~ 150 lanes pads to 256) collapses to ~20%
    (2k ~ 300 pads to 384).  Layout:

      A side   [A_p(k) | A_q(k)]                           (2k lanes)
      B side   [B_p(k) | B_q(k) | mr_p | mr_q]             (2k+2 lanes)
      T1f      [2k, 2k+4]  block-diagonal, output columns
               [B_p | B_q | mr_p | mr_q | alpha_p | alpha_q]
      T2f      [2k, 2k+2]  block-diagonal, output columns
               [A_p | A_q | mr_p | mr_q]
      Cin      [2L, 2k(+2)] block-diagonal (input rows:
               p-limbs | q-limbs), or [L, 2k(+2)] row-shared when
               ``shared_input`` (one limb vector feeds both groups —
               the CRT-decrypt configuration, where the full n^2-width
               ciphertext enters both half-width systems and the
               mod-p^2/q^2 folds ride the Cin weights)

    Group-scoped scalars (Kawamura alpha, Shenoy alpha2) become [Bt, 2]
    columns broadcast to their group's lanes (_group_bcast); the two
    shared exponents select table rows via two scalar reads + the same
    per-lane masks (maskA/maskB).
    """
    import numpy as np

    from .rns import is_wide_pool

    f32_mu = f32_mu or any(is_wide_pool(c) for c in ctxs)
    assert len(ctxs) == 2 and ctxs[0].k == ctxs[1].k
    k = ctxs[0].k
    d0 = _per_ctx_consts2(ctxs[0], f32_mu=f32_mu)
    d1 = _per_ctx_consts2(ctxs[1], f32_mu=f32_mu)
    k2 = 2 * k

    def cat_a(key):  # A-side row constants [k] -> [2k]
        return np.concatenate([d0[key], d1[key]])

    def cat_b(key):  # Bx-side [k+1] -> [B_p | B_q | mr_p | mr_q]
        return np.concatenate(
            [d0[key][:k], d1[key][:k], d0[key][k:], d1[key][k:]]
        )

    out = {}
    for key in ("modsA", "muA", "sig0", "sig1", "sqA", "oneA", "padA",
                "MB_mod_A"):
        out[key] = cat_a(key)
    for key in ("modsBx", "muBx", "c0", "c1", "cAlpha", "c28B", "c21B",
                "winv", "sqB", "oneB", "poneB"):
        out[key] = cat_b(key)
    # T2 reduction targets ([A | m_r] per group) fold the same way
    out["modsAr"] = cat_b("modsAr")
    out["muAr"] = cat_b("muAr")
    out["c28Ar"] = cat_b("c28A")
    out["c21Ar"] = cat_b("c21A")
    # redundant-modulus scalars become [2] rows (one lane per group)
    out["mrv"] = np.array([d0["scal"][0], d1["scal"][0]], np.uint32)
    if f32_mu:
        out["murv"] = np.array([d0["scalf"][0], d1["scalf"][0]], np.float32)
    else:
        out["murv"] = np.array([d0["scal"][1], d1["scal"][1]], np.uint32)
    out["twomrv"] = np.array([d0["scal"][3], d1["scal"][3]], np.uint32)

    def fold_T1(key):  # [k, k+2] per group -> [2k, 2k+4]
        T = np.zeros((k2, k2 + 4), np.int8)
        for g, d in enumerate((d0, d1)):
            rows = slice(g * k, (g + 1) * k)
            T[rows, g * k : (g + 1) * k] = d[key][:, :k]
            T[rows, k2 + g] = d[key][:, k]  # m_r column
            T[rows, k2 + 2 + g] = d[key][:, k + 1]  # alpha column
        return T

    def fold_T2(key):  # [k, k+1] per group -> [2k, 2k+2]
        T = np.zeros((k2, k2 + 2), np.int8)
        for g, d in enumerate((d0, d1)):
            rows = slice(g * k, (g + 1) * k)
            T[rows, g * k : (g + 1) * k] = d[key][:, :k]
            T[rows, k2 + g] = d[key][:, k]
        return T

    out["T1lo"], out["T1hi"] = fold_T1("T1lo"), fold_T1("T1hi")
    out["T2lo"], out["T2hi"] = fold_T2("T2lo"), fold_T2("T2hi")
    # per-lane group masks: the two-exponent table select and the
    # alpha/alpha2 group broadcasts (_group_bcast)
    maskA = np.zeros((k2,), np.uint32)
    maskA[:k] = 1
    maskB = np.zeros((k2 + 2,), np.uint32)
    maskB[:k] = 1
    maskB[k2] = 1
    out["maskA"], out["maskB"] = maskA, maskB

    L = d0["CinA"].shape[0]
    if shared_input:
        # ONE shared limb vector feeds both groups (CRT decrypt: the
        # full n^2-width ciphertext, whose mod-p^2 / mod-q^2 folds ride
        # the per-group Cin weights — ops/rns.py RNSContext.Cin): rows
        # are the shared limbs, columns the per-group lanes.
        CinA = np.concatenate([d0["CinA"], d1["CinA"]], axis=1)
        CinB = np.zeros((L, k2 + 2), np.uint32)
        CinB[:, :k] = d0["CinB"][:, :k]
        CinB[:, k:k2] = d1["CinB"][:, :k]
        CinB[:, k2] = d0["CinB"][:, k]
        CinB[:, k2 + 1] = d1["CinB"][:, k]
    else:
        # block-diagonal input conversions: rows = [p-limbs | q-limbs]
        CinA = np.zeros((2 * L, k2), np.uint32)
        CinA[:L, :k] = d0["CinA"]
        CinA[L:, k:] = d1["CinA"]
        CinB = np.zeros((2 * L, k2 + 2), np.uint32)
        CinB[:L, :k] = d0["CinB"][:, :k]
        CinB[:L, k2] = d0["CinB"][:, k]
        CinB[L:, k:k2] = d1["CinB"][:, :k]
        CinB[L:, k2 + 1] = d1["CinB"][:, k]
    out["CinA"], out["CinB"] = CinA, CinB

    return {key: jnp.asarray(a[None]) for key, a in out.items()}


_MM2_KEYS = (
    "scal", "scalf", "modsA", "muA", "modsBx", "muBx", "modsAr", "muAr", "sig0",
    "sig1", "c0", "c1", "cAlpha", "c28B", "c21B", "c28A", "c21A",
    "MB_mod_A", "padA", "winv", "T1lo", "T1hi", "T2lo",
    "T2hi", "sqA", "sqB", "oneA", "oneB", "poneB",
)
_MM2_NREFS = len(_MM2_KEYS)


def _row_spec(width):
    return pl.BlockSpec(
        (1, 1, width), lambda *i: (i[0], 0, 0), memory_space=pltpu.VMEM
    )


def _mat_spec(r, ccount):
    return pl.BlockSpec(
        (1, r, ccount), lambda *i: (i[0], 0, 0), memory_space=pltpu.VMEM
    )


def _consts_args_specs(consts, keys):
    """(args, in_specs) for the given constant keys; every index map
    selects only the group axis so any grid arity works."""
    args, specs = [], []
    for key in keys:
        a = consts[key]
        if a.ndim == 2:  # row constant [G, w]
            args.append(a[:, None, :])
            specs.append(_row_spec(a.shape[-1]))
        else:  # matrix [G, r, c]
            args.append(a)
            specs.append(_mat_spec(a.shape[-2], a.shape[-1]))
    return args, specs


def _mm2_args_specs(consts):
    return _consts_args_specs(consts, _MM2_KEYS)


def _cref(refs, keys):
    """Unpack the constant refs (dropping each ref's leading group axis)."""
    return {key: ref[0] for key, ref in zip(keys, refs)}


def _mm2_cref(refs):
    return _cref(refs, _MM2_KEYS)


#: Constant refs of the CRT-folded kernel (fold_group_consts2 layout).
_MM2F_KEYS = (
    "mrv", "murv", "twomrv", "modsA", "muA", "modsBx", "muBx", "sig0",
    "sig1", "c0", "c1", "cAlpha", "c28B", "c21B", "c28Ar", "c21Ar",
    "MB_mod_A", "padA", "winv", "maskA", "maskB",
    "T1lo", "T1hi", "T2lo", "T2hi", "sqA", "sqB", "oneA", "oneB", "poneB",
)
_MM2F_NREFS = len(_MM2F_KEYS)


def _make_mont_mul2(c, streams=1, canonical_out=False):
    """Build the fused-reduction Montgomery multiply on (xA, zB) pairs.

    xA [Bt, k] canonical A-side residues; zB [Bt, k+1] canonical SCALED
    B-side residues (z_j = r_j * w_j, m_r on the last lane).  Returns
    (rA, zB) for x*y*M_A^{-1} mod N (a representative < 3N).  Exactly
    three full-width Barrett chains per multiply (sigma, z_B, r_A), each
    canonicalizing (sigma feeds int8 digit planes, so it needs 7-bit
    digits) — the base extensions enter the consumers unreduced via
    _mm_terms, and the Shenoy weights fall out of the scaled carry.

    When ``c`` is a FOLDED constant set (fold_group_consts2: two residue
    systems side by side on the lane axis), the same body runs with the
    doubled lane widths; the per-group alpha/alpha2 columns ([Bt, 2])
    broadcast to their group's lanes via exact f32 selector matmuls.

    ``streams > 1`` returns a multi-stream form: it takes LISTS of operand
    pairs and advances them stage-interleaved, so the Mosaic scheduler can
    overlap one stream's MXU base-extension with another's VPU reductions
    (within a single multiply the dependence chain forbids any overlap)."""
    k = c["sig0"].shape[-1]  # total A lanes (2k when folded)
    folded = "maskB" in c
    # lean deferred-reduction fold (see _mm_terms): only when the fused
    # reductions are the f32 flavor (its v < 2^31 contract absorbs the
    # larger fold bound) AND the matmul contraction is narrow enough
    # that the unsplit mid plane cannot overflow u32:
    # 16129 * 259 * K + 2^28 + 5.4e8 < 2^31  =>  K <= 320.
    lean = c["muA"].dtype == _F32 and c["T1lo"].shape[-2] <= 320
    if folded:
        m_r, mu_r = c["mrv"], c["murv"]  # [1, 2]
        two_mr = c["twomrv"]
        c28A, c21A = c["c28Ar"], c["c21Ar"]
    else:
        scal = c["scal"]  # [1, 4]: m_r, mu_r(int), (unused), 2*m_r
        m_r = scal[:, 0:1]
        # _red_mu flavor follows the constant set (muA's dtype)
        mu_r = (
            c["scalf"][:, 0:1] if c["muA"].dtype == _F32 else scal[:, 1:2]
        )
        two_mr = scal[:, 3:4]
        c28A, c21A = c["c28A"], c["c21A"]

    def mont_mul_multi(xs, ys):
        us = [(xA * yA, xB * yB) for (xA, xB), (yA, yB) in zip(xs, ys)]
        spl = [
            (uA >> MOD_BITS, uA & _MASK14, uB >> MOD_BITS, uB & _MASK14)
            for uA, uB in us
        ]
        # sigma = (s_A * -N^{-1} (M_A/a_i)^{-1}) mod a_i, from the raw
        # split; canonical (the int8 digit planes need 7-bit digits)
        sigmas = [
            _red_mu(hA * c["sig1"] + lA * c["sig0"], c["modsA"], c["muA"])
            for hA, lA, _, _ in spl
        ]
        # base extension A -> B+mr with N*MAinv*w folded into the
        # weights; the last T1 column(s) carry the Kawamura alpha sum(s)
        kp1 = c["c28B"].shape[-1]
        tB_raws = [
            _mm_terms(s, c["T1lo"], c["T1hi"], c["c28B"], c["c21B"],
                      ncols=kp1, lean=lean)
            for s in sigmas
        ]
        # Kawamura alpha estimate from the matmul's alpha column
        # (undershoots by at most 1, never overshoots)
        alphas = []
        for _, (ll, mid, hh) in tB_raws:
            af = (
                ll[:, kp1:].astype(_F32)
                + mid[:, kp1:].astype(_F32) * float(1 << DIGIT_BITS)
                + hh[:, kp1:].astype(_F32) * float(1 << (2 * DIGIT_BITS))
            ) * (1.0 / (1 << ALPHA_W_BITS))
            a_f = jnp.maximum(jnp.floor(af - ALPHA_MARGIN), 0.0)
            if folded:
                # [Bt, 2] -> per-lane alpha via group broadcasts
                alphas.append(_group_bcast(_to_u32(a_f), c["maskB"]))
            else:
                alphas.append(_to_u32(a_f))
        # z_B = (s + q_hat N) MAinv w mod b, all terms fused: < 2^29.7
        zBs = [
            _red_mu(
                hB * c["c1"] + lB * c["c0"] + tB + a * c["cAlpha"],
                c["modsBx"], c["muBx"],
            )
            for (_, _, hB, lB), (tB, _), a in zip(spl, tB_raws, alphas)
        ]
        # exact Shenoy extension back to base A: z_B IS the weight vector
        tAs = [
            _mm_terms(zB[:, :k], c["T2lo"], c["T2hi"], c28A, c21A,
                      lean=lean)
            for zB in zBs
        ]  # unreduced terms; trailing column(s) = m_r (MBinv-scaled)
        outs = []
        for tA, zB in zip(tAs, zBs):
            alpha2 = _red_mu(
                tA[:, k:] + two_mr - zB[:, k:], m_r, mu_r
            )  # [Bt, G], exact
            if folded:
                a2 = _group_bcast(alpha2, c["maskA"])
            else:
                a2 = alpha2
            # rA may stay redundant (< 2m) under the f32 flavor: its only
            # consumers are lane products (u_A < 4m^2 < 2^30, and the
            # sigma chain tolerates the wider split: h_A*sig1 + l_A*sig0
            # < 2^30.4 < 2^31) and the out-of-RNS reconstruction, which
            # reduces per-residue anyway.  The integer flavor keeps the
            # third layer (its quotient-error bound would hit the 8m
            # chain limit with redundant inputs), as do callers whose
            # outputs feed int8 digit planes (``canonical_out``: the
            # fixed-base TABLE build — a redundant 15-bit entry would
            # overflow the 7-bit plane split).
            lax_ra = c["muA"].dtype == _F32 and not canonical_out
            rA = _red_mu(
                tA[:, :k] + c["padA"] - a2 * c["MB_mod_A"],
                c["modsA"], c["muA"],
                layers=2 if lax_ra else 3,
            )
            outs.append((rA, zB))
        return outs

    if streams > 1:
        return mont_mul_multi

    def mont_mul(xA, xB, yA, yB):
        ((rA, rB),) = mont_mul_multi([(xA, xB)], [(yA, yB)])
        return rA, rB

    return mont_mul


def _limbs_to_res2(xl, CinA, CinB, c):
    """In-kernel limbs [Bt, L] -> residue pair ([Bt,k], [Bt,k+1])."""
    def side(Cin, m, mu):
        Clo = _to_bf16(Cin & DIGIT_MASK)
        Chi = _to_bf16(Cin >> DIGIT_BITS)
        acc = None
        for shift in (0, DIGIT_BITS, 2 * DIGIT_BITS):
            d = _to_bf16((xl >> shift) & DIGIT_MASK)
            v = _red_mu(
                (_to_u32(_mm(d, Chi)) << DIGIT_BITS) + _to_u32(_mm(d, Clo)),
                m, mu,
            )
            term = v << shift
            acc = term if acc is None else _red_mu(acc + term, m, mu)
        return acc

    return (
        side(CinA, c["modsA"], c["muA"]),
        side(CinB, c["modsBx"], c["muBx"]),
    )


# ---------------------------------------------------------------------------
# windowed modexp kernels
# ---------------------------------------------------------------------------


def _modexp2_body_streams(c, refs, streams):
    """Shared-exponent body with ``streams`` row-slices advanced
    stage-interleaved (MXU/VPU overlap across streams).

    Works on grouped constants (one residue system, ONE SMEM exponent)
    and on CRT-FOLDED constants (fold_group_consts2: both residue
    systems on the lane axis, TWO SMEM exponents whose table rows are
    merged through the per-lane group masks)."""
    (CinA_ref, CinB_ref, base_ref, win_ref, outA_ref, outB_ref,
     tabA_ref, tabB_ref) = refs
    k = c["sig0"].shape[-1]
    kb = c["oneB"].shape[-1]  # k+1 grouped, k+2 folded
    folded = "maskB" in c
    Bt = base_ref.shape[-2]
    h = Bt // streams
    mm = _make_mont_mul2(c, streams=max(streams, 2))  # always list form
    rows = [slice(s * h, (s + 1) * h) for s in range(streams)]

    xA, xB = _limbs_to_res2(base_ref[0], CinA_ref[0], CinB_ref[0], c)
    xs = [(xA[r], xB[r]) for r in rows]
    sq = [(c["sqA"], c["sqB"])] * streams
    a_s = mm(xs, sq)  # Montgomery form, per stream
    oneA = jnp.broadcast_to(c["oneA"], (h, k)).astype(_U32)
    oneB = jnp.broadcast_to(c["oneB"], (h, kb)).astype(_U32)

    for s, r in enumerate(rows):
        tabA_ref[0, r], tabB_ref[0, r] = oneA, oneB
        tabA_ref[1, r], tabB_ref[1, r] = a_s[s]

    def table_step(t, prev):
        nxt = mm(list(prev), a_s)
        for s, r in enumerate(rows):
            tabA_ref[t, r] = nxt[s][0]
            tabB_ref[t, r] = nxt[s][1]
        return tuple(nxt)

    jax.lax.fori_loop(2, _TABLE, table_step, tuple(a_s))

    NW = win_ref.shape[-1]

    def body(i, carry):
        accs = list(carry)
        for _ in range(WINDOW_BITS):
            accs = mm(accs, accs)
        if folded:
            # one scalar-indexed table row per group, merged by the
            # per-lane group masks (two reads + two selects: noise next
            # to the ~40-VPU-op mont_mul they feed)
            w0 = win_ref[0, 0, i]
            w1 = win_ref[0, 1, i]
            selA = jnp.where(
                c["maskA"] != 0,
                tabA_ref[pl.ds(w0, 1)][0],
                tabA_ref[pl.ds(w1, 1)][0],
            )
            selB = jnp.where(
                c["maskB"] != 0,
                tabB_ref[pl.ds(w0, 1)][0],
                tabB_ref[pl.ds(w1, 1)][0],
            )
        else:
            w = win_ref[0, 0, i]
            selA = tabA_ref[pl.ds(w, 1)][0]
            selB = tabB_ref[pl.ds(w, 1)][0]
        sels = [(selA[r], selB[r]) for r in rows]
        return tuple(mm(accs, sels))

    accs = jax.lax.fori_loop(
        0, NW, body, tuple((oneA, oneB) for _ in range(streams))
    )

    # leave the Montgomery domain (multiply by plain 1, scaled on the B
    # side) and unscale the B lanes on the way out: outB = z * w^{-1}
    pA = jnp.ones((1, k), _U32)
    pB = c["poneB"]
    outs = mm(list(accs), [(pA, pB)] * streams)
    for s, r in enumerate(rows):
        outA_ref[0, r] = outs[s][0]
        outB_ref[0, r] = _mulmod(outs[s][1], c["winv"], c["modsBx"], c["muBx"])


def _modexp2_body(c, refs, shared):
    (CinA_ref, CinB_ref, base_ref, win_ref, outA_ref, outB_ref,
     tabA_ref, tabB_ref) = refs
    k = c["sig0"].shape[-1]
    Bt = base_ref.shape[-2]
    mont_mul = _make_mont_mul2(c)

    xA, xB = _limbs_to_res2(base_ref[0], CinA_ref[0], CinB_ref[0], c)
    aA, aB = mont_mul(xA, xB, c["sqA"], c["sqB"])  # Montgomery form
    oneA = jnp.broadcast_to(c["oneA"], (Bt, k)).astype(_U32)
    oneB = jnp.broadcast_to(c["oneB"], (Bt, k + 1)).astype(_U32)

    tabA_ref[0], tabB_ref[0] = oneA, oneB
    tabA_ref[1], tabB_ref[1] = aA, aB

    def table_step(t, prev):
        pA, pB = prev
        nA, nB = mont_mul(pA, pB, aA, aB)
        tabA_ref[pl.ds(t, 1)] = nA[None]
        tabB_ref[pl.ds(t, 1)] = nB[None]
        return nA, nB

    jax.lax.fori_loop(2, _TABLE, table_step, (aA, aB))

    if shared:
        NW = win_ref.shape[-1]

        def body(i, carry):
            accA, accB = carry
            accA, accB = jax.lax.fori_loop(
                0, WINDOW_BITS,
                lambda _, v: mont_mul(v[0], v[1], v[0], v[1]),
                (accA, accB),
            )
            w = win_ref[0, 0, i]
            selA = tabA_ref[pl.ds(w, 1)][0]
            selB = tabB_ref[pl.ds(w, 1)][0]
            return mont_mul(accA, accB, selA, selB)

        accA, accB = jax.lax.fori_loop(0, NW, body, (oneA, oneB))
    else:
        NW = win_ref.shape[-1]

        def body(i, carry):
            (accA, accB), wins = carry
            accA, accB = jax.lax.fori_loop(
                0, WINDOW_BITS,
                lambda _, v: mont_mul(v[0], v[1], v[0], v[1]),
                (accA, accB),
            )
            w = wins[:, 0:1]
            selA = jnp.zeros((Bt, k), _U32)
            selB = jnp.zeros((Bt, k + 1), _U32)
            for t in range(_TABLE):
                selA = jnp.where(w == t, tabA_ref[t], selA)
                selB = jnp.where(w == t, tabB_ref[t], selB)
            wins = pltpu.roll(wins, shift=NW - 1, axis=1)
            return mont_mul(accA, accB, selA, selB), wins

        (accA, accB), _ = jax.lax.fori_loop(
            0, NW, body, ((oneA, oneB), win_ref[0])
        )

    # leave the Montgomery domain (multiply by plain 1, scaled on the B
    # side): value <= 2N; unscale the B lanes on the way out
    pA = jnp.ones((1, k), _U32)
    pB = c["poneB"]
    outA, outB_z = mont_mul(accA, accB, pA, pB)
    outA_ref[0] = outA
    outB_ref[0] = _mulmod(outB_z, c["winv"], c["modsBx"], c["muBx"])


def _modexp2_kernel_shared(*refs):
    c = _mm2_cref(refs[:_MM2_NREFS])
    _modexp2_body(c, refs[_MM2_NREFS:], shared=True)


@functools.lru_cache(maxsize=None)
def _shared_stream_kernel(streams):
    def kernel(*refs):
        c = _mm2_cref(refs[:_MM2_NREFS])
        _modexp2_body_streams(c, refs[_MM2_NREFS:], streams=streams)

    return kernel


def _modexp2_kernel_var(*refs):
    c = _mm2_cref(refs[:_MM2_NREFS])
    _modexp2_body(c, refs[_MM2_NREFS:], shared=False)


@functools.partial(
    jax.jit, static_argnames=("shared", "interpret", "batch_tile", "streams")
)
def pallas_rns_modexp2(base_limbs, windows, consts, *, shared=False,
                       interpret=False, batch_tile=BATCH_TILE, streams=1):
    """base^e mod N over a [G, B, L] batch of canonical 15-bit limbs.

    windows: [G, NW] uint32 4-bit windows (MS first) when ``shared`` (one
    exponent per group, SMEM-resident), else [G, B, NW] per-row windows.
    Returns residues as one [G, B, K] array (A | B | m_r lanes).
    """
    G, B, L = base_limbs.shape
    k = consts["sig0"].shape[-1]
    Bt = batch_tile
    assert B % Bt == 0
    windows = windows.astype(jnp.int32)

    mm_args, mm_specs = _mm2_args_specs(consts)
    data_l = pl.BlockSpec(
        (1, Bt, L), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )
    if shared:
        NW = windows.shape[-1]
        windows = windows[:, None, :]  # [G, 1, NW]: SMEM-legal block shape
        win_spec = pl.BlockSpec(
            (1, 1, NW), lambda g, b: (g, 0, 0), memory_space=pltpu.SMEM
        )
    else:
        NW = windows.shape[-1]
        win_spec = pl.BlockSpec(
            (1, Bt, NW), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
        )
    args = mm_args + [consts["CinA"], consts["CinB"], base_limbs, windows]
    in_specs = mm_specs + [
        _mat_spec(L, k), _mat_spec(L, k + 1), data_l, win_spec,
    ]
    if shared and streams > 1:
        assert Bt % streams == 0
        kernel = _shared_stream_kernel(streams)
    elif shared:
        kernel = _modexp2_kernel_shared
    else:
        assert streams == 1, "streams>1 requires shared windows"
        kernel = _modexp2_kernel_var
    outA, outB = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, B, k), _U32),
            jax.ShapeDtypeStruct((G, B, k + 1), _U32),
        ),
        grid=(G, B // Bt),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Bt, k), lambda g, b: (g, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, k + 1), lambda g, b: (g, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TABLE, Bt, k), _U32),
            pltpu.VMEM((_TABLE, Bt, k + 1), _U32),
        ],
        interpret=interpret,
    )(*args)
    return jnp.concatenate([outA, outB], axis=-1)


@functools.lru_cache(maxsize=None)
def _folded_stream_kernel(streams):
    def kernel(*refs):
        c = _cref(refs[:_MM2F_NREFS], _MM2F_KEYS)
        _modexp2_body_streams(c, refs[_MM2F_NREFS:], streams=streams)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "batch_tile", "streams")
)
def pallas_rns_modexp2f(base_limbs, windows, consts, *, interpret=False,
                        batch_tile=BATCH_TILE, streams=4):
    """base^e over a CRT-FOLDED lane layout (fold_group_consts2).

    This is the decrypt hot path: instead of running the p^2 and q^2
    residue systems as two sequential grid groups (pallas_rns_modexp2
    with G=2), both live side by side on the LANE axis of one kernel
    step, so the VPU lane padding halves and every squaring serves both
    CRT halves at once (the TPU form of the reference's 2-way CRT
    decomposition, ipcl/pri_key.cpp:114-146).

    base_limbs: rows must match ``consts``' Cin layout — with
    fold_group_consts2(shared_input=True) (the production decrypt
    configuration) each row is ONE shared limb vector (the full
    n^2-width ciphertext; the per-group mod-p^2/q^2 folds ride the Cin
    weights), while the block-diagonal default expects the p-group limbs
    followed by the q-group limbs.  windows [2, NW]: the groups' shared
    exponents (MS window first, SMEM-resident).  Returns one [B, 4k+2]
    residue array in folded lane order
    [A_p | A_q | B_p | B_q | mr_p | mr_q].
    """
    B, L2 = base_limbs.shape
    ka = consts["sig0"].shape[-1]  # 2k
    kb = consts["modsBx"].shape[-1]  # 2k+2
    Bt = batch_tile
    assert B % Bt == 0 and Bt % streams == 0
    wins = windows.astype(jnp.int32)[None]  # [1, 2, NW]
    NW = wins.shape[-1]

    mmf_args, mmf_specs = _consts_args_specs(consts, _MM2F_KEYS)
    data_l = pl.BlockSpec(
        (1, Bt, L2), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )
    win_spec = pl.BlockSpec(
        (1, 2, NW), lambda g, b: (g, 0, 0), memory_space=pltpu.SMEM
    )
    args = mmf_args + [consts["CinA"], consts["CinB"], base_limbs[None], wins]
    in_specs = mmf_specs + [
        _mat_spec(L2, ka), _mat_spec(L2, kb), data_l, win_spec,
    ]
    outA, outB = pl.pallas_call(
        _folded_stream_kernel(streams),
        out_shape=(
            jax.ShapeDtypeStruct((1, B, ka), _U32),
            jax.ShapeDtypeStruct((1, B, kb), _U32),
        ),
        grid=(1, B // Bt),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Bt, ka), lambda g, b: (g, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, kb), lambda g, b: (g, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TABLE, Bt, ka), _U32),
            pltpu.VMEM((_TABLE, Bt, kb), _U32),
        ],
        interpret=interpret,
    )(*args)
    return jnp.concatenate([outA[0], outB[0]], axis=-1)


def unfold_rns_out(res, k):
    """Folded [B, 4k+2] kernel output -> grouped [2, B, 2k+1] residues
    ([A | B | m_r] lane order per group, as pallas_rns_modexp2 returns)."""
    outA, outB = res[:, : 2 * k], res[:, 2 * k :]
    res_p = jnp.concatenate(
        [outA[:, :k], outB[:, :k], outB[:, 2 * k : 2 * k + 1]], axis=-1
    )
    res_q = jnp.concatenate(
        [outA[:, k:], outB[:, k : 2 * k], outB[:, 2 * k + 1 :]], axis=-1
    )
    return jnp.stack([res_p, res_q])


# ---------------------------------------------------------------------------
# fixed-base kernels (table build + gather-multiply)
# ---------------------------------------------------------------------------


def _fb_table2_kernel(*refs):
    c = _mm2_cref(refs[:_MM2_NREFS])
    gA_ref, gB_ref, outA_ref, outB_ref, accA_ref, accB_ref = refs[_MM2_NREFS:]
    # table entries are split into int8 digit planes downstream
    # (fb_digit_planes2): outputs must be canonical
    mont_mul = _make_mont_mul2(c, canonical_out=True)
    j = pl.program_id(1)
    NP = gA_ref.shape[-2]
    k = gA_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        accA_ref[...] = jnp.broadcast_to(c["oneA"], (NP, k)).astype(_U32)
        accB_ref[...] = jnp.broadcast_to(c["oneB"], (NP, k + 1)).astype(_U32)

    outA_ref[0, 0] = accA_ref[...]
    outB_ref[0, 0] = accB_ref[...]

    @pl.when(j < FB_TABLE - 1)
    def _():
        nA, nB = mont_mul(accA_ref[...], accB_ref[...], gA_ref[0], gB_ref[0])
        accA_ref[...] = nA
        accB_ref[...] = nB


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fb_table2(gA, gB, consts, *, interpret=False):
    """Fixed-base table from Montgomery-form g_i = base^(2^(8 i)):
    gA [G, NP, k], gB [G, NP, k+1] -> ([G,256,NP,k], [G,256,NP,k+1])."""
    G, NP, k = gA.shape
    mm_args, mm_specs = _mm2_args_specs(consts)
    args = mm_args + [gA, gB]
    specs = mm_specs + [
        pl.BlockSpec((1, NP, k), lambda g, j: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NP, k + 1), lambda g, j: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _fb_table2_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, FB_TABLE, NP, k), _U32),
            jax.ShapeDtypeStruct((G, FB_TABLE, NP, k + 1), _U32),
        ),
        grid=(G, FB_TABLE),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, 1, NP, k), lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP, k + 1), lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NP, k), _U32),
            pltpu.VMEM((NP, k + 1), _U32),
        ],
        interpret=interpret,
    )(*args)


@jax.jit
def fb_digit_planes2(tabA, tabB):
    """Table pair -> int8 gather planes [G, NP, 256, w] (lo, hi per side).

    int8 (7-bit digits) rather than bf16: the one-hot row selects in the
    gather kernel become s8s8s32 matmuls — 2x the MXU rate of bf16 on a
    v5e and i32 outputs that need no float->int casts (the same reasoning
    as the base-extension planes, module docstring item 7)."""
    def planes(t):
        t = t.transpose(0, 2, 1, 3)
        lo = (t & DIGIT_MASK).astype(_I32).astype(_I8)
        hi = (t >> DIGIT_BITS).astype(_I32).astype(_I8)
        return lo, hi

    tAlo, tAhi = planes(tabA)
    tBlo, tBhi = planes(tabB)
    return tAlo, tAhi, tBlo, tBhi


@functools.lru_cache(maxsize=None)
def _fb_modexp2_kernel_streams(streams, mont_out=False):
    def kernel(*refs):
        _fb_modexp2_body(streams, mont_out, *refs)

    return kernel


def _fb_modexp2_body(streams, mont_out, *refs):
    c = _mm2_cref(refs[:_MM2_NREFS])
    (tAlo_ref, tAhi_ref, tBlo_ref, tBhi_ref, win_ref, outA_ref, outB_ref,
     accA_ref, accB_ref, win_scr) = refs[_MM2_NREFS:]
    mm = _make_mont_mul2(c, streams=max(streams, 2))
    i = pl.program_id(2)
    NP = pl.num_programs(2)
    Bt = win_ref.shape[-2]
    k = tAlo_ref.shape[-1]
    h = Bt // streams
    rows = [slice(s * h, (s + 1) * h) for s in range(streams)]

    @pl.when(i == 0)
    def _():
        win_scr[...] = win_ref[0]

    w = win_scr[:, 0:1].astype(_I32)
    win_scr[...] = pltpu.roll(win_scr[...], shift=NP - 1, axis=1)
    iota = jax.lax.broadcasted_iota(_I32, (Bt, FB_TABLE), 1)
    onehot = jnp.where(w == iota, 1, 0).astype(_I8)
    selA = _mm8(onehot, tAlo_ref[0][0]).astype(_U32) + (
        _mm8(onehot, tAhi_ref[0][0]).astype(_U32) << DIGIT_BITS
    )
    selB = _mm8(onehot, tBlo_ref[0][0]).astype(_U32) + (
        _mm8(onehot, tBhi_ref[0][0]).astype(_U32) << DIGIT_BITS
    )

    @pl.when(i == 0)
    def _():
        accA_ref[...] = selA
        accB_ref[...] = selB

    @pl.when(i > 0)
    def _():
        outs = mm(
            [(accA_ref[r], accB_ref[r]) for r in rows],
            [(selA[r], selB[r]) for r in rows],
        )
        for s, r in enumerate(rows):
            accA_ref[r] = outs[s][0]
            accB_ref[r] = outs[s][1]

    @pl.when(i == NP - 1)
    def _():
        if mont_out:
            # stay in the Montgomery domain (value <= 3N): the caller's
            # obfuscation multiply IS the leave-Montgomery multiply, so
            # encrypt_post needs ONE rns_mont_mul instead of two.  Only
            # the B-side unscale (z -> r) remains.
            for s, r in enumerate(rows):
                outA_ref[0, r] = accA_ref[r]
                outB_ref[0, r] = _mulmod(
                    accB_ref[r], c["winv"], c["modsBx"], c["muBx"]
                )
        else:
            pA = jnp.ones((1, k), _U32)
            pB = c["poneB"]
            outs = mm([(accA_ref[r], accB_ref[r]) for r in rows],
                      [(pA, pB)] * streams)
            for s, r in enumerate(rows):
                outA_ref[0, r] = outs[s][0]
                outB_ref[0, r] = _mulmod(
                    outs[s][1], c["winv"], c["modsBx"], c["muBx"]
                )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "batch_tile", "streams", "mont_out"),
)
def pallas_fb_modexp2(tAlo, tAhi, tBlo, tBhi, wins, consts, *,
                      interpret=False, batch_tile=BATCH_TILE, streams=2,
                      mont_out=False):
    """base^e with a precomputed table; wins [G, B, NP] exponent bytes,
    LS byte first.  Returns [G, B, K] residues of a value <= 2N — or,
    with ``mont_out``, of base^e * M_A mod N (<= 3N, Montgomery form;
    the caller's next rns_mont_mul doubles as the leave-Montgomery
    multiply)."""
    G, NP, T, k = tAlo.shape
    B = wins.shape[1]
    assert T == FB_TABLE and wins.shape[-1] == NP
    assert B % batch_tile == 0 and batch_tile % streams == 0
    wins = wins.astype(_U32)

    mm_args, mm_specs = _mm2_args_specs(consts)

    def tspec(w):
        return pl.BlockSpec(
            (1, 1, FB_TABLE, w), lambda g, b, i: (g, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    args = mm_args + [tAlo, tAhi, tBlo, tBhi, wins]
    specs = mm_specs + [
        tspec(k), tspec(k), tspec(k + 1), tspec(k + 1),
        pl.BlockSpec((1, batch_tile, NP), lambda g, b, i: (g, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    outA, outB = pl.pallas_call(
        _fb_modexp2_kernel_streams(streams, mont_out),
        out_shape=(
            jax.ShapeDtypeStruct((G, B, k), _U32),
            jax.ShapeDtypeStruct((G, B, k + 1), _U32),
        ),
        grid=(G, B // batch_tile, NP),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, batch_tile, k), lambda g, b, i: (g, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, k + 1), lambda g, b, i: (g, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, k), _U32),
            pltpu.VMEM((batch_tile, k + 1), _U32),
            pltpu.VMEM((batch_tile, NP), _U32),
        ],
        interpret=interpret,
    )(*args)
    return jnp.concatenate([outA, outB], axis=-1)
