"""Fused Pallas kernel for RNS Montgomery modexp — MXU + VPU together.

The whole windowed exponentiation of ops/rns.py as one ``pallas_call``:
residue tensors [BATCH_TILE, K] live in VMEM; the two base extensions of
every Montgomery multiply are bf16 digit-plane matmuls on the MXU
([128, k] @ [k, k+1], batch rows = systolic rows); the per-residue Barrett
arithmetic rides the VPU.  This is the speed-of-light configuration for
batched modexp on TPU: the 128-lane CIOS kernel (ops/pallas_modexp.py) is
VPU-bound at ~15*L^2 lane-ops per multiply, while here ~98% of the
multiply work runs on the systolic array at ~50x the flops.

A leading group grid axis carries independent moduli (CRT decrypt: p^2 and
q^2 as groups 0/1), exactly like the CIOS kernel.

Layout note: unlike pallas_modexp.py (limbs on sublanes, batch on lanes),
matmuls need batch on the *sublane* axis, so everything here is
[batch_tile, K] — which also makes the elementwise stages natural
(per-residue constants broadcast as [1, K] rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import WINDOW_BITS
from .rns import (
    ALPHA_MARGIN,
    DIGIT_BITS,
    DIGIT_MASK,
    RNSContext,
    barrett_reduce,
    mulmod,
)

_U32 = jnp.uint32
_F32 = jnp.float32
_BF16 = jnp.bfloat16
BATCH_TILE = 128
_TABLE = 1 << WINDOW_BITS


def _digit_planes_np(T):
    """Host-side split of a uint32 matrix (<2^14) into two bf16 planes."""
    import numpy as np

    lo = (T & DIGIT_MASK).astype(np.float32)
    hi = (T >> DIGIT_BITS).astype(np.float32)
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def _to_bf16(x):
    """uint32 (< 2^15) -> bf16 exactly; Mosaic lacks uint->float casts."""
    return x.astype(jnp.int32).astype(_BF16)


def _to_u32(xf):
    """integral f32 -> uint32 via int32 (Mosaic lacks float->uint casts)."""
    return xf.astype(jnp.int32).astype(_U32)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=_F32
    )


def _matmul_mod_planes(x, Tlo, Thi, m, mu):
    """(x @ T) mod m with T pre-split into bf16 digit planes."""
    xlo = _to_bf16(x & DIGIT_MASK)
    xhi = _to_bf16(x >> DIGIT_BITS)
    s_ll = _to_u32(_mm(xlo, Tlo))
    mid = _to_u32(_mm(xlo, Thi) + _mm(xhi, Tlo))
    s_hh = _to_u32(_mm(xhi, Thi))
    t = barrett_reduce((s_hh << DIGIT_BITS) + mid, m, mu)
    return barrett_reduce((t << DIGIT_BITS) + s_ll, m, mu)


# Number of leading kernel refs holding the Montgomery-multiply constants
# (shared by the v1 windowed modexp kernel below; the current default
# kernels live in ops/pallas_rns2.py).
_MM_NREFS = 21


def _mm_cref(refs):
    """Unpack the _MM_NREFS constant refs into the tuple _make_mont_mul
    expects (dropping each ref's leading group axis)."""
    (scal_ref, mods_ref, mu_ref, modsA_ref, muA_ref, modsBx_ref, muBx_ref,
     modsB_ref, muB_ref, modsAr_ref, muAr_ref, sigmac_ref, inva_ref,
     T1lo_ref, T1hi_ref, NB_ref, MAinvB_ref, MBjinv_ref, T2lo_ref, T2hi_ref,
     MBmodA_ref) = refs
    scal = scal_ref[0]  # [1, 4]: m_r, mu_r, MBinv_mr, (pad)
    return (
        mods_ref[0], mu_ref[0], modsA_ref[0], muA_ref[0], modsBx_ref[0],
        muBx_ref[0], modsB_ref[0], muB_ref[0], modsAr_ref[0], muAr_ref[0],
        sigmac_ref[0], inva_ref[0], T1lo_ref[0], T1hi_ref[0],
        NB_ref[0], MAinvB_ref[0], MBjinv_ref[0], T2lo_ref[0], T2hi_ref[0],
        MBmodA_ref[0], scal[:, 0:1], scal[:, 1:2], scal[:, 2:3],
    )


def _row_spec(width):
    return pl.BlockSpec(
        (1, 1, width), lambda *i: (i[0], 0, 0), memory_space=pltpu.VMEM
    )


def _mat_spec(r, ccount):
    return pl.BlockSpec(
        (1, r, ccount), lambda *i: (i[0], 0, 0), memory_space=pltpu.VMEM
    )


def _mm_args_specs(consts):
    """Build the _MM_NREFS constant (args, in_specs) shared by RNS kernels.

    All index maps take arbitrary grid arity and select only the group axis,
    so the same plumbing serves grids (G, b), (G, b, i), and (G, j).
    """
    k = consts["neg_Ninv_A"].shape[-1]
    mods, mu = consts["mods"], consts["barrett"]
    G = mods.shape[0]
    scal = jnp.stack(
        [mods[:, -1], mu[:, -1], consts["MBinv_mr"], jnp.zeros((G,), _U32)],
        axis=-1,
    )[:, None, :]  # [G, 1, 4]
    rows = [
        mods, mu,  # full width K
        mods[:, :k], mu[:, :k],  # base A
        mods[:, k:], mu[:, k:],  # base B + m_r ("Bx")
        mods[:, k : 2 * k], mu[:, k : 2 * k],  # base B
        jnp.concatenate([mods[:, :k], mods[:, -1:]], -1),  # A + m_r ("Ar")
        jnp.concatenate([mu[:, :k], mu[:, -1:]], -1),
        consts["sigma_c_A"],
    ]
    rows2 = [consts["N_B"], consts["MAinv_B"], consts["MBj_inv_B"]]
    rows3 = [consts["MB_mod_A"]]
    args = (
        [scal]
        + [r[:, None, :] for r in rows]
        + [consts["inv_a_f32"][:, None, :]]
        + [consts["T1lo"], consts["T1hi"]]
        + [r[:, None, :] for r in rows2]
        + [consts["T2lo"], consts["T2hi"]]
        + [r[:, None, :] for r in rows3]
    )
    specs = (
        [_row_spec(4)]
        + [_row_spec(r.shape[-1]) for r in rows]
        + [_row_spec(k)]
        + [_mat_spec(k + 1, k + 1)] * 2
        + [_row_spec(r.shape[-1]) for r in rows2]
        + [_mat_spec(k, k + 1)] * 2
        + [_row_spec(r.shape[-1]) for r in rows3]
    )
    return args, specs


def _make_mont_mul(cref):
    """Build the in-kernel Montgomery multiply.

    All constant rows arrive PRE-SLICED from the host (offset-0 lane
    layouts): Mosaic cannot broadcast lane-offset rows, so no constant is
    ever sliced inside the kernel.  m_r scalars live in SMEM.
    """
    (mods_full, mu_full, modsA, muA, modsBx, muBx, modsB, muB, modsAr, muAr,
     sigma_c_A, inv_a, T1lo, T1hi, N_B, MAinv_B,
     MBj_inv_B, T2lo, T2hi, MB_mod_A, m_r, mu_r, MBinv_mr) = cref
    k = sigma_c_A.shape[-1]

    def mont_mul(x, y):
        s = mulmod(x, y, mods_full, mu_full)  # [Bt, K]
        s_A, s_Bx = s[:, :k], s[:, k:]
        # fused constant: sigma = s * (-N^{-1} (M_A/a_i)^{-1}) mod a_i
        sigma = mulmod(s_A, sigma_c_A, modsA, muA)

        frac = jnp.sum(
            sigma.astype(jnp.int32).astype(_F32) * inv_a, axis=-1, keepdims=True
        )
        alpha = _to_u32(jnp.maximum(jnp.floor(frac - ALPHA_MARGIN), 0.0))

        # alpha correction rides the matmul (last row of T1ext = -M_A mod b)
        x_ext = jnp.concatenate([sigma, alpha], axis=-1)  # [Bt, k+1]
        q_hat = _matmul_mod_planes(x_ext, T1lo, T1hi, modsBx, muBx)

        t = barrett_reduce(s_Bx + q_hat * N_B, modsBx, muBx)
        r_Bx = mulmod(t, MAinv_B, modsBx, muBx)
        r_B, r_mr = r_Bx[:, :k], r_Bx[:, k : k + 1]

        sigma2 = mulmod(r_B, MBj_inv_B, modsB, muB)
        # one matmul gives base-A columns [0:k] and the m_r column [k]
        ext_all = _matmul_mod_planes(sigma2, T2lo, T2hi, modsAr, muAr)
        ext_A, ext_r = ext_all[:, :k], ext_all[:, k : k + 1]
        diff = jnp.where(ext_r >= r_mr, ext_r - r_mr, ext_r + m_r - r_mr)
        alpha2 = mulmod(diff, MBinv_mr, m_r, mu_r)
        corr_A = mulmod(alpha2, MB_mod_A, modsA, muA)
        r_A = jnp.where(ext_A >= corr_A, ext_A - corr_A, ext_A + modsA - corr_A)
        return jnp.concatenate([r_A, r_Bx], axis=-1)

    return mont_mul


def _limbs_to_res(xl, Cinlo, Cinhi, mods, mu):
    """In-kernel limbs [Bt, L] -> residues [Bt, K] via two matmul planes.

    Limbs are < 2^15 -> three lhs digit planes; Cin entries < 2^14 -> two rhs
    planes; all f32 accumulations < 2^23, exact.
    """
    acc = None
    for shift in (0, DIGIT_BITS, 2 * DIGIT_BITS):
        d = _to_bf16((xl >> shift) & DIGIT_MASK)
        lo = _to_u32(_mm(d, Cinlo))
        hi = _to_u32(_mm(d, Cinhi))
        v = barrett_reduce((hi << DIGIT_BITS) + lo, mods, mu)  # < m
        term = v << shift  # <= 2^28
        acc = term if acc is None else barrett_reduce(acc + term, mods, mu)
    return acc


def _rns_modexp_kernel(*refs):
    mm_refs = refs[:_MM_NREFS]
    (Cinlo_ref, Cinhi_ref, montsq_ref, montone_ref, base_ref, win_ref,
     out_ref, table_ref) = refs[_MM_NREFS:]
    mods_ref, mu_ref = mm_refs[1], mm_refs[2]

    K = montone_ref.shape[-1]
    Bt = base_ref.shape[-2]
    NW = win_ref.shape[-1]

    mont_mul = _make_mont_mul(_mm_cref(mm_refs))

    # in-kernel limbs -> residues conversion (two matmul planes)
    x = _limbs_to_res(
        base_ref[0], Cinlo_ref[0], Cinhi_ref[0], mods_ref[0], mu_ref[0]
    )  # [Bt, K]
    a = mont_mul(x, montsq_ref[0])  # to Montgomery form
    one = jnp.broadcast_to(montone_ref[0], (Bt, K)).astype(_U32)

    # Keep the number of *inlined* mont_mul instances small (compile time
    # scales with program size): one copy per loop below.
    table_ref[0] = one
    table_ref[1] = a

    def table_step(t, prev):
        nxt = mont_mul(prev, a)
        table_ref[pl.ds(t, 1)] = nxt[None]
        return nxt

    jax.lax.fori_loop(2, _TABLE, table_step, a)

    def body(i, carry):
        acc, wins = carry
        acc = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, v: mont_mul(v, v), acc
        )
        w = wins[:, 0:1]  # current window (static read; wins rolls left)
        sel = jnp.zeros((Bt, K), _U32)
        for t in range(_TABLE):
            sel = jnp.where(w == t, table_ref[t], sel)
        wins = pltpu.roll(wins, shift=NW - 1, axis=1)
        return mont_mul(acc, sel), wins

    acc, _ = jax.lax.fori_loop(0, NW, body, (one, win_ref[0]))

    # leave the Montgomery domain (multiply by plain 1): value <= 2N
    plain_one = jnp.ones((1, K), _U32)
    out_ref[0] = mont_mul(acc, plain_one)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def pallas_rns_modexp(base_limbs, windows, consts, *, interpret=False,
                      batch_tile=BATCH_TILE):
    """base^e mod N over a [G, B, L] batch of canonical 15-bit limbs.

    The limbs->RNS conversion happens inside the kernel (two extra matmul
    planes), so callers never materialize residues for inputs.
    windows:  [G, B, NW] uint32 4-bit windows, MS first.
    consts:   dict of per-group stacked constant arrays (see
              ``stack_group_consts``).
    Returns [G, B, K] residues of a representative <= 2N of the result.
    """
    G, B, L = base_limbs.shape
    K = consts["mods"].shape[-1]
    NW = windows.shape[-1]
    windows = windows.astype(_U32)  # uint8 on the wire, u32 in VMEM
    Bt = batch_tile
    assert B % Bt == 0

    rows4 = [consts["mont_sq"], consts["mont_one"]]
    data = pl.BlockSpec(
        (1, Bt, K), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )
    win_spec = pl.BlockSpec(
        (1, Bt, NW), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )

    mm_args, mm_specs = _mm_args_specs(consts)
    args = (
        mm_args
        + [consts["Cinlo"], consts["Cinhi"]]
        + [r[:, None, :] for r in rows4]
        + [base_limbs, windows]
    )
    Lc = consts["Cinlo"].shape[-2]
    assert Lc == L, f"Cin limb rows {Lc} != base limbs {L}"
    data_l = pl.BlockSpec(
        (1, Bt, L), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        mm_specs
        + [_mat_spec(L, K)] * 2
        + [_row_spec(r.shape[-1]) for r in rows4]
        + [data_l, win_spec]
    )
    out = pl.pallas_call(
        _rns_modexp_kernel,
        out_shape=jax.ShapeDtypeStruct((G, B, K), _U32),
        grid=(G, B // Bt),
        in_specs=in_specs,
        out_specs=data,
        scratch_shapes=[pltpu.VMEM((_TABLE, Bt, K), _U32)],
        interpret=interpret,
    )(*args)
    return out


def stack_group_consts(ctxs) -> dict:
    """Stack per-modulus RNSContext constants into [G, ...] jnp arrays for
    the grouped kernel.  All contexts must share k (same modulus size)."""
    import numpy as np

    k = ctxs[0].k
    assert all(c.k == k for c in ctxs)

    def stk(get):
        return jnp.asarray(np.stack([get(c) for c in ctxs]))

    T1lo, T1hi = zip(*(_digit_planes_np(c.T1ext) for c in ctxs))
    # T2 extended with the m_r column (T2r) so one matmul serves both
    T2x = [np.concatenate([c.T2, c.T2r[:, None]], axis=1) for c in ctxs]
    T2lo, T2hi = zip(*(_digit_planes_np(t) for t in T2x))
    import numpy as _np

    return dict(
        mods=stk(lambda c: c.mods),
        barrett=stk(lambda c: c.barrett),
        neg_Ninv_A=stk(lambda c: c.neg_Ninv_A),
        MAi_inv_A=stk(lambda c: c.MAi_inv_A),
        sigma_c_A=stk(lambda c: c.sigma_c_A),
        inv_a_f32=stk(lambda c: c.inv_a_f32),
        T1lo=jnp.asarray(_np.stack(T1lo)),
        T1hi=jnp.asarray(_np.stack(T1hi)),

        N_B=stk(lambda c: c.N_B),
        MAinv_B=stk(lambda c: c.MAinv_B),
        MBj_inv_B=stk(lambda c: c.MBj_inv_B),
        T2lo=jnp.asarray(_np.stack(T2lo)),
        T2hi=jnp.asarray(_np.stack(T2hi)),
        MB_mod_A=stk(lambda c: c.MB_mod_A),
        MBinv_mr=stk(lambda c: _np.uint32(c.MBinv_mr)),
        Cinlo=jnp.asarray(
            _np.stack([_digit_planes_np(c.Cin)[0] for c in ctxs])
        ),
        Cinhi=jnp.asarray(
            _np.stack([_digit_planes_np(c.Cin)[1] for c in ctxs])
        ),
        mont_sq=stk(lambda c: c.mont_sq),
        mont_one=stk(lambda c: c.mont_one),
    )
