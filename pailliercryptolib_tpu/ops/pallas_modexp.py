"""Fused Pallas TPU kernel for batched fixed-window Montgomery modexp.

This is the performance backend replacing the reference's ``mbx_exp_mb8``
(AVX512-IFMA 8-lane multi-buffer modexp, ipcl/mod_exp.cpp:446-533): one
``pallas_call`` runs the *entire* exponentiation — to-Montgomery conversion,
16-entry power table build, left-to-right 4-bit-window loop, and the final
carry-resolution + conditional subtraction — with the whole working set
resident in VMEM.  The XLA fallback (ops/montgomery.py) executes the same
algorithm as ~1300 separate fused elementwise kernels with HBM round trips
between them; fusing removes that traffic entirely, which is the whole win
(HBM bandwidth is the bottleneck, not flops).

Layout: limbs on the sublane axis, ciphertext batch on the 128-wide lane
axis (the VPU analog of the reference's 8 IFMA lanes).  A leading *group*
grid axis carries independent modulus systems — CRT decryption runs its
p^2 and q^2 halves as group 0 / group 1 of one launch (SURVEY.md §2.4.5).

All indexing is static: sequential access patterns use ``pltpu.roll`` on
values instead of dynamic sublane slices, and the per-lane window table
lookup is a 16-way unrolled select (constant-time in the exponent, like the
XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, WINDOW_BITS

_U32 = jnp.uint32
BATCH_TILE = 128
_TABLE = 1 << WINDOW_BITS  # 16


def _roll_down(x):
    """Roll rows down by one (row j+1 -> row j); pltpu.roll needs shift >= 0."""
    return pltpu.roll(x, shift=x.shape[0] - 1, axis=0)


def _carry_round(x):
    """One redundant carry round on limb-major digits [L(+1), Bt]."""
    lo = x & LIMB_MASK
    hi = x >> LIMB_BITS
    hi = pltpu.roll(hi, shift=1, axis=0)  # carry into the next-higher limb
    hi = jnp.concatenate([jnp.zeros_like(hi[0:1]), hi[1:]], axis=0)
    return lo + hi


def _mont_mul(a, b, n_col, n0inv):
    """Montgomery product a*b*R^-1 mod n on limb-major values.

    a: [L, Bt] (rolled through the loop), b: [L, Bt] or [L, 1] broadcastable,
    n_col: [L, 1], n0inv: scalar.  Digits in <= 2**15, out <= 2**15, value
    < 2n.  Same redundant-digit CIOS as ops/montgomery.py:mont_mul.
    """
    L, Bt = a.shape
    acc = jnp.zeros((L + 1, Bt), _U32)
    b0 = b[0:1, :]
    zero_row = jnp.zeros((1, Bt), _U32)

    def body(_, carry):
        a_rot, acc = carry
        ai = a_rot[0:1, :]  # current limb of a, [1, Bt]
        t0 = acc[0:1, :] + ai * b0
        mi = (t0 * n0inv) & LIMB_MASK
        p1 = ai * b  # [L, Bt]
        p2 = mi * n_col  # [L, Bt]
        lo = (p1 & LIMB_MASK) + (p2 & LIMB_MASK)
        hi = (p1 >> LIMB_BITS) + (p2 >> LIMB_BITS)
        upd = (
            acc
            + jnp.concatenate([lo, zero_row], axis=0)
            + jnp.concatenate([zero_row, hi], axis=0)
        )
        carry0 = upd[0:1, :] >> LIMB_BITS
        # shift down one digit (digit 0 is resolved), carry into new digit 0
        acc = jnp.concatenate([upd[1:2] + carry0, upd[2:], zero_row], axis=0)
        return _roll_down(a_rot), acc

    _, acc = jax.lax.fori_loop(0, L, body, (a, acc))
    acc = _carry_round(_carry_round(acc))
    return acc[:L]


def _select_pow(table_ref, w_row, L, Bt):
    """Constant-time 16-way table select; w_row [1, Bt] window values."""
    sel = jnp.zeros((L, Bt), _U32)
    for t in range(_TABLE):
        sel = jnp.where(w_row == t, table_ref[t], sel)
    return sel


def _canonicalize(x):
    """Full carry propagation via the roll trick (L static steps)."""
    L = x.shape[0]

    def step(_, carry):
        res, c = carry
        t = res[0:1] + c
        res = jnp.concatenate([t & LIMB_MASK, res[1:]], axis=0)
        c = t >> LIMB_BITS
        return _roll_down(res), c

    res, _ = jax.lax.fori_loop(0, L, step, (x, jnp.zeros_like(x[0:1])))
    return res  # rolled L times == original orientation


def _cond_sub(x, n_col):
    """x - n if x >= n else x; canonical limb-major inputs."""
    L = x.shape[0]
    n_b = jnp.broadcast_to(n_col, x.shape)

    def step(_, carry):
        xr, nr, dr, borrow = carry
        sub = nr[0:1] + borrow
        nb = (xr[0:1] < sub).astype(_U32)
        dr = jnp.concatenate([(xr[0:1] - sub) & LIMB_MASK, dr[1:]], axis=0)
        return (_roll_down(xr), _roll_down(nr), _roll_down(dr), nb)

    xr, _, diff, borrow = jax.lax.fori_loop(
        0, L, step, (x, n_b, jnp.zeros_like(x), jnp.zeros_like(x[0:1]))
    )
    return jnp.where(borrow == 1, xr, diff)


def _modexp_kernel(
    n_ref, n0_ref, r2_ref, one_ref, base_ref, win_ref, out_ref, table_ref
):
    L = base_ref.shape[1]
    Bt = base_ref.shape[2]
    NW = win_ref.shape[1]

    n_col = n_ref[0]  # [L, 1]
    r2_col = r2_ref[0]  # [L, 1]
    one_col = one_ref[0]  # [L, 1]
    n0 = n0_ref[pl.program_id(0), 0]  # whole [G, 1] array lives in SMEM
    base = base_ref[0]  # [L, Bt]
    wins = win_ref[0]  # [NW, Bt]

    # to Montgomery form + power table (a^0 .. a^15)
    a_m = _mont_mul(base, r2_col, n_col, n0)
    one_b = jnp.broadcast_to(one_col, (L, Bt)).astype(_U32)
    table_ref[0] = one_b
    table_ref[1] = a_m
    prev = a_m
    for t in range(2, _TABLE):
        prev = _mont_mul(prev, a_m, n_col, n0)
        table_ref[t] = prev

    # left-to-right fixed-window loop (MS window first)
    def obody(_, carry):
        acc, wins = carry
        for _sq in range(WINDOW_BITS):
            acc = _mont_mul(acc, acc, n_col, n0)
        sel = _select_pow(table_ref, wins[0:1, :], L, Bt)
        acc = _mont_mul(acc, sel, n_col, n0)
        return acc, _roll_down(wins)

    acc, _ = jax.lax.fori_loop(0, NW, obody, (one_b, wins))

    # leave Montgomery form, canonicalize, final conditional subtract
    row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    plain_one = jnp.where(row == 0, 1, 0).astype(_U32)
    res = _mont_mul(acc, plain_one, n_col, n0)
    res = _canonicalize(res)
    out_ref[0] = _cond_sub(res, n_col)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_modexp(base, windows, n, n0inv, r2, one, *, interpret=False):
    """base^e mod n over a [G, B, L] batch; e as [G, B, NW] 4-bit windows.

    G independent modulus systems (n, n0inv, r2, one: [G, L] / [G]); B must
    be a multiple of BATCH_TILE.  Returns canonical fully-reduced [G, B, L].
    """
    G, B, L = base.shape
    NW = windows.shape[-1]
    assert B % BATCH_TILE == 0, f"batch {B} not a multiple of {BATCH_TILE}"

    base_t = base.transpose(0, 2, 1)  # [G, L, B]
    win_t = windows.astype(_U32).transpose(0, 2, 1)  # [G, NW, B]
    n_c = n[:, :, None]  # [G, L, 1]
    r2_c = r2[:, :, None]
    one_c = one[:, :, None]
    n0_c = n0inv.reshape(G, 1).astype(_U32)

    grid = (G, B // BATCH_TILE)
    col_spec = pl.BlockSpec(
        (1, L, 1), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _modexp_kernel,
        out_shape=jax.ShapeDtypeStruct((G, L, B), _U32),
        grid=grid,
        in_specs=[
            col_spec,  # n
            _smem_spec(G),  # n0inv, whole array (SMEM blocks can't be (1,1))
            col_spec,  # r2
            col_spec,  # one
            pl.BlockSpec(
                (1, L, BATCH_TILE), lambda g, b: (g, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, NW, BATCH_TILE), lambda g, b: (g, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, L, BATCH_TILE), lambda g, b: (g, 0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((_TABLE, L, BATCH_TILE), _U32)],
        interpret=interpret,
    )(n_c, n0_c, r2_c, one_c, base_t, win_t)
    return out.transpose(0, 2, 1)  # [G, B, L]


def _smem_spec(G):
    return pl.BlockSpec((G, 1), lambda g, b: (0, 0), memory_space=pltpu.SMEM)


# ---------------------------------------------------------------------------
# Fused modular-multiply kernels
#
# These exist because the hot pipelines must not contain the *XLA* mont_mul:
# its L-iteration fori_loop of dynamic-update-slices takes minutes to compile
# on the TPU toolchain (and round-trips HBM per iteration at runtime), while
# the fused kernels compile in seconds and stay in VMEM.
# ---------------------------------------------------------------------------


def _mont_raw_kernel(n_ref, n0_ref, a_ref, b_ref, out_ref):
    """out = a*b*R^{-1} mod n, digits <= 2**15, value < 2n (not canonical)."""
    n_col = n_ref[0]
    n0 = n0_ref[pl.program_id(0), 0]
    out_ref[0] = _mont_mul(a_ref[0], b_ref[0], n_col, n0)


def _mod_mul_kernel(n_ref, n0_ref, r2_ref, a_ref, b_ref, out_ref):
    """out = a*b mod n, canonical fully reduced.

    montmul(montmul(a, R^2), b) = a*b; then carry-resolve + cond-subtract.
    """
    n_col = n_ref[0]
    r2_col = r2_ref[0]
    n0 = n0_ref[pl.program_id(0), 0]
    a_m = _mont_mul(a_ref[0], r2_col, n_col, n0)
    res = _mont_mul(a_m, b_ref[0], n_col, n0)
    out_ref[0] = _cond_sub(_canonicalize(res), n_col)


def _binary_pallas(kernel, with_r2, a, b, n, n0inv, r2, interpret):
    G, B, L = a.shape
    assert B % BATCH_TILE == 0, f"batch {B} not a multiple of {BATCH_TILE}"
    a_t = a.transpose(0, 2, 1)
    b_t = jnp.broadcast_to(b, a.shape).transpose(0, 2, 1)
    n_c = n[:, :, None]
    n0_c = n0inv.reshape(G, 1).astype(_U32)
    grid = (G, B // BATCH_TILE)
    col_spec = pl.BlockSpec(
        (1, L, 1), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (1, L, BATCH_TILE), lambda g, b: (g, 0, b), memory_space=pltpu.VMEM
    )
    in_specs = [col_spec, _smem_spec(G)]
    args = [n_c, n0_c]
    if with_r2:
        in_specs.append(col_spec)
        args.append(r2[:, :, None])
    in_specs += [mat_spec, mat_spec]
    args += [a_t, b_t]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, L, B), _U32),
        grid=grid,
        in_specs=in_specs,
        out_specs=mat_spec,
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mont_raw(a, b, n, n0inv, *, interpret=False):
    """Grouped Montgomery product a*b*R^{-1} mod n, redundant digits.
    a: [G, B, L]; b: [G, B, L] or broadcastable; n: [G, L]; n0inv: [G]."""
    return _binary_pallas(_mont_raw_kernel, False, a, b, n, n0inv, None, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mod_mul(a, b, n, n0inv, r2, *, interpret=False):
    """Grouped plain modular product a*b mod n, canonical reduced output."""
    return _binary_pallas(_mod_mul_kernel, True, a, b, n, n0inv, r2, interpret)
