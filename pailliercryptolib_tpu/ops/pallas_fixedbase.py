"""Fixed-base RNS modexp: per-key precomputed power tables on the MXU.

DJN encryption raises ONE shared base (hs, ipcl/pub_key.cpp:51-64) to a
batch of random exponents.  The variable-base kernel (ops/pallas_rns.py)
pays ~1300 Montgomery multiplies per 1024-bit exponent (squarings dominate:
4 per 4-bit window).  With the base fixed we precompute, once per key,

    table[i][j] = Mont(hs^(j * 2^(8 i)))      i < NP = ceil(ebits/8), j < 256

and each batched exponentiation becomes a product of NP table entries —
NO squarings at all:

    hs^r = prod_i table[i][ r_byte_i ]        (NP-1 multiplies + 1 exit)

~7x fewer Montgomery multiplies for 1024-bit exponents.  The per-window
table entry is selected by a one-hot [Bt, 256] @ [256, K] matmul over the
table's bf16 digit planes — an exact integer product that rides the MXU
and doubles as the constant-time gather (no data-dependent addressing,
mirroring the select-based table reads of the variable-base kernels).

The table (NP * 256 * K residues, ~80 MB at 2048-bit keys) lives in HBM
and is streamed one window-position block per grid step; Pallas
double-buffers the stream against the Montgomery-multiply compute.

Reference anchor: this specializes ipcl::PublicKey::applyObfuscator's
hs^r modexp (ipcl/pub_key.cpp:51-64); the reference has no fixed-base
optimization — mbx_exp_mb8 is generic — so this is TPU-side headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rns import (
    BATCH_TILE,
    _MM_NREFS,
    _make_mont_mul,
    _mm,
    _mm_args_specs,
    _mm_cref,
    _row_spec,
    _to_u32,
)
from .rns import DIGIT_BITS, DIGIT_MASK

_U32 = jnp.uint32
_BF16 = jnp.bfloat16

FB_WINDOW_BITS = 8
FB_TABLE = 1 << FB_WINDOW_BITS  # 256 entries per window position


def fb_num_windows(ebits: int) -> int:
    """Window positions (= exponent bytes) for ``ebits``-bit exponents,
    rounded to a multiple of 8 to bound jit specializations."""
    nbytes = -(-ebits // 8)
    return max(8, -(-nbytes // 8) * 8)


# ---------------------------------------------------------------------------
# table build (device, once per key)
# ---------------------------------------------------------------------------


def _fb_table_kernel(*refs):
    """Grid (G, 256); step j writes acc = g^j (Montgomery form) for all NP
    window positions at once, then advances acc *= g."""
    mm_refs = refs[:_MM_NREFS]
    montone_ref, g_ref, out_ref, acc_ref = refs[_MM_NREFS:]
    mont_mul = _make_mont_mul(_mm_cref(mm_refs))
    j = pl.program_id(1)
    NP, K = g_ref.shape[-2], g_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.broadcast_to(montone_ref[0], (NP, K)).astype(_U32)

    out_ref[0, 0] = acc_ref[...]

    @pl.when(j < FB_TABLE - 1)
    def _():
        acc_ref[...] = mont_mul(acc_ref[...], g_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fb_table(g_mont, consts, *, interpret=False):
    """Build the fixed-base table from g_mont [G, NP, K]: Montgomery-form
    residues of g_i = base^(2^(8 i)).  Returns [G, 256, NP, K] uint32 with
    entry [g, j, i] = Mont(base^(j * 2^(8 i))), values < 3N."""
    G, NP, K = g_mont.shape
    mm_args, mm_specs = _mm_args_specs(consts)
    args = mm_args + [consts["mont_one"][:, None, :], g_mont]
    specs = mm_specs + [
        _row_spec(K),
        pl.BlockSpec(
            (1, NP, K), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    return pl.pallas_call(
        _fb_table_kernel,
        out_shape=jax.ShapeDtypeStruct((G, FB_TABLE, NP, K), _U32),
        grid=(G, FB_TABLE),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, 1, NP, K), lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((NP, K), _U32)],
        interpret=interpret,
    )(*args)


@jax.jit
def fb_digit_planes(table):
    """[G, 256, NP, K] uint32 table -> two bf16 planes [G, NP, 256, K]
    (7-bit digits; residues < 2^14 are exact in two planes)."""
    t = table.transpose(0, 2, 1, 3)
    lo = (t & DIGIT_MASK).astype(jnp.int32).astype(_BF16)
    hi = (t >> DIGIT_BITS).astype(jnp.int32).astype(_BF16)
    return lo, hi


# ---------------------------------------------------------------------------
# fixed-base exponentiation
# ---------------------------------------------------------------------------


def _fb_modexp_kernel(*refs):
    """Grid (G, B/Bt, NP), window axis innermost; acc scratch carries the
    running product across window steps for one batch tile.  The window
    bytes roll through a scratch buffer (Mosaic forbids lane-dim blocks of
    width 1 and dynamic lane slices), so step i always reads column 0."""
    mm_refs = refs[:_MM_NREFS]
    tablo_ref, tabhi_ref, win_ref, out_ref, acc_ref, win_scr = refs[_MM_NREFS:]
    mont_mul = _make_mont_mul(_mm_cref(mm_refs))
    i = pl.program_id(2)
    NP = pl.num_programs(2)
    Bt = win_ref.shape[-2]
    K = tablo_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        win_scr[...] = win_ref[0]

    # constant-time table gather as an exact one-hot matmul on the MXU
    w = win_scr[:, 0:1].astype(jnp.int32)  # [Bt, 1]
    win_scr[...] = pltpu.roll(win_scr[...], shift=NP - 1, axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, FB_TABLE), 1)
    onehot = jnp.where(w == iota, 1.0, 0.0).astype(_BF16)
    lo = _to_u32(_mm(onehot, tablo_ref[0][0]))
    hi = _to_u32(_mm(onehot, tabhi_ref[0][0]))
    sel = lo + (hi << DIGIT_BITS)  # [Bt, K] residues < 2^14

    @pl.when(i == 0)
    def _():
        acc_ref[...] = sel

    @pl.when(i > 0)
    def _():
        acc_ref[...] = mont_mul(acc_ref[...], sel)

    @pl.when(i == NP - 1)
    def _():
        # leave the Montgomery domain (multiply by plain 1): value <= 2N
        plain_one = jnp.ones((1, K), _U32)
        out_ref[0] = mont_mul(acc_ref[...], plain_one)


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def pallas_fb_modexp(tablo, tabhi, wins, consts, *, interpret=False,
                     batch_tile=BATCH_TILE):
    """base^e mod N with a precomputed base table.

    tablo/tabhi: [G, NP, 256, K] bf16 digit planes from fb_digit_planes.
    wins:        [G, B, NP] exponent bytes, LEAST-significant byte first
                 (window i has weight 2^(8 i), matching the table).
    Returns [G, B, K] residues of a representative <= 2N of base^e mod N.
    """
    G, NP, T, K = tablo.shape
    B = wins.shape[1]
    assert T == FB_TABLE and wins.shape[-1] == NP
    assert B % batch_tile == 0
    wins = wins.astype(_U32)

    mm_args, mm_specs = _mm_args_specs(consts)
    table_spec = pl.BlockSpec(
        (1, 1, FB_TABLE, K), lambda g, b, i: (g, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    args = mm_args + [tablo, tabhi, wins]
    specs = mm_specs + [
        table_spec,
        table_spec,
        pl.BlockSpec(
            (1, batch_tile, NP), lambda g, b, i: (g, b, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    return pl.pallas_call(
        _fb_modexp_kernel,
        out_shape=jax.ShapeDtypeStruct((G, B, K), _U32),
        grid=(G, B // batch_tile, NP),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, batch_tile, K), lambda g, b, i: (g, b, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, K), _U32),
            pltpu.VMEM((batch_tile, NP), _U32),
        ],
        interpret=interpret,
    )(*args)
