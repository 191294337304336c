"""Batched fixed-limb big-integer helper ops (non-modexp paths).

These cover every big-number operation the Paillier scheme layer needs
outside the Montgomery exponentiation core:

* ``mul_shared``    — full product of a shared multiplicand with a batch
                      (reference analog: BigNumber operator* used in
                      raw_encrypt ``n*m+1``, ipcl/pub_key.cpp:99-110, and the
                      CRT recombine ``u*p``, ipcl/pri_key.cpp:148-152).
* ``mul_low``       — low half of the product; with a precomputed Hensel
                      inverse this implements the *exact* division
                      ``L(x) = (x-1)/p`` of the Paillier L-function
                      (reference analog: BigNumber operator/ at
                      ipcl/pri_key.cpp:154-157) without any division at all.
* ``mod_fold``      — ``x mod m`` for a double-width x via one Montgomery
                      multiply of the high half (x_hi * R mod m == x_hi
                      shifted), replacing the reference's per-element
                      ``ciphertext[i] % psq`` loop (ipcl/pri_key.cpp:122-130).
* add / sub helpers with scan-based carry/borrow chains (used once per
  scheme op, never inside hot loops).

All arrays are uint32 limb tensors as defined in ops/limbs.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .limbs import LIMB_BITS, LIMB_MASK
from .montgomery import canonicalize, carry_round, cond_sub_n, mont_mul

_U32 = jnp.uint32


def mul_shared(a: jax.Array, x: jax.Array) -> jax.Array:
    """Full product of shared ``a`` [La] with batched ``x`` [..., Lx].

    Returns canonical limbs [..., La+Lx].  Inputs must have digits <= 2**15.
    Partial products accumulate redundantly (lo/hi split) with no carries in
    the loop; a single canonicalization pass runs at the end.
    """
    La = a.shape[-1]
    Lx = x.shape[-1]
    batch_shape = x.shape[:-1]
    acc = jnp.zeros(batch_shape + (La + Lx,), _U32)
    zero_col = jnp.zeros(batch_shape + (1,), _U32)

    def body(i, acc):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # [1]
        p = ai * x  # [..., Lx]
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        seg = jnp.concatenate([lo, zero_col], axis=-1)
        seg = seg.at[..., 1:].add(hi)  # [..., Lx+1]
        cur = jax.lax.dynamic_slice_in_dim(acc, i, Lx + 1, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(acc, cur + seg, i, axis=-1)

    acc = jax.lax.fori_loop(0, La, body, acc)
    return canonicalize(acc)


def mul_low(a: jax.Array, x: jax.Array, out_limbs: int) -> jax.Array:
    """Low ``out_limbs`` limbs of a*x, i.e. a*x mod 2**(15*out_limbs).

    ``a`` is shared [La]; ``x`` is batched [..., Lx].  Only used for exact
    Hensel division where the true quotient fits ``out_limbs`` limbs.
    """
    full = mul_shared(a, x[..., :out_limbs])
    return full[..., :out_limbs]


def add_scalar(x: jax.Array, c: int) -> jax.Array:
    """x + c for a small constant c (adds into limb 0, then canonicalizes)."""
    return canonicalize(x.at[..., 0].add(_U32(c)))


def sub_borrow(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(x - y) mod 2**(15L) with the final borrow flag; canonical inputs."""
    y_b = jnp.broadcast_to(y, x.shape)
    xs = jnp.moveaxis(x, -1, 0)
    ys = jnp.moveaxis(y_b, -1, 0)
    borrow0 = jnp.zeros(x.shape[:-1], _U32)

    def step(borrow, xy):
        xj, yj = xy
        sub = yj + borrow
        new_borrow = (xj < sub).astype(_U32)
        return new_borrow, (xj - sub) & LIMB_MASK

    final_borrow, diffs = jax.lax.scan(step, borrow0, (xs, ys))
    return jnp.moveaxis(diffs, 0, -1), final_borrow


def add_carry(x: jax.Array, y: jax.Array) -> jax.Array:
    """x + y, canonical output (carry out of the top limb must be zero)."""
    return canonicalize(x + jnp.broadcast_to(y, x.shape))


def sub_mod(x: jax.Array, y: jax.Array, m: jax.Array) -> jax.Array:
    """(x - y) mod m for canonical x, y < m (shared modulus limbs m)."""
    diff, borrow = sub_borrow(x, y)
    plus_m = canonicalize(diff + m)  # (x - y + m) mod 2^(15L); safe: < 2^(15L)
    return jnp.where((borrow == 1)[..., None], plus_m, diff)


def sub_scalar(x: jax.Array, c: int) -> jax.Array:
    """x - c for small constant 0 <= c < 2**15; x must be >= c."""
    c_l = jnp.zeros((x.shape[-1],), _U32).at[0].set(c)
    diff, _ = sub_borrow(x, c_l)
    return diff


def mod_fold(
    x: jax.Array,
    n: jax.Array,
    n0inv: jax.Array,
    r2: jax.Array,
) -> jax.Array:
    """Reduce double-width ``x`` [..., 2L] to ``x mod m`` represented in
    [..., L] limbs with value < R (not fully reduced — safe as a
    ``mont_exp`` base, whose first to-Montgomery multiply tolerates any
    value < R).

    Uses x = x_hi * 2**(15L) + x_lo and x_hi * 2**(15L) mod m ==
    montmul(x_hi, R^2 mod m), so the whole reduction is one Montgomery
    multiply plus an add — no Barrett constant, no division.
    """
    L = n.shape[-1]
    folded = mont_mul(x[..., L:], r2, n, n0inv)  # x_hi * R mod m
    return mod_fold_combine(folded, x[..., :L], n)


def mod_fold_combine(folded, x_lo, n):
    """Tail of :func:`mod_fold` given folded = x_hi * R mod m (< 2m, digits
    <= 2**15) and the canonical low half x_lo.  Split out so the Montgomery
    product can run on the Pallas backend (ops/paillier_ops.py)."""
    L = n.shape[-1]
    ext = jnp.concatenate(
        [folded + x_lo, jnp.zeros(folded.shape[:-1] + (1,), _U32)], axis=-1
    )
    ext = canonicalize(ext)  # value < R + 2m, fits L+1 limbs
    n_ext = jnp.concatenate([n, jnp.zeros((1,), _U32)], axis=-1)
    ext = cond_sub_n(ext, n_ext)
    ext = cond_sub_n(ext, n_ext)  # now < R, top limb zero
    return ext[..., :L]
