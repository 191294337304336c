"""Backend dispatch for the batched modexp primitive.

The analog of the reference's single dispatch seam ``ipcl::modExp``
(ipcl/mod_exp.cpp:680-737), which routes between the QAT offload runtime and
the AVX512 multi-buffer CPU path with a tunable hybrid ratio.  Here the
backends are:

* ``"pallas"``            — the fused VMEM-resident TPU kernel (default on TPU)
* ``"pallas_interpret"``  — same kernel via the Pallas interpreter (CPU tests)
* ``"xla"``               — the pure-XLA reference implementation

plus the IPCL-compatible hybrid-mode knobs (``set_hybrid_mode`` /
``set_hybrid_ratio`` / ``set_hybrid_off``, mod_exp.hpp:16-48): a fractional
split of the batch between two backends, preserved as an API/policy seam
even though a single TPU backend is typically optimal.
"""

from __future__ import annotations

import enum
import os
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from .limbs import LIMB_BITS
from .montgomery import mont_exp, mont_mod_mul, mont_mul
from .pallas_modexp import (
    BATCH_TILE,
    pallas_mod_mul,
    pallas_modexp,
    pallas_mont_raw,
)


class HybridMode(enum.IntEnum):
    """Mirrors ipcl::HybridMode (mod_exp.hpp:16-30); values are the percent
    of work routed to the *primary* backend."""

    OPTIMAL = 100
    FULL = 100  # all primary (QAT-analog: the TPU kernel)
    HALF = 50
    IPP = 0  # all secondary (CPU-analog: the XLA path)


class _HybridParams(threading.local):
    def __init__(self):
        self.mode: HybridMode = HybridMode.OPTIMAL
        self.ratio: float = 1.0


_params = _HybridParams()


def set_hybrid_mode(mode: HybridMode) -> None:
    _params.mode = mode
    _params.ratio = int(mode) / 100.0


def set_hybrid_ratio(ratio: float) -> None:
    if not 0.0 <= ratio <= 1.0:
        raise ValueError("hybrid ratio must be in [0, 1]")
    _params.mode = HybridMode.OPTIMAL
    _params.ratio = ratio


def set_hybrid_off() -> None:
    _params.mode = HybridMode.FULL
    _params.ratio = 1.0


def get_hybrid_ratio() -> float:
    return _params.ratio


def is_hybrid_optimal() -> bool:
    return _params.mode == HybridMode.OPTIMAL


def default_backend() -> str:
    """Pick the modexp backend for this process."""
    forced = os.environ.get("PAILLIER_TPU_BACKEND")
    if forced:
        return forced
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return "xla"
    if "TPU" in getattr(dev, "device_kind", "") or dev.platform in ("tpu",):
        return "rns"  # MXU path; "pallas" = CIOS/VPU kernel, "xla" = fallback
    return "xla"


def modexp_backend(base, windows, n, n0inv, r2, one, backend: str):
    """Route one [..., B, L]-shaped modexp to the chosen backend.

    base: [B, L] or [L] (shared); windows: [B, NW] or [1, NW] (shared);
    n/r2/one: [L]; n0inv scalar.  Returns canonical [B, L].
    """
    if backend == "xla":
        return mont_exp(base, windows, n, n0inv, r2, one)
    interpret = backend == "pallas_interpret"
    if base.ndim == 1:
        B = windows.shape[0]
        base = jnp.broadcast_to(base, (B, base.shape[-1]))
    B, L = base.shape
    if windows.shape[0] == 1 and B != 1:
        windows = jnp.broadcast_to(windows, (B, windows.shape[-1]))
    out = pallas_modexp(
        base[None],
        windows[None],
        n[None],
        jnp.reshape(n0inv, (1,)),
        r2[None],
        one[None],
        interpret=interpret,
    )
    return out[0]


def modexp_backend_grouped(base, windows, n, n0inv, r2, one, backend: str):
    """Grouped variant: base [G, B, L], windows [G, 1|B, NW], consts [G, ...].

    Used by CRT decryption (G=2: the p^2 / q^2 residue systems)."""
    if backend == "xla":
        return jax.vmap(mont_exp, in_axes=(0, 0, 0, 0, 0, 0))(
            base, windows, n, n0inv, r2, one
        )
    interpret = backend == "pallas_interpret"
    G, B, L = base.shape
    if windows.shape[1] == 1 and B != 1:
        windows = jnp.broadcast_to(windows, (G, B, windows.shape[-1]))
    return pallas_modexp(base, windows, n, n0inv, r2, one, interpret=interpret)


def mod_mul_backend(a, b, n, n0inv, r2, backend: str):
    """Plain modular product a*b mod n, canonical output.  a,b: [B, L] (b may
    be [L], shared); n/r2: [L]; n0inv scalar."""
    if backend == "xla":
        return mont_mod_mul(a, b, n, n0inv, r2)
    interpret = backend == "pallas_interpret"
    b = jnp.broadcast_to(b, a.shape)
    out = pallas_mod_mul(
        a[None], b[None], n[None], jnp.reshape(n0inv, (1,)), r2[None],
        interpret=interpret,
    )
    return out[0]


def mod_mul_backend_grouped(a, b, n, n0inv, r2, backend: str):
    """Grouped variant: a [G, B, L], b [G, B|1, L], consts [G, ...]."""
    if backend == "xla":
        return jax.vmap(mont_mod_mul, in_axes=(0, 0, 0, 0, 0))(
            a, jnp.broadcast_to(b, a.shape), n, n0inv, r2
        )
    interpret = backend == "pallas_interpret"
    return pallas_mod_mul(
        a, jnp.broadcast_to(b, a.shape), n, n0inv, r2, interpret=interpret
    )


def mont_raw_backend_grouped(a, b, n, n0inv, backend: str):
    """Grouped raw Montgomery product a*b*R^{-1} mod n (redundant digits,
    value < 2n).  a [G, B, L], b [G, B|1, L]."""
    if backend == "xla":
        return jax.vmap(mont_mul, in_axes=(0, 0, 0, 0))(
            a, jnp.broadcast_to(b, a.shape), n, n0inv
        )
    interpret = backend == "pallas_interpret"
    return pallas_mont_raw(
        a, jnp.broadcast_to(b, a.shape), n, n0inv, interpret=interpret
    )
