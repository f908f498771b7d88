"""Compute kernels: SpMM dispatch between the jnp path and the Pallas TPU path.

Reference parity: the role of indigo/backends/_customcpu.c and _customgpu.cu
(hand-written SpMM kernels — unverified, mount empty; SURVEY.md §2). On TPU
the "native kernel" is a Pallas blocked-ELL SpMM (ops/ell_spmm.py); the jnp
gather+einsum path in sparse.py is the portable fallback and oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse import BlockedELL, bell_spmm

__all__ = ["spmm", "use_pallas", "set_spmm_impl"]

# 'auto': Pallas on TPU for float32 tiles, jnp otherwise.
_SPMM_IMPL = "auto"


def set_spmm_impl(impl):
    """Select the SpMM implementation: 'auto' | 'jnp' | 'pallas'."""
    global _SPMM_IMPL
    assert impl in ("auto", "jnp", "pallas"), impl
    _SPMM_IMPL = impl


def use_pallas():
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def spmm(ell: BlockedELL, x, impl=None):
    """y = A @ x for a BlockedELL A; dispatches to the fastest available path.

    The Pallas kernel is float32-only (TPU tiles); complex inputs against a
    real matrix are handled by folding real/imag into extra batch columns,
    which is exact. Complex-valued matrices take the jnp path.
    """
    impl = impl or _SPMM_IMPL
    want_pallas = impl == "pallas" or (impl == "auto" and use_pallas())
    if want_pallas and not jnp.iscomplexobj(ell.data):
        from .ell_spmm import ell_spmm_pallas
        if jnp.iscomplexobj(x):
            K = x.shape[1]
            xr = jnp.concatenate([x.real, x.imag], axis=1)
            yr = ell_spmm_pallas(ell, xr.astype(jnp.float32))
            return jax.lax.complex(yr[:, :K], yr[:, K:])
        return ell_spmm_pallas(ell, x.astype(jnp.float32))
    return bell_spmm(ell, x)
