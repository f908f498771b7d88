"""Compute kernels: SpMM dispatch between the jnp path and the Pallas TPU path.

Reference parity: the role of indigo/backends/_customcpu.c and _customgpu.cu
(hand-written SpMM kernels — unverified, mount empty; SURVEY.md §2). On TPU
the "native kernel" is a Pallas blocked-ELL SpMM (ops/ell_spmm.py); the jnp
gather+einsum path in sparse.py is the portable fallback and oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse import BlockedELL, BlockedJag, bell_spmm, jag_spmm

__all__ = ["spmm", "use_pallas", "set_spmm_impl"]

# 'auto': Pallas on TPU for float32 tiles, jnp otherwise.
_SPMM_IMPL = "auto"


def set_spmm_impl(impl):
    """Select the SpMM implementation: 'auto' | 'jnp' | 'pallas'.

    NOTE: the choice is read at TRACE time and baked into compiled
    executables — changing it does not affect already-jitted functions
    until they retrace (use jax.clear_caches() to force it).
    """
    global _SPMM_IMPL
    assert impl in ("auto", "jnp", "pallas"), impl
    _SPMM_IMPL = impl


def use_pallas():
    """Mosaic kernels are TPU-only (GPU/CPU take the jnp path)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def spmm(A, x, impl=None):
    """y = A @ x for a BlockedJag or BlockedELL A; picks the fastest path.

    The Pallas kernels are float32-only (TPU tiles); complex inputs against
    a real matrix are handled by folding real/imag into extra batch columns,
    which is exact. Complex-valued matrices take the jnp path. Jag matrices
    whose block index arrays exceed the SMEM scalar-prefetch budget also
    fall back to jnp.
    """
    impl = impl or _SPMM_IMPL
    is_jag = isinstance(A, BlockedJag)
    jnp_path = jag_spmm if is_jag else bell_spmm
    want_pallas = impl == "pallas" or (impl == "auto" and use_pallas())
    # both kernels scalar-prefetch their block indices into SMEM
    if is_jag and not A.smem_ok():
        want_pallas = False
    if not is_jag and A.cols.size * 4 > 400 * 1024:
        want_pallas = False
    if want_pallas and not jnp.iscomplexobj(A.data):
        from .ell_spmm import ell_spmm_pallas, jag_spmm_pallas
        kernel = jag_spmm_pallas if is_jag else ell_spmm_pallas
        if jnp.iscomplexobj(x):
            K = x.shape[1]
            xr = jnp.concatenate([x.real, x.imag], axis=1)
            yr = kernel(A, xr.astype(jnp.float32))
            return jax.lax.complex(yr[:, :K], yr[:, K:])
        return kernel(A, x.astype(jnp.float32))
    return jnp_path(A, x)
