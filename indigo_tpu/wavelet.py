"""Orthogonal discrete wavelet transform as a structured operator.

Used by the l1-wavelet compressed-sensing config (BASELINE.json config 4).
The reference family of codebases pairs FISTA with a wavelet sparsifying
transform; there is no wavelet file in the reference inventory (SURVEY.md
§2), so this is a capability-parity component built TPU-first:

  * per-axis, per-level analysis matrices are built host-side (numpy) and
    applied as dense tensordots — small (L x L) matmuls that run on the MXU,
    instead of the strided scalar filter loops a CPU implementation uses.
  * periodic (circular) boundary, orthonormal filters => the adjoint is the
    exact inverse, so ``W.H * W == Eye`` to f32 precision.

Coefficient layout is the standard in-place one: after each level the
leading half of each transformed axis holds the approximation.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .operators import Operator

__all__ = ["DWT", "WAVELETS"]

_SQRT2 = np.sqrt(2.0)

# Orthonormal analysis low-pass filters (Daubechies family).
WAVELETS = {
    "haar": np.array([1.0, 1.0]) / _SQRT2,
    "db2": np.array([0.48296291314469025, 0.836516303737469,
                     0.22414386804185735, -0.12940952255092145]),
    "db4": np.array([0.23037781330885523, 0.7148465705525415,
                     0.6308807679295904, -0.02798376941698385,
                     -0.18703481171888114, 0.030841381835986965,
                     0.032883011666982945, -0.010597401784997278]),
}


def _analysis_matrix(L, h):
    """One-level periodic orthogonal analysis matrix (L, L), rows =
    [approx (L/2) ; detail (L/2)]."""
    T = len(h)
    g = np.array([(-1) ** t * h[T - 1 - t] for t in range(T)])
    W = np.zeros((L, L), dtype=np.float32)
    for k in range(L // 2):
        for t in range(T):
            W[k, (2 * k + t) % L] += h[t]
            W[L // 2 + k, (2 * k + t) % L] += g[t]
    return W


@register_pytree_node_class
class DWT(Operator):
    """Multi-level orthogonal DWT over a volume; columns are batch.

    shape (N, N) with N = prod(vol_shape); forward = analysis,
    adjoint = synthesis (exact inverse).
    """

    def __init__(self, vol_shape, wavelet="db4", levels=None,
                 dtype=jnp.complex64, name=None):
        self._vol = tuple(int(s) for s in vol_shape)
        self._wavelet = wavelet
        h = WAVELETS[wavelet]
        max_lv = min(int(np.log2(s)) for s in self._vol)
        self._levels = int(levels) if levels is not None else max(1, max_lv - 2)
        for s in self._vol:
            if s % (1 << self._levels):
                raise ValueError(
                    f"axis {s} not divisible by 2^{self._levels}")
            if (s >> (self._levels - 1)) < len(h):
                raise ValueError("too many levels for filter length")
        # per-level, per-axis analysis matrices
        self._mats = tuple(
            tuple(jnp.asarray(_analysis_matrix(s >> lv, h))
                  for s in self._vol)
            for lv in range(self._levels))
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def vol_shape(self):
        return self._vol

    @property
    def shape(self):
        n = int(np.prod(self._vol))
        return (n, n)

    @property
    def dtype(self):
        return self._dtype

    def _axis_mul(self, v, W, axis, transpose):
        Wd = W.T if transpose else W
        v = jnp.moveaxis(v, axis, -1)
        v = jnp.matmul(v, Wd.T.astype(v.dtype), precision="highest")
        return jnp.moveaxis(v, -1, axis)

    def apply(self, x, adjoint=False):
        K = x.shape[1]
        ndim = len(self._vol)
        v = x.reshape(self._vol + (K,))
        levels = range(self._levels)
        for lv in (reversed(levels) if adjoint else levels):
            sl = tuple(slice(0, s >> lv) for s in self._vol) + (slice(None),)
            sub = v[sl]
            axes = range(ndim)
            for ax in (reversed(axes) if adjoint else axes):
                sub = self._axis_mul(sub, self._mats[lv][ax], ax, adjoint)
            v = v.at[sl].set(sub)
        return v.reshape(-1, K)

    def cost(self, ncols=1):
        n, K = self.shape[0], ncols
        isz = np.dtype(self._dtype).itemsize
        return 16 * n * K, 4 * n * K * isz

    def _describe(self):
        return (f"{self.name}({self._wavelet}, L={self._levels})"
                f"{list(self._vol)} <{self.shape[0]}x{self.shape[1]}>")

    def tree_flatten(self):
        return (self._mats,), (self._vol, self._wavelet, self._levels,
                               str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._mats,) = children
        obj._vol, obj._wavelet, obj._levels, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj
