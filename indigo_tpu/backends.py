"""Reference-compatible backend facade.

Reference parity: indigo/backends/ (SURVEY.md §2 "Backend registry",
"Backend ABC") — the reference exposes ``get_backend(name)`` returning an
object with operator factories (``b.SpMatrix(...)``, ``b.UnscaledFFT(...)``),
the device-primitive set (``csrmm``, ``fftn``, ``axpby``, ``dot``, ...), and
solvers (``b.cg``, ``b.apgd``).

On TPU the backend layer proper collapses into XLA (SURVEY.md §7 design
point 1); this module keeps the *API shape* so reference users can port
scripts mechanically. All factories return the same backend-free pytree
operators; primitives are thin jnp wrappers that are complex-safe at the
eager boundary.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import cplx, operators as op, solvers
from .utils import rand64c, randM

__all__ = ["Backend", "get_backend", "available_backends"]


class Backend:
    """Facade bundling operator factories, primitives and solvers."""

    def __init__(self, name="xla"):
        self.name = name

    # ---- operator factories (reference: b.SpMatrix(...) etc.) ----------
    def SpMatrix(self, A, **kw):
        return op.SpMatrix(A, **kw)

    def DenseMatrix(self, A, **kw):
        return op.DenseMatrix(A, **kw)

    def Diag(self, d, **kw):
        return op.Diag(d, **kw)

    def UnscaledFFT(self, shape, **kw):
        return op.UnscaledFFT(shape, **kw)

    def Eye(self, n, **kw):
        return op.Eye(n, **kw)

    def One(self, shape, **kw):
        return op.One(shape, **kw)

    def CropPad(self, in_shape, out_shape, **kw):
        return op.CropPad(in_shape, out_shape, **kw)

    def KronI(self, c, A, **kw):
        return op.KronI(c, A, **kw)

    def BlockDiag(self, blocks, **kw):
        return op.BlockDiag(blocks, **kw)

    def VStack(self, blocks, **kw):
        return op.VStack(blocks, **kw)

    def HStack(self, blocks, **kw):
        return op.HStack(blocks, **kw)

    def Scale(self, alpha, A, **kw):
        return op.Scale(alpha, A, **kw)

    # ---- solvers (reference: Backend.cg / Backend.apgd) ----------------
    def cg(self, A, b, x0=None, lamda=0.0, tol=1e-6, maxiter=100, **kw):
        return solvers.cg(A, b, x0=x0, lamda=lamda, tol=tol,
                          maxiter=maxiter, **kw)

    def apgd(self, gradf, proxg, alpha, x0, maxiter=100, **kw):
        return solvers.apgd(gradf, proxg, alpha, x0, maxiter=maxiter, **kw)

    # ---- primitive set (reference L1 contract; SURVEY.md §1) -----------
    def csrmm(self, A, X, adjoint=False):
        """Y = A @ X (or A^H @ X) for an SpMatrix operator or scipy CSR."""
        if not isinstance(A, op.SpMatrix):
            A = op.SpMatrix(A)
        return cplx.eager_call(
            lambda A, X: A.apply(X, adjoint=adjoint), A, jnp_or_np(X))

    def fftn(self, X, vol_shape):
        F = op.UnscaledFFT(vol_shape)
        return cplx.eager_call(lambda X: F.apply(X), jnp_or_np(X))

    def ifftn(self, X, vol_shape):
        F = op.UnscaledFFT(vol_shape)
        return cplx.eager_call(lambda X: F.apply(X, adjoint=True),
                               jnp_or_np(X))

    def cgemm(self, A, X, adjoint=False):
        return cplx.eager_call(
            lambda A, X: (A.conj().T if adjoint else A) @ X,
            jnp_or_np(A), jnp_or_np(X))

    def axpby(self, alpha, x, beta, y):
        """alpha*x + beta*y (functional; the reference mutated y)."""
        return cplx.eager_call(lambda x, y: alpha * x + beta * y,
                               jnp_or_np(x), jnp_or_np(y))

    def dot(self, x, y):
        r = cplx.eager_call(lambda x, y: jnp.vdot(x.ravel(), y.ravel()),
                            jnp_or_np(x), jnp_or_np(y))
        return complex(np.asarray(r))

    def norm2(self, x):
        return float(np.asarray(cplx.eager_call(
            lambda x: jnp.real(jnp.vdot(x.ravel(), x.ravel())),
            jnp_or_np(x))))

    def scale(self, alpha, x):
        return cplx.eager_call(lambda x: alpha * x, jnp_or_np(x))

    def onemm(self, M, X):
        """Reference's custom ones-matrix product (batched column sum)."""
        return cplx.eager_call(
            lambda X: op.One((M, X.shape[0])).apply(X), jnp_or_np(X))

    # ---- device array movement (reference: dndarray.copy_from/copy_to/
    # to_host; SURVEY.md §1 L1) — jnp arrays ARE the device arrays here.
    def copy_from(self, host_array):
        """Host -> device. Complex input is split to re/im f32 pairs (TPU
        holds no complex buffers); returns a CPair in that case."""
        return cplx.as_payload(np.asarray(host_array))

    def copy_to(self, device_array):
        """Device -> host numpy (complex reassembled from pairs)."""
        return cplx.to_numpy(device_array)

    to_host = copy_to

    # ---- misc ----------------------------------------------------------
    rand64c = staticmethod(rand64c)
    randM = staticmethod(randM)

    def __repr__(self):
        return f"<Backend {self.name} ({jax.default_backend()})>"


def jnp_or_np(x):
    """Keep complex numpy on the host (cplx splits it); else jnp-ify."""
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return x
    if isinstance(x, np.ndarray):
        return jnp.asarray(x)
    return x


_BACKENDS = {}


def get_backend(name="xla"):
    """Name -> Backend. All names map to XLA on the current platform; the
    reference's {numpy, mkl, cuda, customcpu, customgpu} distinction has no
    TPU analogue (XLA is the one backend), but the names resolve so ported
    scripts run unchanged."""
    key = str(name).lower()
    if key not in _BACKENDS:
        _BACKENDS[key] = Backend(key)
    return _BACKENDS[key]


def available_backends():
    """Reference: probes which native libs load. Here: the XLA platforms
    visible to this process."""
    return [jax.default_backend()]
