"""Backend facade: reference-shaped API surface (SURVEY.md §2 L1 contract)."""
import numpy as np
import pytest

from indigo_tpu.backends import get_backend, available_backends
from indigo_tpu.utils import rand64c, randM, rel_err


def test_registry():
    b = get_backend()
    assert b is get_backend("xla")
    for name in ("numpy", "mkl", "cuda", "customcpu", "customgpu"):
        assert get_backend(name) is not None
    assert len(available_backends()) >= 1


def test_factories_and_cg(rng):
    b = get_backend()
    A = b.SpMatrix(randM(20, 30, 0.2, rng=rng))
    F = b.UnscaledFFT((30,))
    d = b.Diag(rand64c(30, rng=rng))
    T = A * F * d
    assert T.shape == (20, 30)
    x = rand64c(30, rng=rng)
    y = np.asarray(T * x)
    # reference-style solve through the facade
    AHA = T.H * T
    xr, info = b.cg(AHA, np.asarray(T.H * y), lamda=1.0, maxiter=50)
    assert np.isfinite(np.asarray(xr)).all()


def test_primitives(rng):
    b = get_backend()
    A = randM(10, 12, 0.3, rng=rng)
    X = rand64c(12, 2, rng=rng)
    assert rel_err(np.asarray(b.csrmm(A, X)), A @ X) < 1e-5
    Y = rand64c(10, 2, rng=rng)
    assert rel_err(np.asarray(b.csrmm(A, Y, adjoint=True)),
                   A.conj().T @ Y) < 1e-5

    v = rand64c(6, 3, rng=rng)
    ref = np.fft.fftn(v.reshape(6, 3), axes=(0,))
    assert rel_err(np.asarray(b.fftn(v, (6,))), ref) < 1e-5
    assert rel_err(np.asarray(b.ifftn(b.fftn(v, (6,)), (6,))), 6 * v) < 1e-4

    M = rand64c(5, 6, rng=rng)
    assert rel_err(np.asarray(b.cgemm(M, v)), M @ v) < 1e-5

    x = rand64c(8, rng=rng)
    y = rand64c(8, rng=rng)
    assert rel_err(np.asarray(b.axpby(2.0, x, 3.0, y)), 2 * x + 3 * y) < 1e-5
    assert abs(b.dot(x, y) - np.vdot(x, y)) < 1e-4
    assert abs(b.norm2(x) - np.vdot(x, x).real) < 1e-4
    ones_prod = np.asarray(b.onemm(4, x[:, None]))
    assert rel_err(ones_prod, np.ones((4, 8)) @ x[:, None]) < 1e-5
