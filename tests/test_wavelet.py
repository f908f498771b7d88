"""DWT operator: orthogonality, known Haar values, inverse, CS recon."""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu.wavelet import DWT, WAVELETS
from indigo_tpu.utils import rand64c, rel_err


def test_haar_level1_known_values():
    W = DWT((4,), wavelet="haar", levels=1)
    x = np.array([1.0, 2.0, 3.0, 4.0], np.complex64)
    y = np.asarray(W * x)
    s = np.sqrt(2.0)
    expect = np.array([3.0 / s * 1, 7.0 / s, -1.0 / s, -1.0 / s])
    np.testing.assert_allclose(y.real, expect, rtol=1e-6)


@pytest.mark.parametrize("wavelet", ["haar", "db2", "db4"])
@pytest.mark.parametrize("shape,levels", [((32,), 2), ((16, 32), 2),
                                          ((16, 16, 8), 1)])
def test_orthogonal_and_inverse(wavelet, shape, levels, rng):
    W = DWT(shape, wavelet=wavelet, levels=levels)
    n = int(np.prod(shape))
    x = rand64c(n, 2, rng=rng)
    y = np.asarray(W * x)
    # energy preserved (orthonormal)
    assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-3
    # adjoint is the exact inverse
    xr = np.asarray(W.H * y)
    assert rel_err(xr, x) < 1e-5
    # adjoint identity
    z = rand64c(n, 2, rng=rng)
    lhs = np.vdot(y, z)
    rhs = np.vdot(x, np.asarray(W.H * z))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


@pytest.mark.parametrize("wavelet,shape,levels",
                         [("haar", (16,), 2), ("db4", (16, 32), 2)])
def test_dwt_matches_oracle(wavelet, shape, levels, rng):
    """The jnp DWT equals the frozen float64 oracle (both directions)."""
    from indigo_tpu import oracle

    W = DWT(shape, wavelet=wavelet, levels=levels)
    n = int(np.prod(shape))
    x = rand64c(n, 2, rng=rng)
    assert rel_err(np.asarray(W * x),
                   oracle.dwt(x, shape, wavelet, levels)) < 1e-5
    assert rel_err(np.asarray(W.H * x),
                   oracle.dwt(x, shape, wavelet, levels, adjoint=True)) < 1e-5


def test_dense_orthogonality(rng):
    W = DWT((8, 8), wavelet="db2", levels=2)
    D = np.asarray(W.to_dense())
    np.testing.assert_allclose(D @ D.conj().T, np.eye(64), atol=1e-5)


def test_sparsifies_smooth_signal(rng):
    """A smooth image compresses: most coefficients are tiny."""
    n = 64
    t = np.arange(n) / n
    img = np.outer(np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)).astype(
        np.complex64)
    W = DWT((n, n), wavelet="db4", levels=3)
    y = np.asarray(W * img.ravel())
    mags = np.sort(np.abs(y))[::-1]
    energy = np.cumsum(mags ** 2) / np.sum(mags ** 2)
    k99 = int(np.searchsorted(energy, 0.99)) + 1
    assert k99 < 0.05 * n * n  # 99% energy in <5% of coefficients


def test_config4_l1_wavelet_fista(rng):
    """min 0.5||Ax-y||^2 + lam||Wx||_1 via FISTA with prox in wavelet domain."""
    import jax.numpy as jnp
    from indigo_tpu.models import cartesian_sense_op

    n = 16
    img_shape = (n, n)
    maps = np.ones((1,) + img_shape, np.complex64)
    mask = rng.random(img_shape) > 0.5
    mask[n // 2 - 2:n // 2 + 2] = True
    A = cartesian_sense_op(mask, maps)
    W = DWT(img_shape, wavelet="db2", levels=2)

    t = np.arange(n) / n
    x_true = np.outer(np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)).astype(
        np.complex64).ravel()
    y = np.asarray(A * x_true[:, None])

    lam = 1e-3
    L = float(it.max_eigen(A.H * A, n * n, iters=50).real) * 1.05

    def gradf(u):
        # variable u = W x  (orthonormal) => x = W^H u
        x = W.apply(u, adjoint=True)
        r = A.apply(x) - jnp.asarray(y)
        return W.apply(A.apply(r, adjoint=True))

    u0 = np.zeros((n * n, 1), np.complex64)
    u, _ = it.apgd(gradf, lambda v, a: it.soft_thresh(v, lam * a), 1.0 / L,
                   u0, maxiter=200)
    x = np.asarray(W.H * np.asarray(u))
    err = rel_err(x[:, 0], x_true)
    # ~50% sampling of a 2-coefficient-sparse (in Fourier) smooth image
    assert err < 0.15
