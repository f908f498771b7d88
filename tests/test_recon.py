"""End-to-end reconstruction configs vs the numpy oracle (SURVEY.md §4/§6).

Small-scale versions of BASELINE.json configs 1, 2 and 4 run through the
full operator + solver stack and must match the host-precision oracle.
"""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu import oracle
from indigo_tpu.models import nufft_op, sense_nufft_op, cartesian_sense_op
from indigo_tpu.utils import rand64c, rel_err


def radial_traj(nspokes, nread, d=2):
    """Simple 2D radial trajectory in cycles/pixel, range [-0.5, 0.5)."""
    ang = np.pi * np.arange(nspokes) / nspokes
    r = (np.arange(nread) - nread // 2) / nread  # [-0.5, 0.5)
    kx = np.outer(np.cos(ang), r).ravel()
    ky = np.outer(np.sin(ang), r).ravel()
    return np.stack([kx, ky], axis=1)


def smooth_maps(nc, img_shape, rng):
    """Smooth complex coil maps (low-order fourier blobs)."""
    maps = []
    yy, xx = np.mgrid[0:img_shape[0], 0:img_shape[1]]
    for c in range(nc):
        ph = (2 * np.pi * (rng.random() * xx / img_shape[1]
                           + rng.random() * yy / img_shape[0]))
        amp = 0.4 + np.exp(
            -(((xx / img_shape[1]) - rng.random()) ** 2
              + ((yy / img_shape[0]) - rng.random()) ** 2) * 3)
        maps.append(amp * np.exp(1j * ph))
    return np.asarray(maps, dtype=np.complex64)


def test_config2_radial_sense_cg(rng):
    """2D radial NUFFT SENSE recon matches the direct-DFT oracle CG."""
    img_shape = (16, 16)
    n = 256
    nc = 4
    traj = radial_traj(12, 16)
    maps = smooth_maps(nc, img_shape, rng)
    x_true = rand64c(n, rng=rng)

    A, plan = sense_nufft_op(traj, maps, oversamp=2.0, width=6)
    y = np.asarray(A * x_true)

    lam = 10.0  # normal-op eigenvalues reach ~prod(grid)*nc; regularize
    AHy = np.asarray(A.H * y)
    x, info = it.cg(A.H * A, AHy, lamda=lam, tol=1e-9, maxiter=300)

    # Tight: float64 direct solve of OUR operator (solver correctness).
    Ad = np.asarray(A.to_dense()).astype(np.complex128)
    x_same = np.linalg.solve(
        Ad.conj().T @ Ad + lam * np.eye(n), Ad.conj().T @ y.astype(np.complex128))
    assert rel_err(np.asarray(x), x_same) < 2e-4

    # oracle: direct DFT forward/adjoint, float64 CG on the same data
    def _normal(v, traj_, maps_):
        s = oracle.sense_nufft_forward(v[:, None], traj_, maps_)
        img_shape_ = maps_.shape[1:]
        nc_ = maps_.shape[0]
        m = len(traj_)
        out = np.zeros(v.shape, np.complex128)
        for c in range(nc_):
            a = oracle.nufft_adjoint(s[c * m:(c + 1) * m], traj_, img_shape_)
            out += maps_[c].ravel().conj() * a[:, 0]
        return out

    AHy_o = _normal_rhs(y, plan.traj, maps)
    x_o, _ = oracle.cg(lambda v: _normal(v, plan.traj, maps), AHy_o,
                       lamda=lam, tol=1e-12, maxiter=400)

    # Loose: vs the exact direct-DFT oracle operator — the ~3e-5 gridding
    # approximation error is amplified by the normal-op conditioning.
    assert rel_err(np.asarray(x), x_o) < 5e-2
    assert float(info["resid"]) < 1e-6


def _normal_rhs(y, traj, maps):
    img_shape = maps.shape[1:]
    nc = maps.shape[0]
    m = len(traj)
    out = np.zeros(int(np.prod(img_shape)), np.complex128)
    for c in range(nc):
        a = oracle.nufft_adjoint(y[c * m:(c + 1) * m], traj, img_shape)
        out += maps[c].ravel().conj() * a[:, 0]
    return out


def test_config4_fista_wavelet_free(rng):
    """l1 (identity-sparsifying) FISTA recon decreases the objective and
    matches the numpy oracle FISTA trajectory."""
    img_shape = (12, 12)
    n = 144
    traj = radial_traj(8, 12)
    A, plan = nufft_op(traj, img_shape, oversamp=2.0, width=6)
    x_true = np.zeros(n, np.complex64)
    x_true[rng.integers(0, n, 6)] = rand64c(6, rng=rng)
    y = np.asarray(A * x_true[:, None])  # keep 2D for gradf broadcasting

    lam = 1e-3

    import jax.numpy as jnp

    def gradf_j(x):
        r = A.apply(x[:, None]) - jnp.asarray(y)
        return A.apply(r, adjoint=True)[:, 0]

    E0 = np.exp(-2j * np.pi * (plan.traj @ (
        np.indices(img_shape).reshape(2, -1)
        - np.array([[img_shape[0] // 2], [img_shape[1] // 2]]))))
    L = float(np.linalg.norm(E0, 2)) ** 2 * 1.05
    alpha = 1.0 / L
    proxg = lambda v, a: it.soft_thresh(v, lam * a)
    x, _ = it.apgd(gradf_j, proxg, alpha, np.zeros(n, np.complex64),
                   maxiter=150)

    # Oracle FISTA in float64 on the SAME (materialized) operator — the
    # iteration sequences must agree to f32 precision. Operator-vs-direct
    # accuracy is covered in test_noncart.
    Ad = np.asarray(A.to_dense()).astype(np.complex128)

    def gradf_o(x):
        return Ad.conj().T @ (Ad @ x - y[:, 0])

    x_o = oracle.fista(gradf_o, lambda v, a: oracle.soft_thresh(v, lam * a),
                       alpha, np.zeros(n, np.complex128), maxiter=150)
    assert rel_err(np.asarray(x), x_o) < 1e-3


def test_cartesian_sense_matches_oracle(rng):
    """cartesian_sense_op (Mask leaf + centered FFT + maps) equals the
    frozen float64 oracle in both directions."""
    img_shape = (12, 16)
    nc = 3
    maps = smooth_maps(nc, img_shape, rng)
    mask = rng.random(img_shape) > 0.4
    A = cartesian_sense_op(mask, maps)
    m = int(mask.sum())
    x = rand64c(12 * 16, 2, rng=rng)
    y = rand64c(nc * m, 2, rng=rng)
    assert rel_err(np.asarray(A * x),
                   oracle.cartesian_sense_forward(x, mask, maps)) < 1e-5
    assert rel_err(np.asarray(A.H * y),
                   oracle.cartesian_sense_adjoint(y, mask, maps)) < 1e-5


def test_config1_cartesian_sense_vs_direct(rng):
    img_shape = (12, 12)
    nc = 2
    maps = smooth_maps(nc, img_shape, rng)
    mask = rng.random(img_shape) > 0.3
    A = cartesian_sense_op(mask, maps)
    x_true = rand64c(144, rng=rng)
    y = np.asarray(A * x_true)
    lam = 1e-2
    x, info = it.cg(A.H * A, np.asarray(A.H * y), lamda=lam, tol=1e-10,
                    maxiter=500)
    Ad = np.asarray(A.to_dense())
    x_ref = np.linalg.solve(
        Ad.conj().T @ Ad + lam * np.eye(144), Ad.conj().T @ y)
    assert rel_err(np.asarray(x), x_ref) < 2e-4
