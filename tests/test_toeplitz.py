"""Toeplitz-embedded normal operator vs gridded A^H A and the exact oracle."""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu import oracle
from indigo_tpu.models import nufft_op, sense_nufft_op
from indigo_tpu.toeplitz import ToeplitzNormal, toeplitz_kernel, \
    sense_normal_toeplitz
from indigo_tpu.utils import rand64c, rel_err


def random_traj(m, d, rng):
    return (rng.random((m, d)) - 0.5).astype(np.float64)


def exact_normal(x, traj, img_shape):
    s = oracle.nufft_forward(x, traj, img_shape)
    return oracle.nufft_adjoint(s, traj, img_shape)


@pytest.mark.parametrize("img_shape", [(16,), (12, 16)])
def test_toeplitz_matches_exact_normal(img_shape, rng):
    traj = random_traj(40, len(img_shape), rng)
    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    K = ToeplitzNormal(Tf, img_shape)
    n = int(np.prod(img_shape))
    x = rand64c(n, 2, rng=rng)
    y = np.asarray(K * x)
    y_ref = exact_normal(x, traj, img_shape)
    assert rel_err(y, y_ref) < 2e-4


def test_toeplitz_matches_gridded_normal(rng):
    img_shape = (16, 16)
    traj = random_traj(50, 2, rng)
    A, plan = nufft_op(traj, img_shape, oversamp=2.0, width=6)
    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    K = ToeplitzNormal(Tf, img_shape)
    x = rand64c(256, 1, rng=rng)
    y_toep = np.asarray(K * x)
    y_grid = np.asarray(A.H * (A * x))
    assert rel_err(y_toep, y_grid) < 5e-4


def test_self_adjoint(rng):
    img_shape = (8, 8)
    traj = random_traj(30, 2, rng)
    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    K = ToeplitzNormal(Tf, img_shape)
    x = rand64c(64, 1, rng=rng)
    y = rand64c(64, 1, rng=rng)
    lhs = np.vdot(np.asarray(K * x), y)
    rhs = np.vdot(x, np.asarray(K * y))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5
    # K.H is K (structurally self-adjoint apply)
    assert rel_err(np.asarray(K.H * x), np.asarray(K * x)) < 1e-6


def test_sense_toeplitz_cg_matches_standard_cg(rng):
    """CG with the Toeplitz normal op reaches the same SENSE solution."""
    img_shape = (12, 12)
    nc = 3
    n = 144
    traj = random_traj(80, 2, rng)
    maps = rand64c(nc, *img_shape, rng=rng)
    A, plan = sense_nufft_op(traj, maps, oversamp=2.0, width=6, sort=False)
    x_true = rand64c(n, rng=rng)
    y = np.asarray(A * x_true[:, None])
    AHy = np.asarray(A.H * y)
    lam = 5.0

    x_std, _ = it.cg(A.H * A, AHy, lamda=lam, tol=1e-9, maxiter=300)

    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    N_toep = sense_normal_toeplitz(Tf, maps)
    x_toep, _ = it.cg(N_toep, AHy, lamda=lam, tol=1e-9, maxiter=300)

    assert rel_err(np.asarray(x_toep), np.asarray(x_std)) < 2e-3


def test_psd_clip_and_warning(rng, capsys):
    """Low-accuracy kernels warn about negative spectrum; psd_clip fixes."""
    import sys
    traj = random_traj(40, 2, rng)
    Tf = toeplitz_kernel(traj, (16, 16), oversamp=1.0, width=2)
    # crude kernel: expect some negativity (warning printed to stderr)
    Tf2 = toeplitz_kernel(traj, (16, 16), oversamp=1.0, width=2,
                          psd_clip=True)
    assert Tf2.min() >= 0.0
    # clipped operator is PSD: x^H K x >= 0
    K = ToeplitzNormal(Tf2, (16, 16))
    x = rand64c(256, 1, rng=rng)
    q = np.vdot(x, np.asarray(K * x)).real
    assert q >= -1e-3 * abs(q)


def test_device_kernel_matches_host(rng):
    """impl='device' (tile-gather adjoint + on-device FFTs) == impl='host'
    (frozen numpy/scipy spec) to f32 rounding."""
    traj = random_traj(300, 3, rng)
    w = rng.random(300).astype(np.float32)
    Th = toeplitz_kernel(traj, (12, 12, 16), oversamp=1.25, width=4,
                         weights=w, impl="host", warn=False)
    Td = toeplitz_kernel(traj, (12, 12, 16), oversamp=1.25, width=4,
                         weights=w, impl="device", warn=False)
    assert rel_err(Td, Th) < 1e-5
