"""SenseRecon compiled pipeline: build once, reconstruct many."""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu.models import SenseRecon
from indigo_tpu.utils import rand64c, rel_err


def radial_traj(nspokes, nread):
    ang = np.pi * np.arange(nspokes) / nspokes
    r = (np.arange(nread) - nread // 2) / nread
    return np.stack([np.outer(np.cos(ang), r).ravel(),
                     np.outer(np.sin(ang), r).ravel()], axis=1)


@pytest.fixture(scope="module")
def pipeline():
    rng = np.random.default_rng(7)
    n, nc = 24, 4
    traj = radial_traj(48, 48)
    yy, xx = np.mgrid[0:n, 0:n] / n
    maps = np.asarray([
        (0.5 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2) * 3)))
        * np.exp(1j * 2 * np.pi * (a * xx + b * yy))
        for a, b in [(0.3, 0.3), (0.3, 0.7), (0.7, 0.3), (0.7, 0.7)]],
        dtype=np.complex64)
    recon = SenseRecon(traj, maps, oversamp=2.0, width=5, iters=60)
    return recon, maps, (n, n)


def test_recover_phantom(pipeline):
    recon, maps, img_shape = pipeline
    n = img_shape[0]
    yy, xx = np.mgrid[0:n, 0:n] / n
    x_true = np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2) * 9)).astype(
        np.complex64)
    y = recon.simulate(x_true)
    assert y.shape == (recon.nc * recon.n_samples,)
    x = recon(y)
    assert x.shape == img_shape
    assert rel_err(x, x_true) < 0.05


def test_many_acquisitions_scale(pipeline):
    """Pipeline is linear: recon(c*y) == c*recon(y) across repeated calls."""
    recon, maps, img_shape = pipeline
    rng = np.random.default_rng(3)
    y = rand64c(recon.nc * recon.n_samples, rng=rng)
    x1 = recon(y)
    x2 = recon(2.0 * y)
    assert rel_err(x2, 2.0 * x1) < 1e-4


def test_user_order_invariance(pipeline):
    """Inputs/outputs are in USER sample order: shuffling the trajectory
    and data together gives the same image."""
    recon, maps, img_shape = pipeline
    rng = np.random.default_rng(5)
    n = img_shape[0]
    traj = radial_traj(48, 48)
    shuffle = rng.permutation(len(traj))
    recon2 = SenseRecon(traj[shuffle], maps, oversamp=2.0, width=5,
                        iters=60)
    yy, xx = np.mgrid[0:n, 0:n] / n
    x_true = np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2) * 9)).astype(
        np.complex64)
    y = recon.simulate(x_true).reshape(recon.nc, -1)
    y_shuf = y[:, shuffle].reshape(-1)
    x_a = recon(y.reshape(-1))
    x_b = recon2(y_shuf)
    assert rel_err(x_b, x_a) < 1e-3


def test_bad_shape_raises(pipeline):
    recon, _, _ = pipeline
    with pytest.raises(ValueError):
        recon(np.zeros(17, np.complex64))


def test_tol_stop_and_jacobi(pipeline):
    """tol-stopped serving solves match the fixed-iteration result, report
    the iterations actually taken, and the Jacobi preconditioner reaches
    the tolerance in no more iterations than plain CG."""
    recon, maps, img_shape = pipeline
    n = img_shape[0]
    traj = radial_traj(48, 48)
    yy, xx = np.mgrid[0:n, 0:n] / n
    x_true = np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2) * 9)).astype(
        np.complex64)
    y = recon.simulate(x_true)

    x_fixed = recon(y)
    r_tol = SenseRecon(traj, maps, oversamp=2.0, width=5, iters=60,
                       tol=1e-6)
    x_tol = r_tol(y)
    assert r_tol.last_iters < 60
    assert rel_err(x_tol, x_fixed) < 2e-4

    r_pcg = SenseRecon(traj, maps, oversamp=2.0, width=5, iters=60,
                       tol=1e-6, precond="jacobi")
    x_pcg = r_pcg(y)
    assert r_pcg.last_iters <= r_tol.last_iters
    assert rel_err(x_pcg, x_fixed) < 2e-4


def test_device_output(pipeline):
    """output='device' returns device-resident f32 planes identical to the
    host delivery, without forcing the volume over the host link; the
    iteration count stays available (lazily synced)."""
    from indigo_tpu import cplx

    recon, maps, img_shape = pipeline
    n = img_shape[0]
    yy, xx = np.mgrid[0:n, 0:n] / n
    x_true = np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2) * 9)).astype(
        np.complex64)
    y = recon.simulate(x_true)

    x_host = recon(y)
    xd = recon(y, output="device")
    assert cplx.iscpair(xd) and xd.shape == img_shape
    back = np.asarray(xd.re) + 1j * np.asarray(xd.im)
    np.testing.assert_allclose(back, x_host, rtol=0, atol=1e-6)
    assert recon.last_iters is not None
    with pytest.raises(ValueError):
        recon(y, output="banana")


def test_stream_matches_sequential(pipeline):
    """Overlapped-egress streaming yields exactly the per-call results, in
    order (SURVEY.md §3.4 serving: egress of acquisition k rides under the
    solve of k+1)."""
    recon, maps, shape = pipeline
    rng = np.random.default_rng(3)
    ys = [rand64c(4 * recon.n_samples, rng=rng) for _ in range(3)]
    seq = [recon(y) for y in ys]
    streamed = list(recon.stream(ys))
    assert len(streamed) == 3
    for a, b in zip(streamed, seq):
        assert a.shape == shape
        assert rel_err(a.ravel(), b.ravel()) < 1e-6

    dev = list(recon.stream(ys[:2], output="device"))
    assert all(isinstance(x, it.cplx.CPair) for x in dev)
    got = np.asarray(dev[1].re) + 1j * np.asarray(dev[1].im)
    assert rel_err(got.ravel(), seq[1].ravel()) < 1e-6
