"""NUFFT building blocks vs the direct-DFT oracle (SURVEY.md §4)."""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu import noncart, oracle
from indigo_tpu.models import nufft_op, sense_nufft_op, centered_fft_op
from indigo_tpu.utils import rand64c, rel_err


def random_traj(m, d, rng):
    return (rng.random((m, d)) - 0.5).astype(np.float64)


def test_checkerboard_identity(rng):
    """D_out * fft(D_in * x) == fftshift(fft(ifftshift(x))) for even dims."""
    for shape in [(8,), (6, 8), (4, 8, 6)]:
        x = rand64c(*shape, rng=rng)
        din = noncart.checkerboard(shape).reshape(shape)
        dout = noncart.checkerboard(shape, shifted=True).reshape(shape)
        lhs = dout * np.fft.fftn(din * x)
        rhs = oracle.centered_fft(x)
        assert rel_err(lhs, rhs) < 1e-5, shape


def test_centered_fft_op(rng):
    shape = (8, 6)
    n = int(np.prod(shape))
    op = centered_fft_op(shape)
    x = rand64c(n, 2, rng=rng)
    ref = oracle.centered_fft(
        x.reshape(shape + (2,)), axes=(0, 1)).reshape(n, 2)
    assert rel_err(np.asarray(op * x), ref) < 1e-5


def test_interp_mat_partition_of_unity(rng):
    """KB weights vary smoothly; every row has w^d nnz and positive sum."""
    traj = random_traj(50, 2, rng)
    G = noncart.interp_mat(traj, (32, 32), width=4)
    assert G.shape == (50, 1024)
    nnz_per_row = np.diff(G.indptr)
    assert (nnz_per_row <= 16).all() and (nnz_per_row >= 9).all()
    assert (np.asarray(G.sum(axis=1)) > 0).all()


@pytest.mark.parametrize("img_shape", [(16,), (16, 12), (8, 10, 6)])
def test_nufft_vs_direct(img_shape, rng):
    """Full NUFFT chain matches the direct type-2 DFT to gridding accuracy."""
    d = len(img_shape)
    traj = random_traj(40, d, rng)
    A, plan = nufft_op(traj, img_shape, oversamp=2.0, width=6)
    x = rand64c(int(np.prod(img_shape)), 2, rng=rng)
    s = np.asarray(A * x)
    s_ref = oracle.nufft_forward(x, plan.traj, img_shape)
    assert rel_err(s, s_ref) < 5e-5


def test_nufft_perm_roundtrip(rng):
    """plan.perm maps user order -> internal order consistently."""
    img_shape = (16, 16)
    traj = random_traj(30, 2, rng)
    A, plan = nufft_op(traj, img_shape, oversamp=2.0, width=6)
    x = rand64c(256, 1, rng=rng)
    s_int = np.asarray(A * x)
    s_user = oracle.nufft_forward(x, traj, img_shape)
    assert rel_err(s_int, s_user[plan.perm]) < 5e-5


def test_nufft_adjoint_consistency(rng):
    img_shape = (12, 12)
    traj = random_traj(25, 2, rng)
    A, plan = nufft_op(traj, img_shape, oversamp=2.0, width=6)
    x = rand64c(144, 1, rng=rng)
    y = rand64c(25, 1, rng=rng)
    lhs = np.vdot(np.asarray(A * x), y)
    rhs = np.vdot(x, np.asarray(A.H * y))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_sense_nufft_vs_oracle(rng):
    img_shape = (12, 10)
    nc = 3
    traj = random_traj(30, 2, rng)
    maps = rand64c(nc, *img_shape, rng=rng)
    A, plan = sense_nufft_op(traj, maps, oversamp=2.0, width=6)
    n = int(np.prod(img_shape))
    assert A.shape == (nc * 30, n)
    x = rand64c(n, 1, rng=rng)
    s = np.asarray(A * x)
    s_ref = oracle.sense_nufft_forward(x, plan.traj, maps)
    assert rel_err(s, s_ref) < 1e-4
    # optimized tree evaluates identically
    Aopt = A.optimize()
    assert rel_err(np.asarray(Aopt * x), s) < 1e-5


def test_cartesian_sense_op(rng):
    from indigo_tpu.models import cartesian_sense_op
    img_shape = (8, 8)
    nc = 2
    maps = rand64c(nc, *img_shape, rng=rng)
    mask = rng.random(img_shape) > 0.4
    A = cartesian_sense_op(mask, maps)
    x = rand64c(64, 1, rng=rng)
    s = np.asarray(A * x)
    keep = np.flatnonzero(mask.ravel())
    ref = np.concatenate([
        oracle.centered_fft(
            (maps[c].ravel() * x[:, 0]).reshape(img_shape)
        ).ravel()[keep] for c in range(nc)])
    assert rel_err(s, ref[:, None]) < 1e-5


def test_plan_sort_unsort_roundtrip(rng):
    from indigo_tpu.models import nufft_op
    traj = random_traj(30, 2, rng)
    A, plan = nufft_op(traj, (16, 16), oversamp=2.0, width=6)
    a = rng.standard_normal(30)
    assert np.allclose(plan.unsort_samples(plan.sort_samples(a)), a)
    # coil-stacked roundtrip
    b = rng.standard_normal(3 * 30)
    assert np.allclose(
        plan.unsort_samples(plan.sort_samples(b, ncoil=3), ncoil=3), b)
    # sorted forward equals user-order oracle permuted via sort_samples
    from indigo_tpu import oracle
    x = rand64c(256, 1, rng=rng)
    s_int = np.asarray(A * x)
    s_user = oracle.nufft_forward(x, traj, (16, 16))
    assert rel_err(s_int, plan.sort_samples(s_user)) < 1e-4
