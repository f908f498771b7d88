"""Multi-device sharding tests on the virtual 8-device CPU mesh.

(SURVEY.md §4 test plan item 5: multi-chip via
xla_force_host_platform_device_count — set in conftest.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import indigo_tpu as it
from indigo_tpu.parallel import (
    make_mesh, sense_normal_batched, batched_cg, sense_batch_recon,
    fftn_sharded, fftn_sharded2,
)
from indigo_tpu.toeplitz import toeplitz_kernel, sense_normal_toeplitz
from indigo_tpu.utils import rand64c, rel_err

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@needs8
def test_make_mesh():
    mesh = make_mesh(slice=4, coil=2)
    assert mesh.shape == {"slice": 4, "coil": 2}
    mesh2 = make_mesh(slice=-1, coil=2)
    assert mesh2.shape["slice"] == 4


def _setup(rng, S=8, nc=4, n=12):
    img_shape = (n, n)
    traj = (rng.random((60, 2)) - 0.5)
    maps = rand64c(nc, *img_shape, rng=rng)
    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    xs = rand64c(S, n * n, rng=rng)
    return Tf, maps, xs, img_shape


def test_batched_normal_matches_single(rng):
    """Batched (slice, coil) normal apply == per-slice operator-tree apply."""
    Tf, maps, xs, img_shape = _setup(rng)
    out = np.asarray(
        it.cplx.cjit(sense_normal_batched)(jnp.asarray(Tf), maps, xs))
    N_single = sense_normal_toeplitz(Tf, maps)
    for s in range(xs.shape[0]):
        ref = np.asarray(N_single * xs[s])
        assert rel_err(out[s], ref) < 1e-5


@needs8
def test_sharded_recon_matches_unsharded(rng):
    Tf, maps, xs, img_shape = _setup(rng)
    rhs = xs
    x_ref, res_ref = sense_batch_recon(Tf, maps, rhs, mesh=None,
                                       lamda=1.0, iters=15)
    mesh = make_mesh(slice=4, coil=2)
    x_sh, res_sh = sense_batch_recon(Tf, maps, rhs, mesh=mesh,
                                     lamda=1.0, iters=15)
    assert rel_err(np.asarray(x_sh), np.asarray(x_ref)) < 1e-4
    assert res_sh.shape == (15, 8)


@needs8
def test_batched_cg_per_slice_convergence(rng):
    """Each slice solves its own system: perturbing slice 0's rhs must not
    change slice 1's solution."""
    Tf, maps, xs, _ = _setup(rng, S=4)
    mesh = make_mesh(slice=4, coil=2)
    x1, _ = sense_batch_recon(Tf, maps, xs, mesh=mesh, lamda=1.0, iters=10)
    xs2 = xs.copy()
    xs2[0] *= 3.0
    x2, _ = sense_batch_recon(Tf, maps, xs2, mesh=mesh, lamda=1.0, iters=10)
    assert rel_err(np.asarray(x2[1]), np.asarray(x1[1])) < 1e-6
    assert rel_err(np.asarray(x2[0]), 3 * np.asarray(x1[0])) < 1e-5


@needs8
def test_fftn_sharded_matches_fftn(rng):
    mesh = make_mesh(x=8)
    v = rand64c(16, 8, 4, rng=rng)

    def run(v):
        return fftn_sharded(v, mesh, axis_name="x")

    out = it.cplx.cjit(run)(v)
    ref = np.fft.fftn(v)
    assert rel_err(np.asarray(out), ref) < 1e-5

    def run_inv(v):
        return fftn_sharded(v, mesh, axis_name="x", inverse=True)

    out_i = it.cplx.cjit(run_inv)(v)
    assert rel_err(np.asarray(out_i), np.fft.ifftn(v)) < 1e-5


def test_fftn_sharded2_pencil_matches_fftn(rng):
    # 2-axis (pencil) decomposition over a 4x2 mesh
    mesh = make_mesh(x=4, y=2)
    v = rand64c(8, 8, 4, 3, rng=rng)

    def run(v):
        return fftn_sharded2(v, mesh, axes=("x", "y"))

    out = it.cplx.cjit(run)(v)
    assert rel_err(np.asarray(out), np.fft.fftn(v)) < 1e-5

    def run_inv(v):
        return fftn_sharded2(v, mesh, axes=("x", "y"), inverse=True)

    out_i = it.cplx.cjit(run_inv)(v)
    assert rel_err(np.asarray(out_i), np.fft.ifftn(v)) < 1e-5


def test_coil_chunking_matches(rng):
    """coil_chunk=k computes the same normal op as the full batch."""
    import jax.numpy as jnp
    Tf, maps, xs, _ = _setup(rng, S=2, nc=4)
    f_full = it.cplx.cjit(lambda T, m, x: sense_normal_batched(T, m, x))
    f_chun = it.cplx.cjit(
        lambda T, m, x: sense_normal_batched(T, m, x, coil_chunk=2))
    a = np.asarray(f_full(jnp.asarray(Tf), maps, xs))
    b = np.asarray(f_chun(jnp.asarray(Tf), maps, xs))
    assert rel_err(b, a) < 1e-5


@needs8
def test_sharded_recon_with_chunking(rng):
    Tf, maps, xs, _ = _setup(rng, S=8, nc=4)
    mesh = make_mesh(slice=4, coil=2)
    x1, _ = sense_batch_recon(Tf, maps, xs, mesh=mesh, lamda=1.0, iters=8)
    x2, _ = sense_batch_recon(Tf, maps, xs, mesh=mesh, lamda=1.0, iters=8,
                              coil_chunk=1)
    assert rel_err(np.asarray(x2), np.asarray(x1)) < 1e-5


@needs8
def test_volume_sharded_normal_matches(rng):
    """TP: one volume sharded over z gives the same recon as unsharded."""
    from indigo_tpu.parallel.recon import sense_vol_recon
    from indigo_tpu.toeplitz import toeplitz_kernel
    n = 16
    img_shape = (n, n, n)
    nc = 2
    traj = (rng.random((200, 3)) - 0.5)
    maps = rand64c(nc, *img_shape, rng=rng)
    # accurate kernel + meaningful lamda: a low-accuracy Toeplitz kernel can
    # be slightly indefinite, which (correctly) breaks CG in both paths
    Tf = toeplitz_kernel(traj, img_shape, oversamp=2.0, width=6)
    lam = 0.05 * float(np.abs(Tf).max())
    rhs = rand64c(*img_shape, rng=rng)

    mesh = make_mesh(vol=8)
    x_sh, res_sh = sense_vol_recon(Tf, maps, rhs, mesh, axis_name="vol",
                                   lamda=lam, iters=12)
    # unsharded reference via the batched path
    x_ref, _ = sense_batch_recon(Tf, maps, rhs.reshape(1, -1), mesh=None,
                                 lamda=lam, iters=12)
    assert rel_err(np.asarray(x_sh).ravel(), np.asarray(x_ref)[0]) < 1e-4
    assert res_sh.shape == (12,)


def test_batched_cg_tol_stop(rng):
    """tol-stopped batched CG freezes converged slices: same solutions as
    the fixed-iteration run, per-slice iteration counts reported."""
    n, S = 48, 3
    M = rand64c(n, n, rng=rng)
    A = (M @ M.conj().T + 5 * np.eye(n)).astype(np.complex64)
    rhs = rand64c(S, n, rng=rng)
    # scale slice severities so convergence points differ per slice
    rhs[1] *= 1e-3
    mv = lambda v: v @ jnp.asarray(A).T
    x_ref, _ = batched_cg(mv, jnp.asarray(rhs), iters=150)
    x, resids, k = batched_cg(mv, jnp.asarray(rhs), iters=150, tol=1e-8,
                              return_iters=True)
    k = np.asarray(k)
    assert (k < 150).all() and (k > 3).all()
    assert rel_err(np.asarray(x), np.asarray(x_ref)) < 1e-5
    # residual history is frozen after convergence
    resids = np.asarray(resids)
    for s in range(S):
        tail = resids[k[s]:, s]
        assert np.allclose(tail, tail[0])


def test_batched_cg_jacobi_precond(rng):
    """Diagonal preconditioning on an ill-conditioned diagonal-dominant
    system: fewer iterations to the same tolerance, same solution."""
    n, S = 64, 2
    d = np.geomspace(1.0, 3e3, n).astype(np.float32)
    M = 0.05 * rand64c(n, n, rng=rng)
    A = (np.diag(d) + (M + M.conj().T)).astype(np.complex64)
    rhs = rand64c(S, n, rng=rng)
    mv = lambda v: v @ jnp.asarray(A).T
    pd = jnp.asarray(1.0 / d)
    x0, _, k0 = batched_cg(mv, jnp.asarray(rhs), iters=400, tol=1e-9,
                           return_iters=True)
    x1, _, k1 = batched_cg(mv, jnp.asarray(rhs), iters=400, tol=1e-9,
                           precond=lambda r: r * pd[None, :],
                           return_iters=True)
    assert (np.asarray(k1) < np.asarray(k0)).all()
    xd = np.linalg.solve(A.astype(np.complex128), rhs.T.astype(
        np.complex128)).T
    assert rel_err(np.asarray(x1), xd) < 1e-4
    assert rel_err(np.asarray(x0), xd) < 1e-4


@needs8
def test_pencil_volume_recon_matches(rng):
    """2-axis pencil-sharded single-volume CG (4x2 mesh) == unsharded —
    the p > Nz scaling path (SURVEY.md §5 long-context row)."""
    from indigo_tpu.parallel import sense_vol_recon2

    img = (8, 8, 8)          # Nz%4, 2Ny%4, Ny%2, 2Nx%2 all zero
    traj = (rng.random((120, 3)) - 0.5)
    maps = rand64c(2, *img, rng=rng)
    Tf = toeplitz_kernel(traj, img, oversamp=2.0, width=4)
    lam = 0.05 * float(np.abs(Tf).max())
    rhs = rand64c(*img, rng=rng)
    mesh = make_mesh(vz=4, vy=2)
    x, resids = sense_vol_recon2(Tf, maps, rhs, mesh, lamda=lam, iters=6)
    x0, _ = sense_batch_recon(Tf, maps, rhs.reshape(1, -1), mesh=None,
                              lamda=lam, iters=6)
    assert rel_err(np.asarray(x).ravel(), np.asarray(x0)[0]) < 1e-5
    assert resids.shape == (6,)
    # indivisible pencil (Nz=6 over vz=4) must be rejected up front
    with pytest.raises(ValueError):
        sense_vol_recon2(Tf, rand64c(2, 6, 8, 8, rng=rng),
                         rand64c(6, 8, 8, rng=rng), mesh,
                         lamda=lam, iters=2)
