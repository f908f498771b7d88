"""Multi-chip END-TO-END recon (k-space in, image out) on the virtual mesh.

SURVEY.md §0/§3.4: the reference's whole workload is reconstruction from
k-space; parallel/e2e.py is its multi-chip form. The single-chip
SenseRecon pipeline is the reference implementation here — the sharded
build must match it, since both ride the same KB plan weights, the same
fused pad+shift DFT matrices, and the same Toeplitz CG.
"""
import numpy as np
import pytest

import jax

from indigo_tpu.models import SenseRecon
from indigo_tpu.parallel import make_mesh
from indigo_tpu.parallel.e2e import SenseReconSharded, sense_recon_sharded
from indigo_tpu.utils import rand64c, rel_err

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def kooshball(nspokes, nread):
    g = (1 + 5 ** 0.5) / 2
    i = np.arange(nspokes)
    z = (2 * i + 1) / nspokes - 1
    th = 2 * np.pi * i / g
    dirs = np.stack([z, np.sqrt(1 - z * z) * np.cos(th),
                     np.sqrt(1 - z * z) * np.sin(th)], 1)
    r = (np.arange(nread) + 0.5) / nread * 0.5
    return (dirs[:, None, :] * r[None, :, None]).reshape(-1, 3)


def smooth_maps(nc, shape, rng):
    """Low-frequency random coil maps (so coil combination is non-trivial
    but well-conditioned)."""
    m = rand64c(nc, 5, 5, 5, rng=rng)
    big = np.zeros((nc,) + tuple(shape), np.complex64)
    big[:, :5, :5, :5] = m
    big = np.fft.ifftn(big, axes=(1, 2, 3))
    return (big / np.abs(big).max() + 0.3).astype(np.complex64)


def phantom(shape):
    zz, yy, xx = np.mgrid[[slice(0, s) for s in shape]].astype(np.float64)
    zz, yy, xx = (a / s for a, s in zip((zz, yy, xx), shape))
    img = np.zeros(shape, np.complex64)
    img[((zz - .5) / .35) ** 2 + ((yy - .5) / .4) ** 2
        + ((xx - .5) / .3) ** 2 <= 1] = 1.0
    img[((zz - .45) / .12) ** 2 + ((yy - .55) / .1) ** 2
        + ((xx - .5) / .15) ** 2 <= 1] += 0.6j
    return img


@needs8
def test_sharded_e2e_matches_single_chip(rng):
    """The full sharded pipeline (sharded rhs build + sharded Toeplitz CG)
    equals the single-chip SenseRecon on the same acquisition."""
    n, nc = 32, 3
    shape = (n, n, n)
    traj = kooshball(3 * n, n)
    maps = smooth_maps(nc, shape, rng)
    # oversamp 2.0: grid 64 (tile- and mesh-divisible), tame
    # deapodization (at 1.0x the deapod correction amplifies f32 edge
    # rounding ~1e-3; both pipelines agree only to that scale there)
    kw = dict(oversamp=2.0, width=4, iters=8)

    rec1 = SenseRecon(traj, maps, dcf="radial", **kw)
    y = rec1.simulate(phantom(shape))
    y = y + 0.005 * np.abs(y).mean() * rand64c(*y.shape, rng=rng)
    x1 = rec1(y)

    mesh = make_mesh(vol=8)
    rec2 = SenseReconSharded(traj, maps, mesh, dcf="radial", **kw)
    assert rec2.lamda == pytest.approx(rec1.lamda, rel=1e-6)
    x2, resids = rec2(y, return_resids=True)

    assert x2.shape == shape
    assert resids.shape == (8,)
    assert rel_err(np.asarray(x2).ravel(), np.asarray(x1).ravel()) < 1e-4


@needs8
def test_sharded_e2e_oneshot_and_validation(rng):
    n, nc = 32, 2
    shape = (n, n, n)
    traj = kooshball(n, n)
    maps = smooth_maps(nc, shape, rng)
    mesh = make_mesh(vol=8)

    # oversamp 1.25 -> grid 40, nt_z = 10: not divisible by 8 devices —
    # the grid is AUTO-PADDED up (grid_z to a tile*mesh multiple) instead
    # of raising (round-5 widening; the image dims are the only hard
    # constraint)
    rec_pad = SenseReconSharded(traj, maps, mesh, oversamp=1.25, width=4)
    assert rec_pad.nt[0] % 8 == 0
    assert all(g % t == 0 for g, t in zip(rec_pad.grid_shape, rec_pad.tile))

    with pytest.raises(ValueError, match="image dims"):
        # Nz=36 not divisible by the 8-device mesh axis: cannot be padded
        SenseReconSharded(kooshball(36, n), smooth_maps(2, (36, 36, 36),
                                                        rng), mesh)

    rec = SenseReconSharded(traj, maps, mesh, oversamp=2.0, width=4,
                            iters=4)
    with pytest.raises(ValueError, match="samples"):
        rec(np.zeros(7, np.complex64))

    y = rng.standard_normal((nc * len(traj),)).astype(np.complex64)
    x_cls = rec(y)
    x_fn = sense_recon_sharded(traj, maps, y, mesh, oversamp=2.0, width=4,
                               iters=4)
    assert rel_err(x_fn.ravel(), x_cls.ravel()) < 1e-6


@needs8
def test_sharded_e2e_autopad_grid_runs(rng):
    """The auto-padded grid (oversamp 1.25 at n=32: nominal grid 40, z
    padded to a tile*mesh multiple) reconstructs; it matches the
    single-chip recon of the same acquisition to gridding-error scale
    (the padded z axis uses a larger effective oversampling, so the rhs
    differs by the KB aliasing amplitude ~10^(1-width))."""
    n, nc = 32, 2
    shape = (n, n, n)
    traj = kooshball(2 * n, n)
    maps = smooth_maps(nc, shape, rng)
    mesh = make_mesh(vol=8)
    kw = dict(oversamp=1.25, width=4, iters=6)

    rec1 = SenseRecon(traj, maps, dcf="radial", **kw)
    y = rec1.simulate(phantom(shape))
    x1 = rec1(y)

    rec2 = SenseReconSharded(traj, maps, mesh, dcf="radial", **kw)
    assert rec2.nt[0] % 8 == 0
    x2 = rec2(y)
    assert x2.shape == shape
    assert rel_err(np.asarray(x2).ravel(), np.asarray(x1).ravel()) < 1e-2


def smooth_maps_2d(nc, shape, rng):
    m = rand64c(nc, 5, 5, rng=rng)
    big = np.zeros((nc,) + tuple(shape), np.complex64)
    big[:, :5, :5] = m
    big = np.fft.ifftn(big, axes=(1, 2))
    return (big / np.abs(big).max() + 0.3).astype(np.complex64)


def radial2d(nspokes, nread):
    th = np.pi * (np.arange(nspokes) + 0.5) / nspokes
    dirs = np.stack([np.cos(th), np.sin(th)], 1)
    r = np.concatenate([-(np.arange(nread // 2) + 0.5)[::-1],
                        (np.arange(nread // 2) + 0.5)]) / nread * 0.5 * 2
    return (dirs[:, None, :] * r[None, :, None]).reshape(-1, 2)


@needs8
def test_sharded_e2e_2d_batch_matches_single_chip(rng):
    """2D slice batches run data-parallel over the mesh: each padded slice
    shard solves locally (sense_batch_recon semantics). Same geometry as
    the single-chip SenseRecon => same answer per slice (one shared
    trajectory/maps; S=3 pads to the 8-device mesh)."""
    n, nc, S = 32, 2, 3
    shape = (n, n)
    traj = radial2d(3 * n, n)
    maps = smooth_maps_2d(nc, shape, rng)
    mesh = make_mesh(vol=8)
    kw = dict(oversamp=2.0, width=4, iters=6)

    rec1 = SenseRecon(traj, maps, dcf="radial", **kw)
    img = np.zeros(shape, np.complex64)
    img[8:24, 10:22] = 1.0
    ys = []
    for s in range(S):
        sl = np.roll(img, s * 2, axis=0)
        ys.append(np.asarray(rec1.simulate(sl)).reshape(nc, -1))
    y = np.stack(ys)                                 # (S, nc, M)

    rec2 = SenseReconSharded(traj, maps, mesh, dcf="radial", **kw)
    assert rec2.ndim == 2
    x2, resids = rec2(y, return_resids=True)
    assert x2.shape == (S, n, n)
    assert resids.shape == (6, S)

    for s in range(S):
        x1 = rec1(y[s])
        assert rel_err(x2[s].ravel(), np.asarray(x1).ravel()) < 1e-4

    # single-acquisition convenience form
    x_one = rec2(y[0])
    assert x_one.shape == (1, n, n)
    assert rel_err(x_one[0].ravel(), x2[0].ravel()) < 1e-6


@needs8
def test_sharded_e2e_pipe_menon_dcf(rng):
    """dcf='pipe_menon' threads through the sharded builder the same way
    as SenseRecon (round-5 widening): same weights => same recon."""
    from indigo_tpu.noncart import pipe_menon_dcf
    n, nc = 32, 2
    traj = radial2d(2 * n, n)
    maps = smooth_maps_2d(nc, (n, n), rng)
    mesh = make_mesh(vol=8)
    kw = dict(oversamp=2.0, width=4, iters=4)

    rec_pm = SenseReconSharded(traj, maps, mesh, dcf="pipe_menon", **kw)
    w = pipe_menon_dcf(traj, rec_pm.grid_shape, width=4)
    rec_w = SenseReconSharded(traj, maps, mesh, dcf=w, **kw)
    y = rand64c(1, nc, len(traj), rng=rng)
    assert rel_err(rec_pm(y).ravel(), rec_w(y).ravel()) < 1e-6
