"""Config-3/5 demo: 3D multicoil NUFFT CG-SENSE + many-slice sharded batch.

Phase 1 (config 3): single-volume 3D radial SENSE recon via the
Toeplitz-embedded normal operator (64^3 by default; pass --big for 128^3).
Phase 2 (config 5): a batch of slices solved jointly, sharded over a
(slice, coil) mesh when more than one device is available.

Run: python examples/multicoil_3d.py [--big]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import indigo_tpu as it
from indigo_tpu.models import sense_nufft_op
from indigo_tpu.parallel import make_mesh, sense_batch_recon
from indigo_tpu.parallel.recon import sense_normal_batched, batched_cg
from indigo_tpu.toeplitz import toeplitz_kernel
from indigo_tpu.utils import rand64c, rel_err


def kooshball(nspokes, nread, rng):
    u, v = rng.random(nspokes), rng.random(nspokes)
    th = np.arccos(2 * u - 1)
    ph = 2 * np.pi * v
    dirs = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                     np.cos(th)], axis=1)
    r = (np.arange(nread) - nread // 2) / nread
    return (dirs[:, None, :] * r[None, :, None]).reshape(-1, 3)


def main():
    big = "--big" in sys.argv
    n = 128 if big else 64
    nc = 8
    rng = np.random.default_rng(0)
    img_shape = (n, n, n)
    traj = kooshball(8192 if big else 4096, n, rng)

    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n
    maps = np.asarray([
        (0.4 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2 + (zz - c) ** 2) * 3)))
        * np.exp(1j * 2 * np.pi * (a * xx + b * yy))
        for a, b, c in rng.random((nc, 3))], dtype=np.complex64)
    x_true = (np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2 + (zz - .5) ** 2) * 9))
              ).astype(np.complex64).ravel()

    # density compensation folded into the normal equations: solve
    # A^H W A x = A^H W y — the standard cure for radial CG's
    # density-induced ill-conditioning. Pipe-Menon runs the G G^H fixed
    # point through the device tile-gather apply (seconds at this scale);
    # on CPU-only hosts fall back to the analytic |k|^2 ramp (the host
    # CSR fixed point would take minutes at 3D scale).
    if jax.default_backend() != "cpu":
        t0 = time.time()
        wdcf = it.noncart.pipe_menon_dcf(traj, tuple(
            int(2 * round(s * 1.25 / 2)) for s in img_shape),
            width=4, iters=20, impl="device")
        print(f"pipe-menon DCF (device) in {time.time()-t0:.1f}s")
    else:
        wdcf = (np.sum(traj ** 2, axis=1) + (0.5 / n) ** 2).astype(
            np.float32)
        wdcf /= wdcf.max()

    t0 = time.time()
    Tf = toeplitz_kernel(traj, img_shape, oversamp=1.25, width=4,
                         weights=wdcf)
    print(f"toeplitz kernel ({Tf.shape}) built in {time.time()-t0:.1f}s")

    # full gridded 3D SENSE operator (element-level sparse storage at this
    # fill); simulate k-space and form rhs = A^H y on device
    t0 = time.time()
    A, plan = sense_nufft_op(traj, maps, oversamp=1.25, width=4)
    print(f"gridded SENSE operator built in {time.time()-t0:.1f}s:")
    print("  " + repr(A))
    t0 = time.time()
    y = A * x_true
    # y is in the plan's (cell-sorted) sample order: permute weights to match
    wy = np.tile(wdcf[plan.perm], nc)[:, None] * np.asarray(y)[:, None]
    rhs = np.asarray(A.H * wy)[:, 0][None, :]
    print(f"forward + adjoint (k-space sim + rhs) in {time.time()-t0:.1f}s; "
          f"|y|={np.linalg.norm(y):.3e}")

    lam = 1e-3 * float(np.abs(rhs).max())
    t0 = time.time()
    xs, resids = sense_batch_recon(Tf, maps, rhs, mesh=None, lamda=lam,
                                   iters=40)
    r = np.asarray(resids)
    x0 = np.asarray(xs)[0]
    dc = rel_err(np.asarray(A * x0), np.asarray(y))
    print(f"config-3 single volume: first call {time.time()-t0:.1f}s, "
          f"rel_err vs truth = {rel_err(x0, x_true):.2e}, "
          f"data consistency = {dc:.2e}, "
          f"resid drop {r[0,0]/max(r[-1,0],1e-30):.1e}x over 40 iters")

    # ---- config 5: many-slice batch, sharded if devices allow ----------
    S = 4
    rhs_batch = np.concatenate([rhs * (s + 1) for s in range(S)], axis=0)
    ndev = len(jax.devices())
    mesh = None
    if ndev >= 2:
        coil = 2
        mesh = make_mesh(slice=min(S, ndev // coil), coil=coil)
    t0 = time.time()
    xs_b, _ = sense_batch_recon(Tf, maps, rhs_batch, mesh=mesh,
                                lamda=lam, iters=40)
    xs_b = np.asarray(xs_b)
    print(f"config-5 batch S={S} mesh={mesh and dict(mesh.shape)}: "
          f"{time.time()-t0:.1f}s")
    for s in range(S):
        # CG iterates are exactly scale-equivariant; tolerance covers f32
        # rounding at this problem's ~1e9 dynamic range
        e = rel_err(xs_b[s], (s + 1) * np.asarray(xs)[0])
        assert e < 1e-3, f"slice {s} mismatch {e}"
    print("slice linearity check OK")


if __name__ == "__main__":
    main()
