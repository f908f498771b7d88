"""Serving demo: build a `SenseRecon` pipeline once, reconstruct a stream.

The reference's users compose an operator and call the solver by hand per
script (SURVEY.md §3.4); the TPU-native serving unit is the compiled
pipeline object: geometry + payload upload + both compiles happen ONCE
(`SenseRecon.__init__`), then each acquisition costs one warm call.

Demonstrates
  * tolerance-stopped CG with the Jacobi (kernel-diagonal) preconditioner,
  * the sample-order-safe public boundary (y in the user's order),
  * ``output="device"`` delivery: the reconstructed volume stays on the
    TPU as split f32 planes — chain post-processing on device, or fetch
    with np.asarray when (and only when) the host needs the pixels.

Run: python examples/serving_pipeline.py [--big]   (64^3, --big = 128^3)
"""
import sys
import time

import numpy as np

import jax

from indigo_tpu.models import SenseRecon
from indigo_tpu.utils import rel_err


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
    traj = kooshball(16 * n, n, rng)

    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n
    maps = np.asarray([
        (0.4 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2 + (zz - c) ** 2) * 3)))
        * np.exp(1j * 2 * np.pi * (a * xx + b * yy))
        for a, b, c in rng.random((nc, 3))], dtype=np.complex64)
    x_true = np.exp(-(((xx - .5) ** 2 + (yy - .5) ** 2 + (zz - .5) ** 2) * 9)
                    ).astype(np.complex64)

    t0 = time.time()
    recon = SenseRecon(traj, maps, oversamp=1.25, width=4,
                       iters=40, tol=1e-5, precond="jacobi")
    print(f"pipeline built+compiling lazily: {time.time()-t0:.1f}s "
          f"(device={jax.devices()[0].platform}, M={recon.n_samples}, "
          f"nc={nc}, {n}^3)")

    # a "stream" of acquisitions: same geometry, new k-space every scan
    # (a global phase rotation per scan — the recon rotates identically)
    y0 = recon.simulate(x_true)
    phases = (0.0, 0.3, -1.1)

    t0 = time.time()
    x = recon(y0)
    print(f"first acquisition (compiles): {time.time()-t0:.1f}s, "
          f"iters={recon.last_iters}, rel_err vs truth="
          f"{rel_err(x, x_true):.2e}")

    for i, ph in enumerate(phases[1:], start=2):
        y = y0 * np.exp(1j * ph)
        t0 = time.time()
        xd = recon(y, output="device")      # volume STAYS on the TPU
        jax.block_until_ready((xd.re, xd.im))
        dt = time.time() - t0
        # fetch only when the host needs pixels (pays the host link once)
        xh = np.asarray(xd.re) + 1j * np.asarray(xd.im)
        print(f"acquisition {i}: warm solve {dt*1e3:.0f} ms "
              f"(device-resident), iters={recon.last_iters}, "
              f"rel_err={rel_err(xh, x * np.exp(1j * ph)):.2e}")
    print("OK")


if __name__ == "__main__":
    main()
