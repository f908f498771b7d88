"""Config-1 demo: 2D Cartesian single-coil CG-SENSE recon, 128x128.

Builds A = P F D (sampling mask, centered FFT, apodization-like diagonal),
forms the normal equations, and solves with the on-device CG. Compares the
TPU reconstruction against a numpy direct least-squares solve on a small
cropped problem, and reports timing for the full size.

Run: python examples/cartesian_sense_2d.py  (uses whatever device JAX finds)
"""
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import indigo_tpu as it


def make_problem(n, accel=2, rng=None):
    rng = np.random.default_rng(rng)
    # variable-density Cartesian undersampling: keep center + every accel-th
    keep = np.zeros(n, dtype=bool)
    keep[::accel] = True
    keep[n // 2 - n // 8: n // 2 + n // 8] = True
    rows = np.flatnonzero(np.repeat(keep, n))
    P = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (np.arange(len(rows)), rows)),
        shape=(len(rows), n * n),
    )
    # smooth "sensitivity"-like diagonal
    yy, xx = np.mgrid[0:n, 0:n] / n
    d = (0.5 + np.exp(-((xx - 0.5) ** 2 + (yy - 0.5) ** 2) * 4)).astype(np.complex64)
    # Shepp-Logan-ish phantom: sum of ellipses
    img = np.zeros((n, n), np.complex64)
    for cx, cy, rx, ry, amp in [(0.5, 0.5, 0.35, 0.45, 1.0),
                                (0.45, 0.5, 0.1, 0.15, -0.5),
                                (0.6, 0.4, 0.08, 0.06, 0.7)]:
        m = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1
        img[m] += amp
    return P, d.ravel(), img.ravel()


def main(n=128):
    P, d, x_true = make_problem(n, rng=0)
    F = it.UnscaledFFT((n, n))
    A = it.SpMatrix(P) * F * it.Diag(d)
    A = A.optimize()
    print("operator tree:")
    print(A.dump())

    # Complex data stays numpy at the boundary; the framework splits it into
    # f32 pairs before device transfer (TPU has no complex buffers).
    y = A * x_true  # simulated k-space
    # optimize() fuses P^H P (the 0/1 sampling matrix's normal factor) into
    # one diagonal via host spGEMM — no gathers/SpMM left in the CG loop
    AHA = (A.H * A).optimize()
    AHy = A.H * y

    t0 = time.perf_counter()
    x, info = it.cg(AHA, AHy, lamda=1e-6, tol=1e-8, maxiter=100)
    np.asarray(x)
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    x, info = it.cg(AHA, AHy, lamda=1e-6, tol=1e-8, maxiter=100)
    np.asarray(x)
    t_warm = time.perf_counter() - t0

    iters = int(info["iters"])
    resid = float(info["resid"])
    # Undersampled single-coil => normal equations are singular; the
    # meaningful accuracy metric is data consistency ||Ax - y|| / ||y||.
    dc = it.utils.rel_err(np.asarray(A * np.asarray(x)), np.asarray(y))
    print(f"device={jax.devices()[0].platform} n={n} "
          f"cg_iters={iters} resid={resid:.2e} data_consistency={dc:.2e}")
    print(f"first_call={t_first:.3f}s warm_solve={t_warm:.3f}s "
          f"({iters / max(t_warm, 1e-9):.1f} CG iters/sec)")

    # Small-problem cross-check: regularized normal equations vs a numpy
    # direct solve (well-posed, unique solution).
    ns, lam = 16, 1.0
    Ps, ds, xs = make_problem(ns, rng=0)
    Fs = np.fft.fftn(np.eye(ns * ns, dtype=np.complex64)
                     .reshape(ns, ns, -1), axes=(0, 1)).reshape(ns * ns, -1)
    Adense = Ps.toarray() @ Fs @ np.diag(ds)
    As = it.SpMatrix(Ps) * it.UnscaledFFT((ns, ns)) * it.Diag(ds)
    ys = As * xs
    rhs = np.asarray(As.H * ys)
    xd = np.linalg.solve(
        Adense.conj().T @ Adense + lam * np.eye(ns * ns), rhs)
    xj, _ = it.cg(As.H * As, rhs, lamda=lam, tol=1e-8, maxiter=500)
    xerr = it.utils.rel_err(np.asarray(xj), xd)
    print(f"small-problem check vs numpy direct solve: rel_err={xerr:.2e}")
    assert xerr < 1e-4, "CG disagrees with numpy direct solve"
    assert dc < 1e-3, "poor data consistency on the large problem"
    print("OK")


if __name__ == "__main__":
    main()
