"""Frozen numpy/scipy oracle — the executable spec for every config.

The reference's numpy backend doubled as the ground truth for its whole test
suite (SURVEY.md §4); with the reference mount empty this module carries that
burden (SURVEY.md §7 step 1): brute-force, obviously-correct implementations
that everything else is tested against. Keep it dependency-free (numpy/scipy
only) and do not optimize it.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "nufft_forward", "nufft_adjoint", "sense_nufft_forward", "cg",
    "fista", "soft_thresh", "centered_fft",
]


def _phases(traj, img_shape):
    traj = np.atleast_2d(traj)
    idx = np.indices(img_shape).reshape(len(img_shape), -1)
    centered = np.stack(
        [idx[d] - img_shape[d] // 2 for d in range(len(img_shape))])
    return np.exp(-2j * np.pi * (traj @ centered))  # (M, prod(img))


def nufft_forward(x, traj, img_shape):
    """Direct type-2 NUFFT: s_i = sum_j x[j] e^{-2 pi i k_i.(j - N//2)}."""
    E = _phases(traj, img_shape)
    return E @ x.reshape(int(np.prod(img_shape)), -1)


def nufft_adjoint(s, traj, img_shape):
    E = _phases(traj, img_shape)
    return E.conj().T @ s.reshape(len(np.atleast_2d(traj)), -1)


def sense_nufft_forward(x, traj, maps):
    """Multi-coil: stack per-coil direct NUFFTs of maps[c] * x (coil-major)."""
    maps = np.asarray(maps)
    img_shape = maps.shape[1:]
    xs = x.reshape(int(np.prod(img_shape)), -1)
    outs = [nufft_forward(maps[c].reshape(-1, 1) * xs, traj, img_shape)
            for c in range(maps.shape[0])]
    return np.concatenate(outs, axis=0)


def centered_fft(x, axes=None):
    """fftshift(fftn(ifftshift(x))) over the given axes."""
    axes = tuple(range(x.ndim)) if axes is None else axes
    return np.fft.fftshift(
        np.fft.fftn(np.fft.ifftshift(x, axes=axes), axes=axes, norm=None),
        axes=axes)


def cg(matvec, b, x0=None, lamda=0.0, tol=1e-6, maxiter=100):
    """Textbook CG on the host in float64 precision."""
    b = np.asarray(b)
    x = np.zeros_like(b) if x0 is None else np.array(x0)
    mv = (lambda v: matvec(v) + lamda * v) if lamda else matvec
    r = b - mv(x)
    p = r.copy()
    rs = np.vdot(r, r).real
    bn = np.linalg.norm(b.ravel()) or 1.0
    for k in range(maxiter):
        if np.sqrt(rs) <= tol * bn:
            break
        Ap = mv(p)
        alpha = rs / np.vdot(p, Ap).real
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = np.vdot(r, r).real
        p = r + (rs_new / rs) * p
        rs = rs_new
    return x, {"iters": k, "resid": np.sqrt(rs) / bn}


def soft_thresh(x, lam):
    mag = np.abs(x)
    return np.where(mag > 0, np.maximum(mag - lam, 0) / np.maximum(mag, 1e-30), 0) * x


def fista(gradf, proxg, alpha, x0, maxiter=100):
    x = np.array(x0)
    z = x.copy()
    t = 1.0
    for _ in range(maxiter):
        xn = proxg(z - alpha * gradf(z), alpha)
        tn = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
        z = xn + ((t - 1) / tn) * (xn - x)
        x, t = xn, tn
    return x
