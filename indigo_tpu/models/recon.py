"""Compiled end-to-end reconstruction pipelines (the serving layer).

The reference's users compose operators and call solvers by hand per script
(SURVEY.md §3.4); for production/serving on TPU the right unit is a
*pipeline object*: build the geometry once (gridding matrices, Toeplitz
kernel, DCF), upload payloads once, compile the whole solve once, then
reconstruct many acquisitions at full device speed.

    recon = SenseRecon(traj, maps, lamda=1e-2, iters=30)
    img = recon(y)            # y in the user's sample order, coil-major

Handles the sample-ordering footgun internally: all public inputs/outputs
are in the USER's trajectory order.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .. import cplx
from ..toeplitz import toeplitz_kernel
from ..parallel.recon import sense_normal_batched, batched_cg
from .sense import sense_nufft_op

__all__ = ["SenseRecon"]


class SenseRecon:
    """Multi-coil (NU)FFT SENSE reconstruction pipeline.

    traj: (M, d) in cycles/pixel [-0.5, 0.5); maps: (nc, *img_shape).
    dcf: None | 'radial' (analytic |k|^(d-1) ramp) | (M,) weights in user
    order — folded into the normal equations (A^H W A x = A^H W y).
    The CG runs on the Toeplitz-embedded normal operator (no SpMM in the
    loop); the gridded operator serves forward simulation and the rhs.

    lamda: Tikhonov weight. None (default) picks 1e-3 * |Tf|_max, floored
    at the gridding-error stability scale (see ``lamda_floor``); an
    explicit value is used verbatim (with a warning if it sits below the
    floor, where CG can stall on the spectrum's indefinite part).

    tol: relative-residual stopping tolerance. 0 (default) runs exactly
    ``iters`` iterations; > 0 freezes the solve on-device once
    ||r|| <= tol*||b|| (the solve still costs at most ``iters`` scan
    steps) and ``last_iters`` reports the count actually taken.

    precond: None or 'jacobi' — a diagonal preconditioner built from the
    Toeplitz kernel's DC tap and the coil-map intensity,
    1 / (mean(Tf) * sum_c |m_c|^2 + lamda); it equalizes coil shading so
    tol-stopped solves take fewer iterations at equal accuracy.
    """

    def __init__(self, traj, maps, oversamp=1.25, width=4, lamda=None,
                 iters=30, tol=0.0, precond=None, dcf="radial",
                 coil_chunk=None):
        traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
        maps = np.asarray(maps, dtype=np.complex64)
        self.nc = maps.shape[0]
        self.img_shape = maps.shape[1:]
        self.iters = int(iters)
        self.tol = float(tol)
        self.coil_chunk = coil_chunk
        self.last_iters = None
        d = traj.shape[1]

        if dcf is None:
            w = np.ones(len(traj), np.float32)
        elif isinstance(dcf, str) and dcf == "radial":
            w = (np.sum(traj ** 2, axis=1) ** ((d - 1) / 2.0)
                 + (0.5 / max(self.img_shape)) ** (d - 1)).astype(np.float32)
            w /= w.max()
        elif isinstance(dcf, str) and dcf == "pipe_menon":
            from ..noncart import pipe_menon_dcf
            grid = tuple(int(2 * round(s * oversamp / 2))
                         for s in self.img_shape)
            w = pipe_menon_dcf(traj, grid, width=width)
        else:
            w = np.asarray(dcf, np.float32).ravel()
        self._w_user = w

        self.A, self.plan = sense_nufft_op(
            traj, maps, oversamp=oversamp, width=width)
        self._w_sorted = np.tile(w[self.plan.perm], self.nc).astype(
            np.float32)

        Tf, self.kernel_info = toeplitz_kernel(
            traj, self.img_shape, oversamp=oversamp, width=width,
            weights=w, return_info=True, warn=False)
        from ..ops import use_pallas
        from ..ops.dft_fft import block_spectrum
        from ..ops.dft_pallas import pallas_spectrum, pallas_supported
        # device-resident payloads (uploaded once); the Toeplitz spectrum is
        # pre-permuted host-side into the layout of the fastest path for
        # this platform/volume (fused Pallas kernels or jnp matmul-DFT)
        if use_pallas() and pallas_supported(self.img_shape):
            self._layout = "pallas"
            self._Tf = jax.device_put(jnp.asarray(pallas_spectrum(Tf)))
        else:
            self._layout = "block"
            self._Tf = jax.device_put(jnp.asarray(block_spectrum(Tf)))
        self._maps = jax.device_put(cplx.pack(maps))
        self._wd = jax.device_put(jnp.asarray(self._w_sorted))
        # Stability floor: the restricted Toeplitz operator is PSD up to
        # GRIDDING error (its spectrum's pointwise negatives are normal
        # Dirichlet structure, ~7% of peak even for accurate kernels), so
        # the indefiniteness that can break CG is of order the KB-kernel
        # aliasing amplitude — ~10^(1-width), 3x worse below 1.25x
        # oversampling. The DEFAULT lamda is floored at that scale (it
        # coincides with 1e-3*max for default parameters and grows
        # protectively for deliberately coarse kernels). An EXPLICIT lamda
        # is always respected — if it sits below the floor, CG may stall
        # on the indefinite part, so we warn instead of silently changing
        # the solved problem.
        eps = 10.0 ** (1 - width) * (3.0 if oversamp < 1.25 else 1.0)
        self.lamda_floor = eps * self.kernel_info["max"]
        if lamda is None:
            self.lamda = max(1e-3 * self.kernel_info["max"],
                             self.lamda_floor)
        else:
            self.lamda = float(lamda)
            if self.lamda < self.lamda_floor:
                import warnings
                warnings.warn(
                    f"SenseRecon: lamda={self.lamda:.3g} is below the "
                    f"gridding-error stability floor "
                    f"{self.lamda_floor:.3g} (kernel width={width}, "
                    f"oversamp={oversamp}); CG may converge slowly or "
                    f"stall on the indefinite part of the Toeplitz "
                    f"spectrum. Raise lamda, the kernel width, or "
                    f"oversamp.", stacklevel=2)

        n = int(np.prod(self.img_shape))
        # sigma CG basis for the radix-2 Pallas kernels: one reorder per
        # solve instead of per CG iteration (see ops/dft_pallas.py)
        from ..ops.dft_pallas import (
            uses_sigma_basis, to_sigma_basis, from_sigma_basis,
            solver_sigma_axes)
        sig = self._layout == "pallas" and uses_sigma_basis(self.img_shape)
        sig_ax = solver_sigma_axes(self.img_shape)

        # Jacobi preconditioner: diag(normal op + lamda I) is exactly
        # mean(Tf) * sum_c |m_c(j)|^2 + lamda (every image point sees the
        # Toeplitz kernel's DC tap), built host-side once and carried in
        # the CG state's basis (sigma reorder applied like the rhs)
        if precond == "jacobi":
            dc = float(np.mean(Tf))
            dg = dc * np.sum(np.abs(maps) ** 2, axis=0) + self.lamda
            dg = (1.0 / np.maximum(dg, 1e-30)).astype(np.float32)
            if sig:
                for ax in (a - 1 for a in sig_ax):  # no lead dim here
                    dg = np.concatenate(
                        [np.take(dg, np.arange(0, dg.shape[ax], 2), ax),
                         np.take(dg, np.arange(1, dg.shape[ax], 2), ax)],
                        axis=ax)
            self._pd = jax.device_put(jnp.asarray(dg.ravel()))
        elif precond is None:
            self._pd = None
        else:
            raise ValueError(f"unknown precond {precond!r}")

        # rhs build and CG are SEPARATE compiles, and the gridded operator
        # rides in as a jit ARGUMENT (device-uploaded once): closed over,
        # its plan arrays (~0.5GB at 256^3) become traced constants, which
        # breaks this sandbox's remote compile service (broken pipe) and
        # would re-embed per recompile. The rhs intermediate stays on
        # device as a split f32 pair (complex outputs would round-trip the
        # ~27MB/s tunnel as host numpy).
        self._A_d = cplx.device_put_tree(self.A)

        @cplx.cjit
        def _rhs(A, w, y_sorted):
            r = A.apply(w[:, None] * y_sorted, adjoint=True)
            r = r.reshape((1,) + self.img_shape)
            if sig:
                r = to_sigma_basis(r, sig_ax)
            r = r.reshape(1, n)
            return jnp.real(r).astype(jnp.float32), \
                jnp.imag(r).astype(jnp.float32)

        @cplx.cjit
        def _cg(Tf, maps_p, rr, ri, pd):
            m = cplx.unpack(maps_p)
            rhs = jax.lax.complex(rr, ri)
            xs, resids, k = batched_cg(
                lambda v: sense_normal_batched(
                    Tf, m, v, coil_chunk=self.coil_chunk,
                    layout=self._layout, sigma=sig),
                rhs, lamda=self.lamda, iters=self.iters, tol=self.tol,
                precond=(None if pd is None
                         else (lambda r: r * pd[None, :])),
                return_iters=True)
            xs = xs.reshape((1,) + self.img_shape)
            if sig:
                xs = from_sigma_basis(xs, sig_ax)
            xs = xs.reshape(1, n)[0]
            # real f32 outputs stay DEVICE-resident through the cjit
            # boundary (complex ones are fetched to host numpy); the
            # caller decides when/whether to pay the device->host link
            return (jnp.real(xs).astype(jnp.float32),
                    jnp.imag(xs).astype(jnp.float32)), resids[:, 0], k[0]

        def _solve(Tf, maps_p, w, y_sorted):
            rr, ri = _rhs(self._A_d, w, y_sorted)
            return _cg(Tf, maps_p, rr, ri, self._pd)

        self._solve = _solve
        # the two compiled stages, exposed for stage-level timing
        # (tools/serving_bench.py) and power users who reuse an rhs
        self._rhs_fn, self._cg_fn = _rhs, _cg

        @cplx.cjit
        def _forward(A, x):
            return A.apply(x.reshape(n, 1))[:, 0]

        self._forward = lambda x: _forward(self._A_d, x)

    @property
    def n_samples(self):
        return self.plan.n_samples

    def simulate(self, x):
        """k-space (user sample order, coil-major) from an image."""
        y = self._forward(np.asarray(x).ravel().astype(np.complex64))
        return self.plan.unsort_samples(np.asarray(y), ncoil=self.nc)

    def __call__(self, y, return_resids=False, output="host"):
        """Reconstruct an image from k-space y (user order, coil-major
        (nc*M,) or (nc, M)).

        output: 'host' (default) returns a numpy complex image —
        convenient, but it pays the device->host link for the whole
        volume every call (serialized and slow on tunneled setups).
        'device' returns a :class:`~indigo_tpu.cplx.CPair` of
        device-resident f32 planes without blocking — the right choice
        when the image feeds further on-device work or when egress
        should overlap the next acquisition's solve. ``last_iters``
        stays lazy (synced on first read) either way.
        """
        y = np.asarray(y).reshape(-1)
        if y.shape[0] != self.nc * self.n_samples:
            raise ValueError(
                f"expected {self.nc}x{self.n_samples} samples, got {y.shape}")
        y_sorted = self.plan.sort_samples(y, ncoil=self.nc)[:, None]
        (xr, xi), resids, k = self._solve(self._Tf, self._maps, self._wd,
                                          y_sorted.astype(np.complex64))
        self._last_k = k
        if output == "device":
            x = cplx.CPair(xr.reshape(self.img_shape),
                           xi.reshape(self.img_shape))
        elif output == "host":
            x = (np.asarray(xr).astype(np.complex64)
                 + 1j * np.asarray(xi)).reshape(self.img_shape)
        else:
            raise ValueError(f"unknown output {output!r}")
        if return_resids:
            return x, np.asarray(resids)
        return x

    def stream(self, ys, output="host"):
        """Reconstruct a SEQUENCE of acquisitions with egress overlapped.

        Serving pattern: each solve is dispatched asynchronously and its
        result's device->host copy is enqueued IMMEDIATELY (via
        ``copy_to_host_async``), before the next acquisition's solve
        joins the device queue. Ordering matters: a plain ``np.asarray``
        issued after dispatching solve k+1 puts the D2H request BEHIND
        solve k+1 in the device stream, so the fetch waits for it and
        the loop runs serial (the round-4 5.91 s/acq at warm 2.46 +
        egress 4.04; tools/stream_trace.py). With the copy enqueued
        right behind its own solve, the transfer engine streams result k
        out while solve k+1 executes, and throughput approaches
        max(solve, egress).

        ys: iterable of k-space acquisitions (each as accepted by
        ``__call__``). Yields images in order; ``output`` as in
        ``__call__`` ('host' fetches numpy complex, 'device' yields the
        un-fetched CPair and leaves overlap to the caller).
        """
        def prefetch(x):
            try:
                x.re.copy_to_host_async()
                x.im.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass               # backend without async D2H: np.asarray
                                   # below still works, just unoverlapped

        def fetch(x):
            if output == "host":
                return (np.asarray(x.re).astype(np.complex64)
                        + 1j * np.asarray(x.im))
            return x

        prev = None
        for y in ys:
            x = self(y, output="device")   # async dispatch of solve k
            prefetch(x)                    # D2H of k queued before k+1
            if prev is not None:
                yield fetch(prev)          # egress overlaps x's solve
            prev = x
        if prev is not None:
            yield fetch(prev)

    @property
    def last_iters(self):
        """CG iterations taken by the most recent solve (tol-stopped runs
        report the on-device count; fetched lazily on first access)."""
        if self._last_k is None:
            return None
        if not isinstance(self._last_k, (int, np.integer)):
            self._last_k = int(np.asarray(self._last_k))
        return self._last_k

    @last_iters.setter
    def last_iters(self, v):
        self._last_k = v
