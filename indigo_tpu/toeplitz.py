"""Toeplitz-embedded NUFFT normal operator.

BASELINE.json config 5: replace A^H A (gridding -> FFT -> degridding, twice)
with a single padded-FFT pointwise multiply:

    A^H A x  ~=  crop( IFFT( T * FFT( pad_2x(x) ) ) )

where T is the spectrum of the (Hermitian) point-spread kernel
t[d] = sum_i exp(2 pi i k_i . d), d in (-N, N)^d, computed once via the
gridded adjoint NUFFT of a ones-vector on a 2N image. Inside a CG loop this
removes the SpMM entirely — the iteration is two FFTs and one elementwise
multiply, the HBM-roofline path the north star asks for.

T is Hermitian-symmetric => its spectrum is real; stored as a real float32
payload (half the bytes, and keeps the operator exactly self-adjoint).

Reference parity: SURVEY.md §3.4 mentions the reference's Toeplitz embedding
of the normal operator ("or Toeplitz-embedded normal op"); this is its
TPU-native form.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .operators import Operator, KronI, VStack, Diag
from . import cplx

__all__ = ["ToeplitzNormal", "toeplitz_kernel", "sense_normal_toeplitz"]


def toeplitz_kernel(traj, img_shape, oversamp=1.5, width=5, weights=None,
                    psd_clip=False, return_info=False, warn=True,
                    impl="auto"):
    """Real spectrum T (2N grid) of the NUFFT normal-operator kernel.

    Negative spectrum values are NORMAL: T is a sum of Dirichlet kernels
    (one per sample), which take negative values pointwise; only the
    *restricted* operator crop.IFFT.T.FFT.pad is PSD. By Parseval, its
    smallest eigenvalue is bounded below by min(T), so CG on K + lamda*I
    is guaranteed stable whenever lamda > -min(T) — SenseRecon applies
    exactly that floor (no operator distortion). ``psd_clip=True`` instead
    clips negatives to zero: cheap insurance for standalone use, at the
    cost of perturbing the operator.

    ``return_info``: also return a dict with ``min``/``max``/``clipped``
    diagnostics (surfaced by SenseRecon as ``kernel_info``). ``warn``:
    print a stderr hint for meaningfully-indefinite kernels (callers that
    apply the lamda floor pass warn=False).

    Computed once, on the doubled image grid: the gridded adjoint NUFFT of
    ``weights`` (default ones; pass density-compensation weights to fold
    them into the normal operator):

        t = Da^H Z^H Fc^H G^H w   (one adjoint gridding + one inverse FFT)
        T = FFT(ifftshift(t)).real

    ``impl``: 'device' runs the adjoint gridding (tile-gather) and the two
    FFTs on the accelerator — at 256^3 (640^3 doubled oversampled grid) this
    is seconds instead of minutes; 'host' is the frozen numpy/scipy path;
    'auto' picks 'device' when the grid is large and a non-CPU backend is
    up. Both agree to f32 rounding (tested).
    """
    from .noncart import beatty_beta

    img_shape = tuple(int(s) for s in img_shape)
    big = tuple(2 * s for s in img_shape)
    grid2 = tuple(int(2 * round(s * oversamp / 2)) for s in big)
    beta = beatty_beta(width, oversamp)
    M = len(np.atleast_2d(traj))
    w = np.ones(M, np.complex64) if weights is None else \
        np.asarray(weights, np.complex64).ravel()
    if impl == "auto":
        try:
            on_cpu = jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover
            on_cpu = True
        impl = "device" if (not on_cpu
                            and np.prod(grid2) >= 64 ** 3) else "host"

    if impl == "device":
        Tf = _toeplitz_kernel_device(traj, img_shape, big, grid2, width,
                                     beta, w)
    else:
        Tf = _toeplitz_kernel_host(traj, img_shape, big, grid2, width,
                                   beta, w)
    tmin = float(Tf.min())
    tmax = float(np.abs(Tf).max())
    clipped = False
    if psd_clip:
        Tf = np.maximum(Tf, 0.0)
        clipped = tmin < 0
    elif warn and tmin < -1e-3 * tmax:
        import sys
        print(f"[indigo_tpu.toeplitz] kernel spectrum has negative values "
              f"(min {tmin:.3e}); CG on K + lamda*I is stable for "
              f"lamda > {-tmin:.3e} (SenseRecon applies this floor), or "
              f"pass psd_clip=True", file=sys.stderr)
    Tf = np.ascontiguousarray(Tf)
    if return_info:
        return Tf, {"min": tmin, "max": tmax, "clipped": clipped}
    return Tf


def _toeplitz_kernel_host(traj, img_shape, big, grid2, width, beta, w):
    """Frozen numpy/scipy kernel build (the executable spec)."""
    from .noncart import interp_mat, deapodization

    import scipy.fft as sfft  # keeps complex64 (numpy.fft upcasts to c128)

    G = interp_mat(traj, grid2, width=width, beta=beta)
    v = np.asarray(G.conj().T @ w).reshape(grid2).astype(np.complex64)
    # Fc^H = fftshift . (prod(grid2) * ifftn) . ifftshift
    u = np.fft.fftshift(
        sfft.ifftn(np.fft.ifftshift(v), workers=-1)) * np.float32(
            np.prod(grid2))
    offs = [(g - b) // 2 for b, g in zip(big, grid2)]
    sl = tuple(slice(o, o + b) for b, o in zip(big, offs))
    t = (u[sl] * deapodization(big, grid2, width=width, beta=beta)
         ).astype(np.complex64)
    return sfft.fftn(np.fft.ifftshift(t), workers=-1).real.astype(np.float32)


def _toeplitz_kernel_device(traj, img_shape, big, grid2, width, beta, w):
    """Device kernel build: tile-gather adjoint gridding + on-device FFTs.

    Same math as :func:`_toeplitz_kernel_host`; at 256^3 the doubled
    oversampled grid is 640^3 and the host path takes minutes — here the
    adjoint gridding streams through the tile-scatter (ops/tile_interp.py)
    and both FFTs run on the accelerator.
    """
    from .noncart import deapodization
    from .ops.tile_interp import plan_tile_interp, tile_interp_apply

    # this path only ever applies the ADJOINT: skip the grouped-forward
    # layout (FwdGroups near-duplicates the ~100MB-class weight arrays at
    # 256^3/640^3 doubled-grid scale and would be uploaded unused)
    plan = plan_tile_interp(traj, grid2, width=width, beta=beta,
                            forward="dense")
    plan = jax.device_put(plan)
    da = deapodization(big, grid2, width=width, beta=beta)
    offs = tuple((g - b) // 2 for b, g in zip(big, grid2))

    @jax.jit
    def build(plan, wr, wi, da):
        v = tile_interp_apply(
            plan, jnp.stack([wr, wi], axis=1), adjoint=True)
        v = jax.lax.complex(v[:, 0], v[:, 1]).reshape(grid2)
        v = jnp.fft.ifftshift(v)
        u = jnp.fft.fftshift(jnp.fft.ifftn(v)) * np.float32(np.prod(grid2))
        sl = tuple(slice(o, o + b) for b, o in zip(big, offs))
        t = u[sl] * da
        t = jnp.fft.ifftshift(t)
        return jnp.real(jnp.fft.fftn(t)).astype(jnp.float32)

    Tf = build(plan, jnp.asarray(w.real.astype(np.float32)),
               jnp.asarray(w.imag.astype(np.float32)), jnp.asarray(da))
    return np.ascontiguousarray(np.asarray(Tf))


@register_pytree_node_class
class ToeplitzNormal(Operator):
    """Self-adjoint operator x -> crop(IFFT(T * FFT(pad(x)))), shape (N, N).

    ``method``:
      "auto" (default) — the fused Pallas kernels (ops/dft_pallas.py) when
        running on TPU with a supported 3D volume, else "dft";
      "pallas" — force the fused Pallas kernels (interpret-mode on CPU);
      "dft"    — the MXU matmul-DFT pipeline (ops/dft_fft.py — 2.5x the
        jnp.fft path on v5e, runs everywhere);
      "fft"    — the per-axis jnp.fft path (ops/toeplitz_fft.py), kept as
        a cross-check.
    """

    def __init__(self, Tf, img_shape, name=None, method="auto"):
        assert method in ("auto", "pallas", "dft", "fft")
        img_shape = tuple(int(s) for s in img_shape)
        if method == "auto":
            from .ops import use_pallas
            from .ops.dft_pallas import pallas_supported
            method = ("pallas" if use_pallas() and pallas_supported(
                img_shape) else "dft")
        if method == "pallas":
            from .ops.dft_pallas import pallas_spectrum, pallas_supported
            assert pallas_supported(img_shape), (
                f"pallas path needs a 3D volume with dims multiple-of-8 "
                f"<=256, got {img_shape}")
            Tf = pallas_spectrum(np.asarray(Tf))  # host-side, once
        elif method == "dft":
            from .ops.dft_fft import block_spectrum
            Tf = block_spectrum(np.asarray(Tf))   # host-side, once
        self._T = jnp.asarray(Tf, dtype=jnp.float32)
        self._method = method
        self._vol = tuple(int(s) for s in img_shape)
        assert self._T.ndim == len(self._vol)
        self._name = name
        self._sigma = False

    @property
    def img_shape(self):
        return self._vol

    @property
    def shape(self):
        n = int(np.prod(self._vol))
        return (n, n)

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, x, adjoint=False):
        # self-adjoint: forward == adjoint. Zero-aware padded transforms
        # (corner embedding; circular convolution is translation invariant)
        # never touch the padding zeros.
        K = x.shape[1]
        v = x.reshape(self._vol + (K,)).astype(jnp.complex64)
        if self._method == "pallas":
            import jax
            from .ops.dft_pallas import toeplitz_apply_pallas

            v = jnp.moveaxis(v, -1, 0)          # (K, *vol): batch leading
            v = toeplitz_apply_pallas(
                self._T, v, interpret=jax.default_backend() == "cpu",
                sigma=self._sigma)
            v = jnp.moveaxis(v, 0, -1)
        elif self._method == "dft":
            from .ops.dft_fft import toeplitz_apply_block

            v = jnp.moveaxis(v, -1, 0)          # (K, *vol): batch leading
            v = toeplitz_apply_block(self._T, v)
            v = jnp.moveaxis(v, 0, -1)
        else:
            from .ops.toeplitz_fft import fft_pad2x, ifft_crop2x

            axes = tuple(range(len(self._vol)))
            V = fft_pad2x(v, axes)
            V = self._T[..., None] * V
            v = ifft_crop2x(V, axes)
        return v.reshape(-1, K).astype(jnp.complex64)

    def cost(self, ncols=1):
        K = ncols
        big = int(np.prod(self._T.shape))
        flops = 5 * big * max(1, int(np.log2(max(big, 2)))) * K * 4
        # zero-aware padded round trip: ~(2+4+8)/8 passes of big + T read
        return flops, int(1.75 * big * K * 8 * 2) + big * 4

    def _describe(self):
        return (f"{self.name}{list(self._vol)} <{self.shape[0]}x"
                f"{self.shape[1]}> (2x-grid {list(self._T.shape)})")

    def sigma_basis(self):
        """(K_sigma, P) with K == P.H * K_sigma * P — the solver-loop form
        for radix (>128-axis) volumes on the pallas path.

        The fused kernels' image basis is sigma (even|odd block) order on
        every >128 axis; in the natural basis each apply pays one HBM
        reorder pass per side (see ops/dft_pallas.py). For iterative
        solves, conjugate instead: run CG on K_sigma with rhs P*b and map
        the solution back with P.H — identical convergence (P is a
        permutation, so K_sigma is as SPD as K), zero per-iteration
        reorders.

            Ks, P = K.sigma_basis()
            x, info = cg(Ks, P * b, ...)
            x = P.H * x

        Returns (self, None) when no axis is radix or the method is not
        "pallas" (nothing to conjugate).
        """
        from .operators import Perm
        from .ops.dft_pallas import _sigma_axes

        axes = _sigma_axes(self._vol) if self._method == "pallas" else ()
        if not axes:
            return self, None
        idx = np.arange(int(np.prod(self._vol))).reshape(self._vol)
        for ax in axes:
            n = self._vol[ax]
            ev = np.take(idx, np.arange(0, n, 2), axis=ax)
            od = np.take(idx, np.arange(1, n, 2), axis=ax)
            idx = np.concatenate([ev, od], axis=ax)
        ks = ToeplitzNormal.__new__(ToeplitzNormal)
        ks._T = self._T
        ks._method = self._method
        ks._vol = self._vol
        ks._name = (self._name or "ToeplitzNormal") + "_sigma"
        ks._sigma = True
        return ks, Perm(idx.ravel(), name="SigmaBasis")

    def tree_flatten(self):
        return (self._T,), (self._vol, self._name, self._method,
                            self._sigma)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._T,) = children
        obj._vol, obj._name, obj._method, obj._sigma = aux
        return obj


def sense_normal_toeplitz(Tf, maps):
    """A^H A for multi-coil SENSE via the Toeplitz kernel:
    sum_c Diag(m_c)^H . Toep . Diag(m_c)  as an operator tree."""
    maps = np.asarray(maps)
    nc = maps.shape[0]
    img_shape = maps.shape[1:]
    T = ToeplitzNormal(Tf, img_shape, name="Toeplitz")
    coils = VStack(
        [Diag(maps[c].ravel().astype(np.complex64), name=f"Map{c}")
         for c in range(nc)], name="Coils")
    return coils.H * KronI(nc, T, name="PerCoil") * coils
