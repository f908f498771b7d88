"""SENSE / NUFFT forward-model builders.

Reference parity: the user-script composition layer of the reference
(SURVEY.md §3.4): build G (gridding CSR), D (apodization), F (FFT), S (coil
maps), compose A = G F D S per coil via KronI/BlockDiag, optimize, solve.
Here each builder returns a ready-made operator tree over the same algebra.

Layout conventions (column-batched, like the reference):
  * image vectors are flattened C-order, shape (prod(img_shape), K)
  * multi-coil k-space is coil-major stacked: shape (ncoil*M, K)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..operators import (
    Operator, SpMatrix, KBInterp, Diag, UnscaledFFT, CenteredDFT, GridDFT,
    KronI, VStack, Scale, Product, CropPad, Perm, Mask,
)
from .. import noncart
from ..noncart import (
    interp_mat, deapodization, zpad_mat, checkerboard, beatty_beta,
    sort_trajectory, tiled_order, DEFAULT_TILES,
)

__all__ = [
    "centered_fft_op", "nufft_op", "sense_nufft_op", "cartesian_sense_op",
    "NufftPlan",
]


def centered_fft_op(shape, dtype=np.complex64):
    """Centered FFT  fftshift . fft . ifftshift  as D_out * F * D_in.

    The shift diagonals are exact (+-1) checkerboards for even dims — real
    f32 multiplies the VPU fuses into the FFT's neighbors.
    """
    din = Diag(checkerboard(shape), name="fftshift_in")
    dout = Diag(checkerboard(shape, shifted=True), name="fftshift_out")
    return dout * UnscaledFFT(shape, dtype=dtype) * din


@dataclass
class NufftPlan:
    """Host-side plan for a NUFFT operator (geometry + permutation).

    ``perm`` maps user sample order -> internal (cell-sorted) order; k-space
    data must be permuted accordingly: y_internal = y_user[perm]. For normal
    operators (A^H A) the permutation cancels and can be ignored.
    """
    img_shape: tuple
    grid_shape: tuple
    traj: np.ndarray
    width: int
    beta: float
    perm: np.ndarray
    oversamp: float
    deapod: np.ndarray = None  # real deapodization array (img_shape)

    @property
    def n_samples(self):
        return len(self.traj)

    def sort_samples(self, a, axis=0, ncoil=1):
        """Reorder per-sample data (user order -> internal order). For
        coil-stacked arrays pass ncoil: each (M,) block is permuted."""
        a = np.asarray(a)
        if ncoil == 1:
            return np.take(a, self.perm, axis=axis)
        M = self.n_samples
        idx = (np.arange(ncoil)[:, None] * M + self.perm[None, :]).ravel()
        return np.take(a, idx, axis=axis)

    def unsort_samples(self, a, axis=0, ncoil=1):
        """Inverse of sort_samples (internal order -> user order)."""
        inv = np.empty_like(self.perm)
        inv[self.perm] = np.arange(len(self.perm))
        a = np.asarray(a)
        if ncoil == 1:
            return np.take(a, inv, axis=axis)
        M = self.n_samples
        idx = (np.arange(ncoil)[:, None] * M + inv[None, :]).ravel()
        return np.take(a, idx, axis=axis)


def nufft_op(traj, img_shape, oversamp=1.5, width=4, beta=None, sort=True,
             col_tiling=None, deapod=True, interp="auto", fft="auto",
             name="NUFFT"):
    """Type-2 NUFFT operator A: image -> k-space samples.

    A = G [. P] . Fc . Z . Da  with G the KB gridding interpolation, Fc the
    centered FFT on the oversampled grid, Z centered zero-padding, Da the
    real deapodization diagonal. Returns (A, plan).

    ``fft`` selects how Fc . Z is executed:
      * 'mm'   — ONE fused :class:`CenteredDFT` leaf: per-axis MXU matmul-
        DFT with the pad and fftshift checkerboards folded into the
        matrices (no padded volume, no shift passes, no Bluestein for
        non-pow2 grids like 320). Exactly equal to the chain. When
        ``interp='tile'`` lands on a periodic no-halo tiling (every grid
        dim divisible by its tile — all production grids), G and Fc . Z
        further fuse into ONE :class:`GridDFT` leaf whose adjoint
        contracts the tiled grid layout directly (no untile transpose).
      * 'xla'  — the explicit Fc . Z chain over XLA's FFT.
      * 'auto' — 'mm' when every grid dim is even and <= 512 (where the
        matmul-DFT measures faster than the XLA FFT on TPU and the
        matrices stay tiny), else 'xla'.

    ``interp`` selects the G leaf:
      * 'sparse' — blocked-ELL/jag :class:`SpMatrix` (Pallas SpMM on TPU).
        With ``col_tiling`` (default on when the grid is tileable), P is an
        MXU-friendly Morton grid re-tiling permutation (noncart.tiled_order)
        packing each KB patch into few 128-lane blocks — measured ~1.3x on
        the 2D radial jag Pallas applies (fill 0.030 -> 0.041).
      * 'tile' — :class:`KBInterp` tile-gather leaf (separable KB weights,
        128-lane grid-tile gathers). The right choice whenever blocked
        tiles would blow up — all 3D gridding matrices in practice.
      * 'auto' — 'tile' for 3D (blocked tiles blow up at ~1% fill on every
        3D gridding matrix in practice, and the tile path measured 5-30x
        faster); for 1D/2D a probe-subset blocked-tile memory estimate
        against SpMatrix.MAX_TILE_BYTES decides. The probe scales its
        estimate linearly in rows, which can overestimate very tall
        adjoints — pass ``interp`` explicitly to pin the choice.

    Semantics (see noncart module docstring):
        (A x)_i ~= sum_j x[j] exp(-2 pi i k_i . (j - N//2))
    """
    traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
    img_shape = tuple(int(n) for n in img_shape)
    grid_shape = tuple(int(2 * round(n * oversamp / 2)) for n in img_shape)
    if beta is None:
        beta = beatty_beta(width, oversamp)

    if col_tiling is None:   # default: on for the sparse leaf (measured win)
        col_tiling = interp != "tile"
    tile = DEFAULT_TILES.get(len(img_shape)) if col_tiling else None
    if tile is not None and any(g % t for g, t in zip(grid_shape, tile)):
        tile = None  # grid not tileable; fall back to row-major columns

    if sort:
        perm = sort_trajectory(traj, grid_shape, tile=tile)
        traj_s = traj[perm]
    else:
        perm = np.arange(len(traj))
        traj_s = traj

    chain = []
    if interp == "auto":
        # tile-gather for every 2D/3D gridding matrix: 3D blocked tiles
        # blow up at ~1% fill (tile path measured 5-30x faster), and on 2D
        # the tile path measured faster at every benchmarked scale too
        # (64^2: 4.7x, 128^2 radial: 2.1x, 256^2: 1.4x on the A^H A apply
        # -- see tools/gridded_profile.py; the jag SpMM runs at ~3% of its
        # traffic floor because fill ~0.04 wastes the MXU). 1D keeps the
        # blocked-ELL SpMatrix (dense enough to tile well).
        interp = "tile" if len(img_shape) >= 2 else "sparse"
    if interp == "tile":
        from ..ops.tile_interp import plan_tile_interp
        # reorder=True: the plan groups samples by super-tile span so the
        # forward skips its output-reorder gather; fold the group
        # permutation into this operator's sample order (perm/traj_s)
        tplan = plan_tile_interp(traj_s, grid_shape, width=width,
                                 beta=beta, reorder=True)
        if tplan.sample_perm is not None:
            perm = perm[tplan.sample_perm]
            traj_s = traj_s[tplan.sample_perm]
        G = KBInterp(tplan, name="Gridding")
    else:
        Gcsr = interp_mat(traj_s, grid_shape, width=width, beta=beta)
        if tile is not None:
            cperm = tiled_order(grid_shape, tile)
            inv = np.empty_like(cperm)
            inv[cperm] = np.arange(len(cperm))
            Gcsr = Gcsr.tocsr(copy=True)
            Gcsr.indices = inv[Gcsr.indices].astype(Gcsr.indices.dtype)
            Gcsr.has_sorted_indices = False
            chain.append(Perm(cperm, name="GridTiling"))
        G = SpMatrix(Gcsr, name="Gridding")
    if fft == "auto":
        fft = ("mm" if all(g % 2 == 0 and g <= 512 for g in grid_shape)
               else "xla")
    da = deapodization(img_shape, grid_shape, width=width, beta=beta)
    if (fft == "mm" and interp == "tile"
            and tuple(G.plan.ext) == grid_shape):
        # periodic no-halo tiling: fuse gridding + padded DFT into ONE
        # leaf whose adjoint contracts the tiled grid layout directly
        # (no untile transpose — see operators.GridDFT)
        G = GridDFT(G.plan, img_shape, name="GridDFT")
        factors = []
    elif fft == "mm":
        factors = chain + [CenteredDFT(img_shape, grid_shape, name="PadDFT")]
    else:
        Fc = centered_fft_op(grid_shape)
        Z = CropPad(img_shape, grid_shape, name="Zpad")
        factors = chain + [Fc, Z]
    if deapod:
        factors.append(Diag(da, name="Deapod"))
    A = G
    for opn in factors:
        A = A * opn
    A._name = name
    plan = NufftPlan(img_shape, grid_shape, traj_s, width, float(beta),
                     perm, float(oversamp), deapod=da)
    return A, plan


def sense_nufft_op(traj, maps, oversamp=1.5, width=4, beta=None, sort=True,
                   fft="auto", interp="auto", col_tiling=None):
    """Multi-coil SENSE NUFFT operator: (ncoil*M, prod(img)).

    maps: (ncoil, *img_shape) complex coil sensitivities.
    A = KronI(nc, G Fc Z) . VStack([Diag(Da * map_c)]) — the deapodization
    is folded into the per-coil diagonals (one fewer pass over the image,
    the kind of fusion the reference's RealizeMatrices pass chased).
    ``fft``/``interp``/``col_tiling`` pass through to :func:`nufft_op`.
    """
    maps = np.asarray(maps)
    nc = maps.shape[0]
    img_shape = maps.shape[1:]
    # build the shared core WITHOUT its deapod diagonal and fold the
    # deapodization into the per-coil map diagonals (one fewer image pass)
    G_FcZ, plan = nufft_op(
        traj, img_shape, oversamp=oversamp, width=width, beta=beta,
        sort=sort, deapod=False, fft=fft, interp=interp,
        col_tiling=col_tiling)
    coils = VStack(
        [Diag((plan.deapod * maps[c]).ravel().astype(np.complex64),
              name=f"Map{c}") for c in range(nc)],
        name="Coils")
    A = KronI(nc, G_FcZ, name="PerCoil") * coils
    return A, plan


def cartesian_sense_op(mask, maps):
    """Cartesian multi-coil SENSE: A = KronI(nc, P Fc) . VStack(Diag maps).

    mask: boolean array over the image grid (sampled k-space locations, in
    centered/fftshifted order); maps: (ncoil, *img_shape).

    P is the structured :class:`~indigo_tpu.operators.Mask` row-selection
    leaf (one gather per direction) — the reference encodes this 0/1
    matrix as a sparse SpMatrix and pays a csrmm for it (SURVEY.md §3.4);
    exactly equal, structurally free on TPU.
    """
    maps = np.asarray(maps)
    nc = maps.shape[0]
    img_shape = maps.shape[1:]
    core = (Mask.from_bool(mask, name="Sampling")
            * centered_fft_op(img_shape))
    coils = VStack(
        [Diag(maps[c].ravel().astype(np.complex64), name=f"Map{c}")
         for c in range(nc)], name="Coils")
    return KronI(nc, core, name="PerCoil") * coils
