"""Multi-chip END-TO-END SENSE reconstruction: k-space in, image out.

The single-chip serving pipeline (models/recon.SenseRecon) and the sharded
Toeplitz CG solvers (parallel/recon) meet here: the gridded rhs build
``A^H W y`` itself runs under shard_map — samples are partitioned across
the mesh, each device executes the scatter-free binned tile adjoint on its
partition, the tiled grid is psum_scatter'd into z-slabs of tiles over ICI,
and the centered inverse DFT + deapodized coil combine run slab-distributed
(two all_to_all transposes, mirroring parallel/dist_fft). The result feeds
the existing volume-sharded Toeplitz CG without ever gathering the volume
onto one device.

Reference parity: the reference's whole workload is reconstruction from
k-space (SURVEY.md §0, §3.4) on ONE device; this is the multi-chip form the
TPU rebuild adds (SURVEY.md §5 long-context row). Numerics match the
single-chip pipeline: the same KB plan weights, the same fused pad+shift
DFT matrices (ops/dft_fft.centered_pad_dft_mat), the same Toeplitz CG.

Constraints (asserted at build): every grid dim divisible by its tile
(periodic no-halo tiling, so the tiled grid is a pure transpose of the
oversampled grid), nt_z and Nz and Ny divisible by the mesh axis size.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import cplx
from ..noncart import sort_trajectory, beatty_beta, deapodization, \
    DEFAULT_TILES
from ..ops.dft_fft import centered_pad_dft_mat
from ..ops.tile_interp import (
    plan_tile_interp, merge_bin_layouts, _adjoint_binned, _unretile,
    _unretile2, _TILE_SLAB_ELEMS)
from ..toeplitz import toeplitz_kernel
from .recon import batched_cg, sense_normal_volsharded

__all__ = ["SenseReconSharded", "sense_recon_sharded"]


class SenseReconSharded:
    """Multi-chip SENSE reconstruction pipeline (k-space in, image out).

    The sharded sibling of :class:`~indigo_tpu.models.recon.SenseRecon`:
    same geometry conventions (traj in cycles/pixel, maps (nc, *img),
    dcf None|'radial'|(M,) weights, Tikhonov ``lamda`` with the same
    gridding-error floor), but every stage — rhs build from k-space AND
    the Toeplitz CG — runs sharded over ``mesh.shape[axis_name]`` devices.

    Sample partitioning: the trajectory is tile-sorted once (as on one
    chip), split into contiguous equal chunks (spatially coherent, so each
    device's adjoint bins stay dense), and each chunk gets its own
    tile-interp plan padded to a common bin layout
    (ops/tile_interp.merge_bin_layouts) so the p plans stack into the
    shard_map device axis.
    """

    def __init__(self, traj, maps, mesh, axis_name="vol", oversamp=1.25,
                 width=4, lamda=None, iters=30, dcf="radial"):
        traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
        maps = np.asarray(maps, dtype=np.complex64)
        self.nc = int(maps.shape[0])
        self.img_shape = tuple(int(s) for s in maps.shape[1:])
        self.iters = int(iters)
        self.mesh, self.axis_name = mesh, axis_name
        p = int(mesh.shape[axis_name])
        self._p = p
        d = traj.shape[1]
        if d != 3:
            raise ValueError("SenseReconSharded supports 3D volumes; use "
                             "sense_batch_recon for 2D batches")
        Nz, Ny, Nx = self.img_shape
        grid = tuple(int(2 * round(s * oversamp / 2)) for s in
                     self.img_shape)
        tile = DEFAULT_TILES[3]
        if any(g % t for g, t in zip(grid, tile)):
            raise ValueError(
                f"grid {grid} not divisible by tile {tile}; pick n/oversamp "
                "with tile-divisible grid dims (periodic no-halo tiling)")
        nt = tuple(g // t for g, t in zip(grid, tile))
        if nt[0] % p or Nz % p or Ny % p or (2 * Ny) % p:
            raise ValueError(
                f"mesh axis size {p} must divide nt_z={nt[0]}, Nz={Nz}, "
                f"and Ny={Ny}")
        self.grid_shape, self.tile, self.nt = grid, tile, nt
        beta = beatty_beta(width, oversamp)

        # DCF (as SenseRecon)
        if dcf is None:
            w = np.ones(len(traj), np.float32)
        elif isinstance(dcf, str) and dcf == "radial":
            w = (np.sum(traj ** 2, axis=1) ** ((d - 1) / 2.0)
                 + (0.5 / max(self.img_shape)) ** (d - 1)).astype(np.float32)
            w /= w.max()
        else:
            w = np.asarray(dcf, np.float32).ravel()

        # tile-sort globally, partition into contiguous equal chunks
        # (pad = repeat of the last sample with ZERO dcf weight, so padded
        # rows contribute nothing to the rhs)
        perm = sort_trajectory(traj, grid, tile=tile)
        M = len(traj)
        Mc = -(-M // p)
        pad_ix = np.concatenate(
            [perm, np.full(p * Mc - M, perm[-1], dtype=perm.dtype)])
        self.perm, self.n_samples, self._Mc = perm, M, Mc
        self._chunks = pad_ix.reshape(p, Mc)
        wpad = np.concatenate(
            [w[perm], np.zeros(p * Mc - M, np.float32)]).reshape(p, Mc)
        self._w_chunks = wpad

        # per-chunk plans padded to the merged bin layout, stacked on a
        # leading device axis (adjoint-only: no grouped-forward build)
        traj_s = traj[pad_ix]
        chunks_t = traj_s.reshape(p, Mc, d)
        layouts = [plan_tile_interp(chunks_t[i], grid, width=width,
                                    beta=beta, adjoint="layout",
                                    forward="dense")
                   for i in range(p)]
        layout = merge_bin_layouts(layouts)
        plans = [plan_tile_interp(chunks_t[i], grid, width=width, beta=beta,
                                  adjoint="binned", forward="dense",
                                  bin_layout=layout)
                 for i in range(p)]
        assert all(pl.ext == grid and not any(pl.pad_lo) for pl in plans)
        self._plans = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *plans)

        # Toeplitz kernel + lamda floor (same policy as SenseRecon)
        Tf, info = toeplitz_kernel(traj, self.img_shape, oversamp=oversamp,
                                   width=width, weights=w, return_info=True,
                                   warn=False)
        self.kernel_info = info
        eps = 10.0 ** (1 - width) * (3.0 if oversamp < 1.25 else 1.0)
        self.lamda_floor = eps * info["max"]
        if lamda is None:
            self.lamda = max(1e-3 * info["max"], self.lamda_floor)
        else:
            self.lamda = float(lamda)
        self._Tf = np.asarray(Tf, np.float32)

        # adjoint of the fused centered pad+DFT: exact conjugate
        # transposes of the single-chip CenteredDFT factors
        self._Bmats = tuple(
            np.conj(centered_pad_dft_mat(n, g)).T.copy()
            for n, g in zip(self.img_shape, grid))
        da = deapodization(self.img_shape, grid, width=width, beta=beta)
        self._dam = (da[None] * maps).astype(np.complex64)
        self._maps = maps
        self._fn = self._build()

    def _build(self):
        mesh, ax, p = self.mesh, self.axis_name, self._p
        nc, nt, tile = self.nc, self.nt, self.tile
        NT = int(np.prod(nt))
        grid = self.grid_shape
        iters, lamda = self.iters, self.lamda
        K = 2 * nc
        nt_s = (nt[0] // p,) + nt[1:]
        E_s = (grid[0] // p,) + grid[1:]

        def block(plan_l, wy_l, Bz, By, Bx, dam_l, Tf_l, maps_l):
            plan_l = jax.tree_util.tree_map(lambda a: a[0], plan_l)
            wy = wy_l[0]                              # (Mc, nc) complex
            wy = jnp.concatenate([jnp.real(wy), jnp.imag(wy)],
                                 axis=1).astype(jnp.float32)
            xt = _adjoint_binned(plan_l, wy, K, NT)   # (NT, K*128) partial
            xt = lax.psum_scatter(xt, ax, scatter_dimension=0, tiled=True)
            if xt.size > _TILE_SLAB_ELEMS:
                xe = _unretile2(xt, nt_s, tile, K, E_s)
            else:
                xe = _unretile(xt, nt_s, tile, K, 3, E_s)
            xc = lax.complex(xe[:nc], xe[nc:])        # (nc, Gz/p, Gy, Gx)
            # crop + centered inverse DFT, slab-distributed: local y/x
            # contractions, z localized by one all_to_all round trip
            u = jnp.einsum("czyx,Yy->czYx", xc, By, precision="highest")
            u = jnp.einsum("czyx,Xx->czyX", u, Bx, precision="highest")
            u = lax.all_to_all(u, ax, split_axis=2, concat_axis=1,
                               tiled=True)            # (nc, Gz, Ny/p, Nx)
            u = jnp.einsum("czyx,Zz->cZyx", u, Bz, precision="highest")
            u = lax.all_to_all(u, ax, split_axis=1, concat_axis=2,
                               tiled=True)            # (nc, Nz/p, Ny, Nx)
            rhs_l = jnp.sum(jnp.conj(dam_l) * u, axis=0)

            def mv(v):
                out = sense_normal_volsharded(
                    Tf_l, maps_l, v.reshape(maps_l.shape[1:]), ax)
                return out.reshape(1, -1)

            xs, resids = batched_cg(mv, rhs_l.reshape(1, -1), lamda=lamda,
                                    iters=iters, psum_axis=ax)
            return xs.reshape(maps_l.shape[1:]), resids[:, 0]

        from jax import shard_map
        plan_specs = jax.tree_util.tree_map(lambda _: P(ax), self._plans)
        run = shard_map(
            block, mesh=mesh,
            in_specs=(plan_specs, P(ax), P(), P(), P(),
                      P(None, ax, None, None),     # dam: z slabs
                      P(None, ax, None),           # Tf: y slabs (2N grid)
                      P(None, ax, None, None)),    # maps: z slabs
            out_specs=(P(ax, None, None), P()))
        return cplx.cjit(run)

    def __call__(self, y, return_resids=False):
        """Reconstruct from k-space y (user order, coil-major (nc*M,) or
        (nc, M)). Returns a host complex volume (and residuals)."""
        y = np.asarray(y)
        if y.size != self.nc * self.n_samples:
            raise ValueError(
                f"expected {self.nc}x{self.n_samples} samples, got {y.shape}")
        y = y.reshape(self.nc, -1)
        # sort+chunk+weight: (p, Mc, nc), padded rows weighted to zero
        ys = y[:, self._chunks]                      # (nc, p, Mc)
        wy = (self._w_chunks[None] * ys).transpose(1, 2, 0)
        x, resids = self._fn(self._plans, wy.astype(np.complex64),
                             *self._Bmats, self._dam, self._Tf, self._maps)
        if return_resids:
            return x, np.asarray(resids)
        return x


def sense_recon_sharded(traj, maps, y, mesh, **kw):
    """One-shot multi-chip end-to-end recon: build + solve. See
    :class:`SenseReconSharded` (reuse that for repeated acquisitions)."""
    return SenseReconSharded(traj, maps, mesh, **kw)(y)
