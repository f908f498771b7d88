"""Multi-chip END-TO-END SENSE reconstruction: k-space in, image out.

The single-chip serving pipeline (models/recon.SenseRecon) and the sharded
Toeplitz CG solvers (parallel/recon) meet here.

3D volumes: samples are partitioned across the mesh, each device executes
the scatter-free binned tile adjoint on its partition, the tiled grid is
psum_scatter'd into z-slabs of tiles over ICI, and the centered inverse
DFT + deapodized coil combine run slab-distributed (two all_to_all
transposes, mirroring parallel/dist_fft). The result feeds the existing
volume-sharded Toeplitz CG without ever gathering the volume onto one
device.

2D batches: a stack of S acquisitions (same trajectory/maps per slice) is
data-parallel over the mesh — each device builds the gridded rhs for its
slice shard with the replicated tile plan and runs the batched Toeplitz CG
locally (sense_batch_recon semantics; zero collectives in the solve).

Reference parity: the reference's whole workload is reconstruction from
k-space (SURVEY.md §0, §3.4) on ONE device; this is the multi-chip form the
TPU rebuild adds (SURVEY.md §5 long-context row). Numerics match the
single-chip pipeline: the same KB plan weights, the same fused pad+shift
DFT matrices (ops/dft_fft.centered_pad_dft_mat), the same Toeplitz CG.

Grid constraints are met by AUTO-PADDING: the oversampled grid is rounded
up per axis to its tile multiple, and (3D) grid_z further up so the z tile
count divides the mesh axis — a slightly larger effective oversampling on
the padded axes (never less accurate; the deapodization and DFT crop use
the padded grid consistently, and the Toeplitz kernel is built on its own
doubled grid either way). What cannot be padded away is raised: the slab
CG needs the IMAGE dims Nz and Ny divisible by the mesh axis size.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import cplx
from ..noncart import sort_trajectory, beatty_beta, deapodization, \
    pipe_menon_dcf, DEFAULT_TILES
from ..ops.dft_fft import centered_pad_dft_mat
from ..ops.tile_interp import (
    plan_tile_interp, merge_bin_layouts, _adjoint_binned, _unretile,
    _unretile2, _TILE_SLAB_ELEMS)
from ..toeplitz import toeplitz_kernel
from .recon import batched_cg, sense_normal_batched, sense_normal_volsharded

__all__ = ["SenseReconSharded", "sense_recon_sharded"]


def _dcf_weights(dcf, traj, img_shape, grid, width, beta):
    """Resolve the dcf argument to (M,) float32 weights — the same policy
    as models/recon.SenseRecon, plus the 'pipe_menon' device fixed point."""
    d = traj.shape[1]
    if dcf is None:
        return np.ones(len(traj), np.float32)
    if isinstance(dcf, str) and dcf == "radial":
        w = (np.sum(traj ** 2, axis=1) ** ((d - 1) / 2.0)
             + (0.5 / max(img_shape)) ** (d - 1)).astype(np.float32)
        return w / w.max()
    if isinstance(dcf, str) and dcf == "pipe_menon":
        return pipe_menon_dcf(traj, grid, width=width, beta=beta)
    return np.asarray(dcf, np.float32).ravel()


class SenseReconSharded:
    """Multi-chip SENSE reconstruction pipeline (k-space in, image out).

    The sharded sibling of :class:`~indigo_tpu.models.recon.SenseRecon`:
    same geometry conventions (traj in cycles/pixel, maps (nc, *img),
    dcf None|'radial'|'pipe_menon'|(M,) weights, Tikhonov ``lamda`` with
    the same gridding-error floor), but the work runs over
    ``mesh.shape[axis_name]`` devices:

    * 3D (maps (nc, Nz, Ny, Nx)): every stage — rhs build from k-space AND
      the Toeplitz CG — is sharded; samples are partitioned for the
      adjoint, the volume lives in z-slabs. ``__call__(y)`` takes one
      acquisition, y (nc, M) (or flat), returns (Nz, Ny, Nx).
    * 2D (maps (nc, Ny, Nx)): data-parallel over a BATCH of acquisitions.
      ``__call__(y)`` takes y (S, nc, M) (or (nc, M) for S=1) and returns
      (S, Ny, Nx); slices are padded to the mesh size and solved
      independently per device (sense_batch_recon semantics).

    Sample partitioning (3D): the trajectory is tile-sorted once (as on
    one chip), split into contiguous equal chunks (spatially coherent, so
    each device's adjoint bins stay dense), and each chunk gets its own
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
        if d not in (2, 3) or len(self.img_shape) != d:
            raise ValueError(
                f"traj is {d}-dim but maps imply {len(self.img_shape)}-dim "
                "(supported: 2D slice batches and 3D volumes)")
        self.ndim = d
        tile = DEFAULT_TILES[d]
        # auto-pad the oversampled grid to the divisibility the tiled
        # layouts need (see module docstring)
        grid = [int(2 * round(s * oversamp / 2)) for s in self.img_shape]
        grid = [-(-g // t) * t for g, t in zip(grid, tile)]
        if d == 3:
            grid[0] = -(-grid[0] // (tile[0] * p)) * (tile[0] * p)
        grid = tuple(grid)
        nt = tuple(g // t for g, t in zip(grid, tile))
        self.grid_shape, self.tile, self.nt = grid, tile, nt
        beta = beatty_beta(width, oversamp)

        w = _dcf_weights(dcf, traj, self.img_shape, grid, width, beta)

        if d == 3:
            Nz, Ny, Nx = self.img_shape
            if Nz % p or Ny % p:
                raise ValueError(
                    f"mesh axis size {p} must divide the image dims "
                    f"Nz={Nz} and Ny={Ny} (z-slab CG all_to_all splits); "
                    "grid divisibility is auto-padded, image dims cannot "
                    "be")
            self._init_3d(traj, w, width, beta)
        else:
            self._init_2d(traj, w, width, beta)

        # Toeplitz kernel + lamda floor (same policy as SenseRecon; the
        # kernel lives on its own doubled grid, independent of the padded
        # rhs grid)
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
        if d == 3:
            self._fn = self._build_3d()
        else:
            self._fn2d = None  # built lazily on first call

    # ---------------------------------------------------------- 3D

    def _init_3d(self, traj, w, width, beta):
        p, grid, tile = self._p, self.grid_shape, self.tile
        d = 3
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

    def _build_3d(self):
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

    # ---------------------------------------------------------- 2D

    def _init_2d(self, traj, w, width, beta):
        grid, tile = self.grid_shape, self.tile
        # one replicated plan (tile-sorted for bin density); y rows follow
        # the same perm at call time
        perm = sort_trajectory(traj, grid, tile=tile)
        self.perm, self.n_samples = perm, len(traj)
        self._w_sorted = w[perm].astype(np.float32)
        plan = plan_tile_interp(traj[perm], grid, width=width, beta=beta,
                                adjoint="binned", forward="dense")
        assert plan.ext == grid and not any(plan.pad_lo)
        self._plan = plan

    def _build_2d(self):
        mesh, ax = self.mesh, self.axis_name
        nc, nt, tile, grid = self.nc, self.nt, self.tile, self.grid_shape
        NT = int(np.prod(nt))
        iters, lamda = self.iters, self.lamda
        K = 2 * nc
        n = int(np.prod(self.img_shape))

        def block(plan_r, wy_l, By, Bx, dam, Tf, maps):
            # wy_l (Sl, M, nc) complex — this device's slice shard
            def rhs_one(wy):
                w2 = jnp.concatenate([jnp.real(wy), jnp.imag(wy)],
                                     axis=1).astype(jnp.float32)
                xt = _adjoint_binned(plan_r, w2, K, NT)
                xe = _unretile(xt, nt, tile, K, 2, grid)
                xc = lax.complex(xe[:nc], xe[nc:])    # (nc, Gy, Gx)
                u = jnp.einsum("cyx,Yy->cYx", xc, By, precision="highest")
                u = jnp.einsum("cyx,Xx->cyX", u, Bx, precision="highest")
                return jnp.sum(jnp.conj(dam) * u, axis=0).reshape(-1)

            rhs_l = lax.map(rhs_one, wy_l)            # (Sl, n)

            def mv(v):
                return sense_normal_batched(Tf, maps, v)

            xs, resids = batched_cg(mv, rhs_l, lamda=lamda, iters=iters)
            return xs.reshape(-1, *self.img_shape), resids

        from jax import shard_map
        run = shard_map(
            block, mesh=mesh,
            in_specs=(P(), P(ax), P(), P(), P(), P(), P()),
            out_specs=(P(ax, None, None), P(None, ax)))
        return cplx.cjit(run)

    # ---------------------------------------------------------- call

    def __call__(self, y, return_resids=False):
        """Reconstruct from k-space.

        3D: y one acquisition, coil-major (nc*M,) or (nc, M) -> (Nz,Ny,Nx).
        2D: y a batch (S, nc, M) (or (nc, M) for S=1) -> (S, Ny, Nx).
        Returns host complex (and residual history with
        ``return_resids=True``)."""
        y = np.asarray(y)
        if self.ndim == 3:
            if y.size != self.nc * self.n_samples:
                raise ValueError(
                    f"expected {self.nc}x{self.n_samples} samples, got "
                    f"{y.shape}")
            y = y.reshape(self.nc, -1)
            # sort+chunk+weight: (p, Mc, nc), padded rows weighted to zero
            ys = y[:, self._chunks]                  # (nc, p, Mc)
            wy = (self._w_chunks[None] * ys).transpose(1, 2, 0)
            x, resids = self._fn(self._plans, wy.astype(np.complex64),
                                 *self._Bmats, self._dam, self._Tf,
                                 self._maps)
            if return_resids:
                return x, np.asarray(resids)
            return x

        # 2D slice batch
        if y.ndim == 2 and y.shape == (self.nc, self.n_samples):
            y = y[None]
        if y.ndim != 3 or y.shape[1:] != (self.nc, self.n_samples):
            raise ValueError(
                f"expected (S, {self.nc}, {self.n_samples}) 2D batch, got "
                f"{y.shape}")
        S = y.shape[0]
        p = self._p
        Sp = -(-S // p) * p
        wy = (self._w_sorted * y[..., self.perm]).transpose(0, 2, 1)
        if Sp != S:
            wy = np.concatenate(
                [wy, np.zeros((Sp - S,) + wy.shape[1:], wy.dtype)])
        if self._fn2d is None:
            self._fn2d = self._build_2d()
        x, resids = self._fn2d(self._plan, wy.astype(np.complex64),
                               *self._Bmats, self._dam, self._Tf,
                               self._maps)
        x = np.asarray(x)[:S]
        if return_resids:
            return x, np.asarray(resids)[:, :S]
        return x


def sense_recon_sharded(traj, maps, y, mesh, **kw):
    """One-shot multi-chip end-to-end recon: build + solve. See
    :class:`SenseReconSharded` (reuse that for repeated acquisitions)."""
    return SenseReconSharded(traj, maps, mesh, **kw)(y)
