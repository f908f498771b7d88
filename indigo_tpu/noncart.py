"""Non-Cartesian NUFFT support: Kaiser-Bessel gridding matrix + apodization.

Reference parity: indigo/noncart.py (unverified — mount empty; SURVEY.md §2
"NUFFT gridding builder"): builds the CSR interpolation (gridding) matrix
from a non-Cartesian k-space trajectory with a Kaiser-Bessel kernel, plus the
matching deapodization correction and oversampled-grid geometry.

TPU-first details beyond the reference:
  * rows (k-space samples) are optionally sorted by grid cell so nearby
    samples land in the same blocked-ELL row block — this is what makes the
    MXU tiling dense (SURVEY.md §7 "hard parts": ELL padding blow-up).
  * centered-FFT phase diagonals are (+-1) checkerboards (real f32, exact),
    not complex exponentials.

Conventions:
  * trajectories are (M, d) arrays in cycles/pixel, range [-0.5, 0.5).
  * the image of shape N is centered at pixel N//2; the forward model equals
    s_i = sum_j x[j] * exp(-2*pi*i * k_i . (j - N//2))  (type-2 NUFFT),
    which the oracle in indigo_tpu.oracle evaluates directly.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = [
    "kaiser_bessel", "beatty_beta", "interp_mat", "deapodization",
    "zpad_mat", "checkerboard", "sort_trajectory", "pipe_menon_dcf",
    "tiled_order", "DEFAULT_TILES",
]

# Column-retiling tiles: 128 grid nodes per lane-block, shaped so a KB patch
# (width^d nodes) touches few blocks. Chosen per rank.
DEFAULT_TILES = {1: (128,), 2: (8, 16), 3: (4, 4, 8)}


def _morton_key(coords):
    """Interleave the bits of integer coordinate arrays (d, n) -> (n,)."""
    coords = np.asarray(coords, dtype=np.uint64)
    d, n = coords.shape
    nbits = max(1, int(np.max(coords)).bit_length()) if coords.size else 1
    key = np.zeros(n, dtype=np.uint64)
    for b in range(nbits):
        for axis in range(d):
            bit = (coords[axis] >> np.uint64(b)) & np.uint64(1)
            key |= bit << np.uint64(b * d + (d - 1 - axis))
    return key


def tiled_order(grid_shape, tile=None):
    """Permutation ordering grid nodes tile-by-tile, tiles in Morton order.

    Row-major linearization spreads a KB interpolation patch (w consecutive
    nodes in the last axis times w rows/planes) across w..w^2 different
    128-node lane blocks; ordering the grid in (e.g.) 4x4x8 tiles packs a
    patch into ~2^d blocks. Tiles themselves follow a Morton (Z-order)
    curve so spatial neighbors stay close in memory — this is what keeps
    the *adjoint* tiling dense too. Apply as G[:, perm] on the matrix and a
    Perm operator on the grid vector.
    """
    grid_shape = tuple(int(g) for g in grid_shape)
    nd = len(grid_shape)
    if tile is None:
        tile = DEFAULT_TILES[nd]
    tile = tuple(int(t) for t in tile)
    for g, t in zip(grid_shape, tile):
        if g % t:
            raise ValueError(f"grid {grid_shape} not divisible by tile {tile}")
    nblocks = tuple(g // t for g, t in zip(grid_shape, tile))
    bidx = np.indices(nblocks).reshape(nd, -1)
    morder = np.argsort(_morton_key(bidx), kind="stable")
    # node index array grouped as (blocks..., intra...)
    idx = np.arange(int(np.prod(grid_shape))).reshape(grid_shape)
    blk = []
    for g, t in zip(grid_shape, tile):
        blk.extend([g // t, t])
    v = idx.reshape(blk)
    order = list(range(0, 2 * nd, 2)) + list(range(1, 2 * nd, 2))
    v = np.ascontiguousarray(v.transpose(order)).reshape(
        int(np.prod(nblocks)), int(np.prod(tile)))
    return v[morder].ravel()


def kaiser_bessel(t, width, beta):
    """Kaiser-Bessel kernel value at offset ``t`` (|t| <= width/2)."""
    t = np.asarray(t, dtype=np.float64)
    x = 1.0 - (2.0 * t / width) ** 2
    x = np.clip(x, 0.0, None)
    return np.i0(beta * np.sqrt(x)) / np.i0(beta)


def beatty_beta(width, oversamp):
    """Optimal KB shape parameter (Beatty, Nishimura & Pauly 2005)."""
    return np.pi * np.sqrt(
        (width / oversamp) ** 2 * (oversamp - 0.5) ** 2 - 0.8)


def sort_trajectory(traj, grid_shape, tile=None):
    """Permutation sorting samples by grid cell for locality.

    With ``tile``, samples are sorted by their cell's *tile block* (matching
    tiled_order's column layout) so nearby samples hit the same lane blocks.
    """
    traj = np.asarray(traj)
    G = np.asarray(grid_shape)
    c = (traj + 0.5) % 1.0 * G  # cell coordinate in [0, G)
    cell = np.floor(c).astype(np.int64)
    if tile is not None:
        blocks = np.stack([cell[:, d] // tile[d]
                           for d in range(traj.shape[1])])
        key = _morton_key(blocks)
    else:
        key = np.zeros(len(traj), dtype=np.int64)
        for d in range(traj.shape[1]):
            key = key * G[d] + cell[:, d]
    return np.argsort(key, kind="stable")


def interp_mat(traj, grid_shape, width=4, beta=None, chunk=1 << 16,
               impl="auto"):
    """Gridding/interpolation CSR matrix (M, prod(grid_shape)).

    Row i holds the KB weights interpolating the *centered* oversampled
    spectrum at grid coordinate traj[i]*G + G/2, with periodic wraparound.
    ``impl``: 'native' (multithreaded C++ builder, indigo_tpu.native),
    'numpy' (vectorized chunked fallback), or 'auto'.
    """
    traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
    M, ndim = traj.shape
    G = tuple(int(g) for g in grid_shape)
    assert len(G) == ndim, (G, ndim)
    if beta is None:
        beta = beatty_beta(width, 2.0)
    Ntot = int(np.prod(G))

    if impl in ("auto", "native"):
        from . import native
        out = native.kb_interp_ell(traj, G, width, float(beta)) \
            if native.available() else None
        if out is not None:
            cols, wts = out
            row_nnz = cols.shape[1]
            indptr = np.arange(M + 1, dtype=np.int64) * row_nnz
            A = sp.csr_matrix(
                (wts.ravel(), cols.ravel(), indptr), shape=(M, Ntot))
            A.sum_duplicates()
            return A
        if impl == "native":
            raise RuntimeError("native gridding builder unavailable")

    parts = []
    for lo in range(0, M, chunk):
        t = traj[lo:lo + chunk]
        m = len(t)
        cols = np.zeros((m, 1), dtype=np.int64)
        wts = np.ones((m, 1), dtype=np.float64)
        for d in range(ndim):
            c = (t[:, d] + 0.5) * G[d]  # centered grid coordinate
            base = np.ceil(c - width / 2.0).astype(np.int64)
            offs = np.arange(width)
            idx = base[:, None] + offs[None, :]          # (m, width)
            w_d = kaiser_bessel(c[:, None] - idx, width, beta)
            idx = np.mod(idx, G[d])
            cols = cols[:, :, None] * G[d] + idx[:, None, :]
            wts = wts[:, :, None] * w_d[:, None, :]
            cols = cols.reshape(m, -1)
            wts = wts.reshape(m, -1)
        nnz_row = cols.shape[1]
        rows = np.repeat(np.arange(lo, lo + m), nnz_row)
        parts.append(sp.coo_matrix(
            (wts.ravel().astype(np.float32), (rows, cols.ravel())),
            shape=(M, Ntot)))
    A = parts[0] if len(parts) == 1 else sum(parts[1:], parts[0])
    A = A.tocsr()
    A.sum_duplicates()
    return A


def _apod_1d(G, N, width, beta, quad_pts=2001):
    """A(x) = FT of the KB kernel at image offsets; numeric quadrature."""
    t = np.linspace(-width / 2.0, width / 2.0, quad_pts)
    kbv = kaiser_bessel(t, width, beta)
    x = (np.arange(N) - N // 2) / float(G)  # cycles per grid unit
    ph = np.cos(2.0 * np.pi * t[None, :] * x[:, None])
    A = np.trapezoid(kbv[None, :] * ph, t, axis=1)
    return A


def deapodization(img_shape, grid_shape, width=4, beta=None):
    """Real deapodization array (img_shape): 1 / FT(KB) per axis, outer prod."""
    if beta is None:
        beta = beatty_beta(width, 2.0)
    out = np.ones((), dtype=np.float64)
    for N, G in zip(img_shape, grid_shape):
        a = _apod_1d(G, N, width, beta)
        out = np.multiply.outer(out, 1.0 / a)
    return out.astype(np.float32)


def zpad_mat(img_shape, grid_shape):
    """Sparse 0/1 matrix (prod(grid), prod(img)) embedding the image centered
    in the oversampled grid (reference embeds this in its maps SpMatrix)."""
    img_shape = tuple(img_shape)
    grid_shape = tuple(grid_shape)
    offs = [(g - n) // 2 for n, g in zip(img_shape, grid_shape)]
    idx = np.indices(img_shape).reshape(len(img_shape), -1)
    lin = np.zeros(idx.shape[1], dtype=np.int64)
    for d, g in enumerate(grid_shape):
        lin = lin * g + (idx[d] + offs[d])
    n = int(np.prod(img_shape))
    return sp.csr_matrix(
        (np.ones(n, np.float32), (lin, np.arange(n))),
        shape=(int(np.prod(grid_shape)), n))


def pipe_menon_dcf(traj, grid_shape, width=4, beta=None, iters=30,
                   impl="auto"):
    """Density-compensation weights by Pipe-Menon fixed point.

    w_{k+1} = w_k / (G G^H w_k): after convergence, gridding with weights w
    approximates a flat density. Returns float32 weights (M,). Standard
    companion to the gridding builder for adjoint-NUFFT reconstruction.

    ``impl``:
      'host'   — the frozen scipy-CSR fixed point (the executable spec);
        fine for 2D, but it assembles the full CSR and runs 30 host
        SpMM pairs — minutes at 3D/1M-sample scale.
      'device' — the same fixed point through the tile-gather apply
        (ops/tile_interp.py): one jitted scan of G(G^H w) pairs, seconds
        at 3D serving scale. Matches 'host' to f32 rounding (tested).
      'auto'   — 'device' when an accelerator is up and the problem is
        3D-scale (>= ~64^3 grid), else 'host'.
    """
    traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
    M = len(traj)
    G_ = tuple(int(g) for g in grid_shape)
    if impl == "auto":
        try:
            import jax
            on_cpu = jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover
            on_cpu = True
        impl = "device" if (not on_cpu and np.prod(G_) >= 64 ** 3) \
            else "host"

    if impl == "device":
        import jax
        import jax.numpy as jnp
        from .ops.tile_interp import plan_tile_interp, tile_interp_apply

        # DCF only needs the adjoint+dense-forward pair; skip the grouped
        # layout (double-build at these scales) and the binned adjoint
        # (w is a single K=1 column; the scatter path is cheap and avoids
        # the packed table's M x 64 upload)
        plan = plan_tile_interp(traj, G_, width=width, beta=beta,
                                forward="dense", adjoint="scatter")
        plan = jax.device_put(plan)

        @jax.jit
        def fixed_point(plan, w):
            def body(w, _):
                d = tile_interp_apply(
                    plan, tile_interp_apply(plan, w, adjoint=True))
                return w / jnp.maximum(jnp.abs(d), 1e-12), None
            w, _ = jax.lax.scan(body, w, None, length=iters)
            return w / w.max()

        w = fixed_point(plan, jnp.ones((M, 1), jnp.float32))
        return np.asarray(w)[:, 0].astype(np.float32)

    G = interp_mat(traj, grid_shape, width=width, beta=beta)
    w = np.ones(M, dtype=np.float64)
    for _ in range(iters):
        d = G @ (G.conj().T @ w)
        d = np.abs(np.asarray(d).ravel())
        w = w / np.maximum(d, 1e-12)
    # normalize so DC gets unit total weight density
    return (w / w.max()).astype(np.float32)


def checkerboard(shape, shifted=False):
    """(-1)^(sum n_d) diagonal for centered FFTs, as a flat float32 array.

    For even G: fftshift(fft(ifftshift(x))) == D_out * fft(D_in * x) with
    D_in = checkerboard(shape) and D_out = (-1)^(sum G_d/2) * checkerboard.
    ``shifted=True`` returns D_out (includes the global sign).
    """
    out = np.ones((), dtype=np.float32)
    sign = 1.0
    for g in shape:
        assert g % 2 == 0, "centered FFT checkerboard requires even dims"
        out = np.multiply.outer(out, (-1.0) ** np.arange(g))
        sign *= (-1.0) ** (g // 2)
    out = out.astype(np.float32)
    if shifted:
        out = out * np.float32(sign)
    return out.ravel()
