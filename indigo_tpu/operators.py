"""Composable structured linear-operator algebra as jittable JAX pytrees.

Reference parity: indigo/operators.py (unverified — reference mount empty at
survey time; see SURVEY.md). The reference's algebra — leaves ``SpMatrix``,
``DenseMatrix``, ``UnscaledFFT``, ``Eye``, ``One`` and combinators ``Product``,
``Adjoint``, ``KronI``, ``BlockDiag``, ``VStack``, ``HStack``, ``Scale`` — is
rebuilt TPU-first:

  * Every operator is a registered pytree node. Array payloads (ELL tiles,
    diagonals, dense blocks) are dynamic leaves; shapes/dtypes are static aux
    data. An operator can therefore be passed straight through ``jax.jit``,
    ``jax.vmap`` and ``shard_map``.
  * There is no Backend object and no ``dndarray`` — XLA *is* the backend.
    The reference's ``eval(y, x, alpha, beta, forward)`` mutation contract
    becomes the pure ``apply(x, adjoint=...)`` / ``eval(...)`` pair.
  * ``KronI`` is a column-batch widening reshape (the moral equivalent of the
    reference's LiftUnscaledFFTs pass: one batched FFT serves all copies,
    automatically, for every operator).

Shapes follow the reference's matrix convention: an operator has shape (M, N)
and acts on column-batched arrays x of shape (N,) or (N, K).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as spsparse

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from . import cplx
from .cplx import as_payload, unpack, iscpair, CPair
from .sparse import (
    BlockedELL, BlockedJag, ElementELL, csr_to_bell, csr_to_jag,
    csr_to_element, element_spmm, estimate_jag_bytes, bell_spmm,
)

__all__ = [
    "Operator",
    "SpMatrix", "KBInterp", "DenseMatrix", "Diag", "UnscaledFFT",
    "CenteredDFT", "GridDFT", "Eye", "One", "CropPad", "Perm", "Mask",
    "Product", "Adjoint", "KronI", "BlockDiag", "VStack", "HStack", "Scale",
]


def _as_2d(x):
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        pass  # keep complex numpy on host; cplx dispatch splits it pre-device
    else:
        x = jnp.asarray(x)
    if x.ndim == 1:
        return x[:, None], True
    return x, False


# Module-level complex-safe jitted apply: cached across operator instances
# with the same tree structure. Used for *eager* application on backends that
# cannot hold complex buffers at the host<->device boundary (TPU).
_capply_fwd = cplx.cjit(lambda op, x: op.apply(x, adjoint=False))
_capply_adj = cplx.cjit(lambda op, x: op.apply(x, adjoint=True))


def _dispatch_apply(op, x, adjoint=False):
    """Apply now: direct inside traces / complex-capable backends, else via
    a complex-safe jit boundary (returns host numpy for complex results)."""
    leaves = jax.tree_util.tree_leaves((op, x))
    traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
    if traced or cplx.supports_complex_buffers():
        return op.apply(jnp.asarray(x), adjoint=adjoint)
    return (_capply_adj if adjoint else _capply_fwd)(op, x)


class Operator:
    """Abstract structured linear operator (shape (M, N), column-batched)."""

    _name = None

    # ---- core contract -------------------------------------------------
    @property
    def shape(self):
        raise NotImplementedError

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, x, adjoint=False):
        """Pure apply: x (N, K) -> y (M, K); adjoint applies A^H."""
        raise NotImplementedError

    def cost(self, ncols: int = 1):
        """(flops, hbm_bytes) estimate for ONE forward apply with K columns.

        Part of the operator contract: :func:`indigo_tpu.analyses.apply_cost`
        walks the tree through this method, and its totals are the roofline
        denominators in bench.py — so a missing implementation must fail
        loudly here rather than silently contribute zero (a new leaf that
        forgot its cost would otherwise corrupt every speed-of-light figure
        downstream). Complex multiply-add counts as 8 flops.
        """
        raise NotImplementedError(
            f"{type(self).__name__} defines no cost(); implement it so "
            f"analyses.apply_cost / the bench rooflines stay truthful")

    def _isz(self):
        return np.dtype(self.dtype).itemsize

    # ---- reference-compatible surface ---------------------------------
    def eval(self, x, alpha=1.0, beta=0.0, y=None, forward=True):
        """Functional y' = alpha * op(x) + beta * y (reference: Operator.eval)."""
        adj = not forward
        if y is None:
            return cplx.eager_call(
                lambda op, x, a: a * op.apply(x, adjoint=adj), self, x, alpha)
        return cplx.eager_call(
            lambda op, x, a, b, y: a * op.apply(x, adjoint=adj) + b * y,
            self, x, alpha, beta, y)

    @property
    def H(self):
        return Adjoint(self)

    def __mul__(self, other):
        if isinstance(other, Operator):
            return Product(self, other)
        if isinstance(other, (int, float, complex)) and not isinstance(other, bool):
            return Scale(other, self)
        x, was_vec = _as_2d(other)
        if x.shape[0] != self.shape[1]:
            raise ValueError(
                f"{self.name}: input has {x.shape[0]} rows, operator is "
                f"{self.shape[0]}x{self.shape[1]}")
        y = _dispatch_apply(self, x)
        return y[:, 0] if was_vec else y

    __matmul__ = __mul__

    def __rmul__(self, other):
        if isinstance(other, (int, float, complex)) and not isinstance(other, bool):
            return Scale(other, self)
        return NotImplemented

    def __neg__(self):
        return Scale(-1.0, self)

    # ---- introspection -------------------------------------------------
    @property
    def name(self):
        return self._name or type(self).__name__

    def children(self):
        return ()

    def _describe(self):
        M, N = self.shape
        return f"{self.name} <{M}x{N}> {np.dtype(self.dtype).name}"

    def dump(self, _indent=0):
        """Pretty-print the operator tree (reference: Operator.dump)."""
        lines = ["  " * _indent + self._describe()]
        for c in self.children():
            lines.append(c.dump(_indent + 1))
        out = "\n".join(lines)
        return out

    def memusage(self):
        """Total bytes of array payload in the tree (reference: memusage)."""
        leaves = jax.tree_util.tree_leaves(self)
        return int(sum(getattr(l, "nbytes", 0) for l in leaves))

    def optimize(self, recipe=None):
        """Run the rewrite pipeline (reference: Operator.optimize)."""
        from .transforms import optimize as _optimize
        return _optimize(self, recipe)

    def to_dense(self):
        """Materialize as a dense matrix by applying to identity (tests)."""
        N = self.shape[1]
        eye = np.eye(N, dtype=np.dtype(self.dtype))
        return _dispatch_apply(self, eye)

    def __repr__(self):
        return f"<{self._describe()}>"


# =========================== leaves ====================================


@register_pytree_node_class
class SpMatrix(Operator):
    """Sparse matrix leaf backed by blocked-ELL tiles for both directions.

    Reference: indigo/operators.py SpMatrix (unverified). The scipy CSR is
    converted host-side once; the adjoint uses a separately tiled A^H so both
    directions are gather-shaped on TPU (SURVEY.md §7 step 5).
    """

    # Blocked tiles above this size fall back to element-level storage
    # (exactly nnz) with gather/scatter applies — 3D gridding matrices sit
    # at ~1% block fill, where tiles would be 30-100x the nnz bytes.
    MAX_TILE_BYTES = 1 << 30

    def __init__(self, A, name=None, bm=8, bn=128, format="auto",
                 _ell=None, _ellH=None):
        if _ell is not None:
            self._ell, self._ellH = _ell, _ellH
        else:
            A = spsparse.csr_matrix(A)
            if format == "auto":
                est = (estimate_jag_bytes(A, bm, bn)
                       + estimate_jag_bytes(A.T, bm, bn))
                format = "jag" if est <= self.MAX_TILE_BYTES else "element"
            if format == "element":
                self._ell = csr_to_element(A)
                self._ellH = None
            else:
                conv = csr_to_jag if format == "jag" else csr_to_bell
                self._ell = conv(A, bm=bm, bn=bn)
                self._ellH = conv(A.conj().T.tocsr(), bm=bm, bn=bn)
        self._name = name

    @property
    def shape(self):
        return self._ell.shape

    @property
    def dtype(self):
        return self._ell.dtype

    @property
    def ell(self):
        return self._ell

    @property
    def ellH(self):
        return self._ellH

    def apply(self, x, adjoint=False):
        if isinstance(self._ell, ElementELL):
            return element_spmm(self._ell, x, adjoint=adjoint)
        from .ops import spmm  # dispatches jnp vs Pallas
        return spmm(self._ellH if adjoint else self._ell, x)

    def cost(self, ncols=1):
        ell, K, isz = self._ell, ncols, self._isz()
        stored = ell.data.size
        flops = 8 * stored * K  # MXU does the whole stored tile
        idx_bytes = ell.memusage() - ell.data.nbytes
        bytes_ = (ell.data.nbytes + idx_bytes
                  + (self.shape[0] + self.shape[1]) * K * isz)
        return flops, bytes_

    def _describe(self):
        base = super()._describe()
        return f"{base} nnz={self._ell.nnz} fill={self._ell.fill_fraction():.3f}"

    def tree_flatten(self):
        return (self._ell, self._ellH), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._ell, obj._ellH = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class KBInterp(Operator):
    """Kaiser-Bessel gridding interpolation leaf (tile-gather execution).

    The structured replacement for a gridding ``SpMatrix``: where blocked
    tiles blow up (3D gridding sits at ~1% block fill), this leaf keeps the
    KB kernel's separable per-axis weights and applies via 128-lane grid-tile
    gathers (ops/tile_interp.py) — both directions stream at memcpy-class
    rates instead of serializing per nonzero. Reference parity: the csrmm
    apply of indigo/noncart.py's interp matrix (SURVEY.md §3.1 hot path).

    Build with :func:`indigo_tpu.ops.tile_interp.plan_tile_interp`; weights
    and geometry agree with :func:`noncart.interp_mat` to f32 rounding.
    """

    def __init__(self, plan, name=None):
        self._plan = plan
        self._name = name

    @property
    def plan(self):
        return self._plan

    @property
    def shape(self):
        N = int(np.prod(self._plan.grid_shape))
        return (self._plan.n_samples, N)

    @property
    def dtype(self):
        return np.float32

    def apply(self, x, adjoint=False):
        from .ops.tile_interp import tile_interp_apply
        return tile_interp_apply(self._plan, x, adjoint=adjoint)

    def cost(self, ncols=1):
        # tile-gather interpolation: each sample reads/accumulates S
        # super-tile rows of K*128 lanes + its factored weights; the
        # tiled grid is streamed once per direction
        plan, K = self._plan, ncols
        M, S = plan.n_samples, plan.S
        NT = int(np.prod(plan.nt))
        isz = 8  # complex64 in/out vectors
        gather = M * S * K * 128 * 4
        flops = 2 * M * S * K * 128
        bytes_ = (gather + plan.memusage() + NT * K * 128 * 4
                  + (self.shape[0] + self.shape[1]) * K * isz)
        return flops, bytes_

    def _describe(self):
        base = super()._describe()
        p = self._plan
        return (f"{base} width={p.width} S={p.S} "
                f"payload={p.memusage() / 1e6:.0f}MB")

    def tree_flatten(self):
        return (self._plan,), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._plan,) = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class DenseMatrix(Operator):
    """Dense matrix leaf (reference: DenseMatrix -> cgemm)."""

    def __init__(self, A, name=None):
        A = as_payload(A)
        if A.ndim != 2:
            raise ValueError("DenseMatrix expects a 2D array")
        self._A = A
        self._name = name

    @property
    def shape(self):
        return self._A.shape

    @property
    def dtype(self):
        return self._A.dtype

    @property
    def array(self):
        return unpack(self._A)

    def apply(self, x, adjoint=False):
        A = unpack(self._A)
        if adjoint:
            A = A.conj().T
        return jnp.matmul(A, x, precision="highest")

    def cost(self, ncols=1):
        m, n = self.shape
        K, isz = ncols, self._isz()
        return 8 * m * n * K, (m * n + (m + n) * K) * isz

    def tree_flatten(self):
        return (self._A,), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._A,) = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class Diag(Operator):
    """Diagonal operator (apodization, coil maps, FFT shifts).

    The reference stores diagonals as CSR SpMatrix leaves; on TPU an explicit
    elementwise multiply is strictly better (VPU, fuses into neighbors).
    """

    def __init__(self, d, name=None):
        self._d = as_payload(d).ravel()
        self._name = name

    @property
    def shape(self):
        n = self._d.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self._d.dtype

    @property
    def diagonal(self):
        """Diagonal as a (possibly complex) array — trace-safe contexts only."""
        return unpack(self._d)

    @property
    def payload(self):
        return self._d

    def apply(self, x, adjoint=False):
        d = unpack(cplx.conj(self._d) if adjoint else self._d)
        return d[:, None] * x

    def cost(self, ncols=1):
        n, K, isz = self.shape[0], ncols, self._isz()
        return 8 * n * K, (3 * n * K + n) * isz

    def tree_flatten(self):
        return (self._d,), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._d,) = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class UnscaledFFT(Operator):
    """Unnormalized FFT over a volume; columns are the batch dimension.

    Reference: indigo/operators.py UnscaledFFT (unverified): forward is the
    unnormalized DFT, adjoint is the unnormalized inverse (N * ifftn), so
    A^H A = N * I. Operator shape is (prod(vol), prod(vol)); x columns are
    reshaped to the volume, batched FFT'd by XLA, and flattened back.
    """

    def __init__(self, vol_shape, dtype=jnp.complex64, name=None):
        self._vol = tuple(int(s) for s in vol_shape)
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def vol_shape(self):
        return self._vol

    @property
    def shape(self):
        n = int(np.prod(self._vol))
        return (n, n)

    @property
    def dtype(self):
        return self._dtype

    def apply(self, x, adjoint=False):
        K = x.shape[1]
        axes = tuple(range(len(self._vol)))
        v = x.reshape(self._vol + (K,))
        if adjoint:
            n = int(np.prod(self._vol))
            y = jnp.fft.ifftn(v, axes=axes) * n
        else:
            y = jnp.fft.fftn(v, axes=axes)
        return y.reshape(-1, K).astype(self._dtype)

    def cost(self, ncols=1):
        n, K, isz = int(np.prod(self._vol)), ncols, self._isz()
        flops = 5 * n * max(1, int(np.log2(max(n, 2)))) * K * 2
        return flops, 2 * 2 * n * K * isz  # read+write, ~2 passes

    def _describe(self):
        return f"{self.name}{list(self._vol)} <{self.shape[0]}x{self.shape[1]}>"

    def tree_flatten(self):
        return (), (self._vol, str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._vol, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


@register_pytree_node_class
class CenteredDFT(Operator):
    """Fused (centered FFT) . (centered zero-pad) as per-axis MXU matmuls.

    Structurally equal to ``centered_fft_op(grid_shape) * CropPad(img_shape,
    grid_shape)`` (models/sense.py) — forward maps an image to the centered
    spectrum on the oversampled grid, adjoint crops the inverse centered FFT
    back to the image. TPU-first replacement for that 5-op chain: each axis
    is ONE (g_d, n_d) complex matrix (ops/dft_fft.centered_pad_dft_mat) with
    the fftshift checkerboards and the pad offset folded in, applied as
    dot_general stages in transpose-free axis-cycling order. The padded
    volume, the +-1 shift passes, and XLA's FFT (Bluestein for non-pow2
    axes like 320 = 2^6*5) never materialize; on v5e the 320^3 8-coil
    adjoint drops ~4x vs jnp.fft.ifftn (see BASELINE.md serving row).

    Reference parity: the UnscaledFFT + shift/scale diagonals + zero-pad
    SpMatrix stages of the reference composition (SURVEY.md §3.4).
    """

    def __init__(self, img_shape, grid_shape, name=None, _mats=None):
        from .ops.dft_fft import centered_pad_dft_mat

        self._img = tuple(int(s) for s in img_shape)
        self._grid = tuple(int(s) for s in grid_shape)
        if len(self._img) != len(self._grid):
            raise ValueError("rank mismatch")
        for n, g in zip(self._img, self._grid):
            if n > g:
                raise ValueError("img_shape must fit inside grid_shape")
            if g % 2:
                raise ValueError("centered FFT requires even grid dims")
        self._name = name
        if _mats is None:
            _mats = tuple(as_payload(centered_pad_dft_mat(n, g))
                          for n, g in zip(self._img, self._grid))
        self._mats = _mats

    @property
    def img_shape(self):
        return self._img

    @property
    def grid_shape(self):
        return self._grid

    @property
    def shape(self):
        return (int(np.prod(self._grid)), int(np.prod(self._img)))

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, x, adjoint=False):
        from .ops.dft_fft import dft_nd_apply

        K = x.shape[1]
        src = self._grid if adjoint else self._img
        mats = [unpack(m) for m in self._mats]
        if adjoint:
            mats = [jnp.conj(m).T for m in mats]
        v = x.T.reshape((K,) + src).astype(jnp.complex64)
        y = dft_nd_apply(v, mats)
        return y.reshape(K, -1).T

    def cost(self, ncols=1):
        # per-axis matmul stages over a volume morphing img -> grid:
        # stage d contracts g_d x n_d over the mixed intermediate
        K, isz = ncols, self._isz()
        img, grid = self._img, self._grid
        flops = 0
        vol = int(np.prod(img))
        bytes_ = self.shape[1] * K * isz
        for n_, g_ in zip(img, grid):
            vol = vol // n_ * g_
            flops += 8 * vol * n_ * K
            bytes_ += 2 * vol * K * isz + n_ * g_ * isz
        return flops, bytes_

    def _describe(self):
        return (f"{self.name}{list(self._img)}->{list(self._grid)} "
                f"<{self.shape[0]}x{self.shape[1]}>")

    def tree_flatten(self):
        return (self._mats,), (self._img, self._grid, self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._mats,) = children
        obj._img, obj._grid, obj._name = aux
        return obj


@register_pytree_node_class
class GridDFT(Operator):
    """Fused KBInterp . CenteredDFT: the Type-2 NUFFT core G Fc Z as ONE
    leaf.

    Structurally equal to ``KBInterp(plan) * CenteredDFT(img_shape,
    plan.grid_shape)``. The fusion pays in the ADJOINT — the gridded rhs
    build A^H W y, the dominant serving stage: the tile-gather adjoint's
    native output IS the tiled grid layout, and the adjoint DFT matrices
    contract that layout directly over (tile id, within-tile) index pairs
    (ops/dft_fft.tiled_idft_apply), so the untile transpose + periodic
    fold — 155 of 242 ms of the 256^3 K=16 adjoint, 21 of 33 ms at 128^3
    on v5e — never materialize. The forward runs the same unfused chain
    as the two-leaf form (the tile_grid transpose measured cheap in that
    direction).

    Requires the periodic no-halo tiling: every grid dim divisible by its
    tile (``plan.ext == plan.grid_shape`` — true for all production
    grids; the nufft_op builder falls back to the two-leaf chain
    otherwise). Reference parity: the G . F . Z stages of the SENSE
    composition (SURVEY.md §3.4) realized as one operator — the same
    rewrite-to-one-leaf treatment the reference's RealizeMatrices pass
    gives adjacent sparse matrices.
    """

    def __init__(self, plan, img_shape, name=None, _mats=None):
        from .ops.dft_fft import centered_pad_dft_mat

        grid = tuple(int(g) for g in plan.grid_shape)
        if tuple(plan.ext) != grid:
            raise ValueError(
                "GridDFT requires the periodic no-halo tiling "
                f"(plan.ext == grid_shape), got ext={plan.ext} "
                f"grid={grid}; use KBInterp * CenteredDFT instead")
        self._img = tuple(int(s) for s in img_shape)
        if len(self._img) != len(grid):
            raise ValueError("rank mismatch")
        for n, g in zip(self._img, grid):
            if n > g:
                raise ValueError("img_shape must fit inside grid_shape")
            if g % 2:
                raise ValueError("centered FFT requires even grid dims")
        self._plan = plan
        self._name = name
        if _mats is None:
            _mats = tuple(as_payload(centered_pad_dft_mat(n, g))
                          for n, g in zip(self._img, grid))
        self._mats = _mats

    @property
    def plan(self):
        return self._plan

    @property
    def img_shape(self):
        return self._img

    @property
    def grid_shape(self):
        return self._plan.grid_shape

    @property
    def shape(self):
        return (self._plan.n_samples, int(np.prod(self._img)))

    @property
    def dtype(self):
        return jnp.complex64

    def _tiled_mats(self):
        """Adjoint DFT matrices in (re, im) tiled (N_d, nt_d, T_d) form."""
        tm = []
        for m, t in zip(self._mats, self._plan.tile):
            a = jnp.conj(unpack(m)).T               # (n, g)
            a = a.reshape(a.shape[0], -1, t)        # (n, g//t, t)
            tm.append((jnp.real(a), jnp.imag(a)))
        return tm

    def apply(self, x, adjoint=False):
        from .ops.dft_fft import dft_nd_apply, tiled_idft_apply
        from .ops.tile_interp import (
            tile_interp_apply, tile_adjoint_tiled, tile_forward_tiled)

        plan = self._plan
        K = x.shape[1]
        if not adjoint:
            v = x.T.reshape((K,) + self._img)
            if len(self._img) >= 3:
                # fused: tiled spectrum via the real transpose of the
                # adjoint contraction (pure dot_generals — XLA transposes
                # them back, no scatter), then the grouped tile-gather
                # forward; tile_grid's pad+transpose never materializes
                # (128^3 K=2 fwd measured 11.1 -> 4.2 ms on v5e)
                ar = jnp.real(v).astype(jnp.float32)
                ai = jnp.imag(v).astype(jnp.float32)
                tm = self._tiled_mats()
                NT = int(np.prod(plan.nt))
                spec = jax.ShapeDtypeStruct((NT, 2 * K * 128), jnp.float32)
                f = lambda xt: tiled_idft_apply(    # noqa: E731
                    xt, plan.nt, plan.tile, tm, folded=True)
                (xt,) = jax.linear_transpose(f, spec)((ar, ai))
                y = tile_forward_tiled(plan, xt)    # (M, 2K)
                return jax.lax.complex(y[:, :K], y[:, K:])
            mats = [unpack(m) for m in self._mats]
            y = dft_nd_apply(v.astype(jnp.complex64), mats).reshape(K, -1).T
            return tile_interp_apply(plan, y)
        xt, folded = tile_adjoint_tiled(plan, x)
        ar, ai = tiled_idft_apply(xt, plan.nt, plan.tile,
                                  self._tiled_mats(), folded=folded)
        Kc = ar.shape[0]
        return jax.lax.complex(ar, ai).reshape(Kc, -1).T

    def cost(self, ncols=1):
        # interp part + DFT stages, minus the flat complex grid vector the
        # unfused chain writes+reads between the two leaves (the fused
        # adjoint hands the tiled layout straight to the contraction)
        fi, bi = KBInterp(self._plan).cost(ncols)
        fd, bd = CenteredDFT(self._img, self.grid_shape,
                             _mats=self._mats).cost(ncols)
        N = int(np.prod(self.grid_shape))
        return fi + fd, bi + bd - 2 * N * ncols * 8

    def _describe(self):
        p = self._plan
        return (f"{self.name}{list(self._img)}->{list(p.grid_shape)} "
                f"<{self.shape[0]}x{self.shape[1]}> width={p.width} "
                f"S={p.S} payload={p.memusage() / 1e6:.0f}MB")

    def tree_flatten(self):
        return (self._plan, self._mats), (self._img, self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._plan, obj._mats = children
        obj._img, obj._name = aux
        return obj


@register_pytree_node_class
class Eye(Operator):
    """Identity (reference: Eye)."""

    def __init__(self, n, dtype=jnp.complex64, name=None):
        self._n = int(n)
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self._dtype

    def apply(self, x, adjoint=False):
        return x

    def cost(self, ncols=1):
        return 0, 0

    def tree_flatten(self):
        return (), (self._n, str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._n, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


@register_pytree_node_class
class One(Operator):
    """All-ones (M, N) matrix: y = broadcast column sums (reference: One).

    Used by the reference as the coil-combination "sum" stage (its custom
    ``onemm`` kernel). Here it is a reduce + broadcast the VPU eats for free.
    """

    def __init__(self, shape, dtype=jnp.complex64, name=None):
        self._shape = (int(shape[0]), int(shape[1]))
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    def apply(self, x, adjoint=False):
        M, N = self._shape
        out_rows = N if adjoint else M
        s = jnp.sum(x, axis=0, keepdims=True)
        return jnp.broadcast_to(s, (out_rows, x.shape[1])).astype(self._dtype)

    def cost(self, ncols=1):
        m, n = self.shape
        K, isz = ncols, self._isz()
        return 2 * (m + n) * K, (m + n) * K * isz

    def tree_flatten(self):
        return (), (self._shape, str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._shape, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


@register_pytree_node_class
class Perm(Operator):
    """Permutation operator: y = x[perm]; adjoint is the inverse gather.

    Used to re-tile the oversampled grid into MXU-friendly column order for
    the gridding SpMM (see noncart.tiled_order) — a single cheap gather pass
    instead of 100x structural zero-fill in the ELL tiles. Both directions
    are gathers (never scatters) on TPU.
    """

    def __init__(self, perm, dtype=jnp.complex64, name=None):
        perm = np.asarray(perm)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        self._p = jnp.asarray(perm, dtype=jnp.int32)
        self._ip = jnp.asarray(inv, dtype=jnp.int32)
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def shape(self):
        n = self._p.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self._dtype

    @property
    def perm(self):
        return self._p

    def apply(self, x, adjoint=False):
        idx = self._ip if adjoint else self._p
        return jnp.take(x, idx, axis=0)

    def cost(self, ncols=1):
        n, K, isz = self.shape[0], ncols, self._isz()
        return 0, (2 * n * K) * isz + n * 4

    def tree_flatten(self):
        return (self._p, self._ip), (str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._p, obj._ip = children
        dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


@register_pytree_node_class
class Mask(Operator):
    """Row-selection operator (m, n): y = x[keep]; adjoint zero-fills.

    The structured replacement for a 0/1 sampling ``SpMatrix`` (the
    reference encodes Cartesian undersampling masks as sparse matrices and
    pays a csrmm for them — SURVEY.md §3.4): forward is ONE row gather;
    the adjoint expands back to n rows scatter-FREE, by gathering from the
    input extended with a single zero row (rows not kept index the zero
    row). Exactly equal to the sparse form, at pure-gather cost on TPU.
    """

    def __init__(self, keep, n, dtype=jnp.complex64, name=None):
        keep = np.asarray(keep).ravel()
        n = int(n)
        if keep.size and (keep.min() < 0 or keep.max() >= n):
            raise ValueError("keep indices out of range")
        # inverse map: grid row -> position in keep, or m (the zero row)
        inv = np.full(n, len(keep), dtype=np.int64)
        inv[keep] = np.arange(len(keep))
        self._keep = jnp.asarray(keep, dtype=jnp.int32)
        self._inv = jnp.asarray(inv, dtype=jnp.int32)
        self._n = n
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @classmethod
    def from_bool(cls, mask, dtype=jnp.complex64, name=None):
        """Build from a boolean array over the grid (any shape)."""
        mask = np.asarray(mask)
        return cls(np.flatnonzero(mask.ravel()), mask.size, dtype=dtype,
                   name=name)

    @property
    def shape(self):
        return (int(self._keep.shape[0]), self._n)

    @property
    def dtype(self):
        return self._dtype

    @property
    def keep(self):
        return self._keep

    def apply(self, x, adjoint=False):
        if adjoint:
            z = jnp.zeros((1, x.shape[1]), dtype=x.dtype)
            return jnp.take(jnp.concatenate([x, z], axis=0), self._inv,
                            axis=0)
        return jnp.take(x, self._keep, axis=0)

    def cost(self, ncols=1):
        m, n = self.shape
        return 0, (m + n) * ncols * self._isz() + n * 4

    def tree_flatten(self):
        return (self._keep, self._inv), (self._n, str(self._dtype),
                                         self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._keep, obj._inv = children
        obj._n, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


@register_pytree_node_class
class CropPad(Operator):
    """Centered zero-pad (forward) / crop (adjoint) between two volumes.

    Structured replacement for a 0/1 scatter SpMatrix (the reference embeds
    zero-padding inside its sparse maps matrix): shape
    (prod(out_shape), prod(in_shape)), forward embeds the in-volume centered
    in the out-volume. Pure pad/slice — free on the VPU, fuses into the FFT.
    """

    def __init__(self, in_shape, out_shape, dtype=jnp.complex64, name=None):
        self._in = tuple(int(s) for s in in_shape)
        self._out = tuple(int(s) for s in out_shape)
        if len(self._in) != len(self._out):
            raise ValueError("rank mismatch")
        for a, b in zip(self._in, self._out):
            if a > b:
                raise ValueError("in_shape must fit inside out_shape")
        self._dtype = jnp.dtype(dtype)
        self._name = name

    @property
    def in_shape(self):
        return self._in

    @property
    def out_shape(self):
        return self._out

    @property
    def shape(self):
        return (int(np.prod(self._out)), int(np.prod(self._in)))

    @property
    def dtype(self):
        return self._dtype

    def apply(self, x, adjoint=False):
        K = x.shape[1]
        offs = [(o - i) // 2 for i, o in zip(self._in, self._out)]
        if adjoint:
            v = x.reshape(self._out + (K,))
            sl = tuple(slice(o, o + i) for i, o in zip(self._in, offs))
            return v[sl].reshape(-1, K)
        v = x.reshape(self._in + (K,))
        pad = [(o, b - a - o) for a, b, o in zip(self._in, self._out, offs)]
        return jnp.pad(v, pad + [(0, 0)]).reshape(-1, K)

    def cost(self, ncols=1):
        m, n = self.shape
        return 0, (m + n) * ncols * self._isz()

    def _describe(self):
        return (f"{self.name}{list(self._in)}->{list(self._out)} "
                f"<{self.shape[0]}x{self.shape[1]}>")

    def tree_flatten(self):
        return (), (self._in, self._out, str(self._dtype), self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._in, obj._out, dtype, obj._name = aux
        obj._dtype = jnp.dtype(dtype)
        return obj


# ========================= combinators =================================


@register_pytree_node_class
class Product(Operator):
    """Composition A @ B (reference: Product)."""

    def __init__(self, A, B, name=None):
        if A.shape[1] != B.shape[0]:
            raise ValueError(f"shape mismatch in Product: {A.shape} @ {B.shape}")
        self._A, self._B = A, B
        self._name = name

    @property
    def shape(self):
        return (self._A.shape[0], self._B.shape[1])

    @property
    def dtype(self):
        return jnp.result_type(self._A.dtype, self._B.dtype)

    def children(self):
        return (self._A, self._B)

    @property
    def left(self):
        return self._A

    @property
    def right(self):
        return self._B

    def apply(self, x, adjoint=False):
        if adjoint:
            return self._B.apply(self._A.apply(x, adjoint=True), adjoint=True)
        return self._A.apply(self._B.apply(x))

    def cost(self, ncols=1):
        fa, ba = self._A.cost(ncols)
        fb, bb = self._B.cost(ncols)
        return fa + fb, ba + bb

    def tree_flatten(self):
        return (self._A, self._B), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._A, obj._B = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class Adjoint(Operator):
    """Conjugate-transpose wrapper; A.H.H is simplified back to A."""

    def __new__(cls, A, name=None):
        if isinstance(A, Adjoint):
            return A.child
        return super().__new__(cls)

    def __init__(self, A, name=None):
        if isinstance(A, Adjoint):
            return  # __new__ returned the unwrapped child; leave it untouched
        self._A = A
        self._name = name

    @property
    def shape(self):
        m, n = self._A.shape
        return (n, m)

    @property
    def dtype(self):
        return self._A.dtype

    @property
    def child(self):
        return self._A

    def children(self):
        return (self._A,)

    def apply(self, x, adjoint=False):
        return self._A.apply(x, adjoint=not adjoint)

    def cost(self, ncols=1):
        return self._A.cost(ncols)

    def tree_flatten(self):
        return (self._A,), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj._A,) = children
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class KronI(Operator):
    """I_c (x) A: apply A independently to c stacked blocks (reference: KronI).

    TPU-native: the c blocks are folded into the column-batch dimension, so a
    single batched child apply (one batched FFT, one SpMM) serves all copies —
    the built-in equivalent of the reference's LiftUnscaledFFTs rewrite.
    """

    def __init__(self, c, A, name=None):
        self._c = int(c)
        self._A = A
        self._name = name

    @property
    def shape(self):
        m, n = self._A.shape
        return (self._c * m, self._c * n)

    @property
    def dtype(self):
        return self._A.dtype

    @property
    def c(self):
        return self._c

    @property
    def child(self):
        return self._A

    def children(self):
        return (self._A,)

    def apply(self, x, adjoint=False):
        m, n = self._A.shape
        if adjoint:
            m, n = n, m
        c, K = self._c, x.shape[1]
        # (c*n, K) -> (n, c*K): fold block index into columns.
        xw = x.reshape(c, n, K).transpose(1, 0, 2).reshape(n, c * K)
        yw = self._A.apply(xw, adjoint=adjoint)
        return yw.reshape(m, c, K).transpose(1, 0, 2).reshape(c * m, K)

    def cost(self, ncols=1):
        f, b = self._A.cost(ncols)
        return self._c * f, self._c * b

    def _describe(self):
        M, N = self.shape
        return f"{self.name}(c={self._c}) <{M}x{N}>"

    def tree_flatten(self):
        return (self._A,), (self._c, self._name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._A,) = children
        obj._c, obj._name = aux
        return obj


@register_pytree_node_class
class BlockDiag(Operator):
    """diag(A_1, ..., A_k): each block applies to its row/col slice.

    Reference: BlockDiag (per-coil sensitivity blocks). Static child count,
    so the Python loop unrolls cleanly under jit; for homogeneous children
    prefer KronI (single batched apply).
    """

    def __init__(self, blocks, name=None):
        self._blocks = tuple(blocks)
        if not self._blocks:
            raise ValueError("BlockDiag needs at least one block")
        self._name = name

    @property
    def shape(self):
        return (
            sum(b.shape[0] for b in self._blocks),
            sum(b.shape[1] for b in self._blocks),
        )

    @property
    def dtype(self):
        return jnp.result_type(*[b.dtype for b in self._blocks])

    def children(self):
        return self._blocks

    @property
    def blocks(self):
        return self._blocks

    def apply(self, x, adjoint=False):
        outs = []
        off = 0
        for b in self._blocks:
            m, n = b.shape
            if adjoint:
                m, n = n, m
            outs.append(b.apply(x[off:off + n], adjoint=adjoint))
            off += n
        return jnp.concatenate(outs, axis=0)

    def cost(self, ncols=1):
        f = b = 0
        for c in self._blocks:
            cf, cb = c.cost(ncols)
            f += cf
            b += cb
        return f, b

    def tree_flatten(self):
        return self._blocks, (self._name, len(self._blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._blocks = tuple(children)
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class VStack(Operator):
    """[A_1; A_2; ...]: stacked outputs, shared input (reference: VStack).

    Adjoint is the sum of per-block adjoints.
    """

    def __init__(self, blocks, name=None):
        self._blocks = tuple(blocks)
        if not self._blocks:
            raise ValueError("VStack needs at least one block")
        n = self._blocks[0].shape[1]
        for b in self._blocks:
            if b.shape[1] != n:
                raise ValueError("VStack blocks must share input width")
        self._name = name

    @property
    def shape(self):
        return (sum(b.shape[0] for b in self._blocks), self._blocks[0].shape[1])

    @property
    def dtype(self):
        return jnp.result_type(*[b.dtype for b in self._blocks])

    def children(self):
        return self._blocks

    @property
    def blocks(self):
        return self._blocks

    def apply(self, x, adjoint=False):
        if adjoint:
            y = None
            off = 0
            for b in self._blocks:
                m = b.shape[0]
                t = b.apply(x[off:off + m], adjoint=True)
                y = t if y is None else y + t
                off += m
            return y
        return jnp.concatenate([b.apply(x) for b in self._blocks], axis=0)

    def cost(self, ncols=1):
        f = b = 0
        for c in self._blocks:
            cf, cb = c.cost(ncols)
            f += cf
            b += cb
        return f, b

    def tree_flatten(self):
        return self._blocks, (self._name, len(self._blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._blocks = tuple(children)
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class HStack(Operator):
    """[A_1, A_2, ...]: split input, summed outputs (reference: HStack)."""

    def __init__(self, blocks, name=None):
        self._blocks = tuple(blocks)
        if not self._blocks:
            raise ValueError("HStack needs at least one block")
        m = self._blocks[0].shape[0]
        for b in self._blocks:
            if b.shape[0] != m:
                raise ValueError("HStack blocks must share output height")
        self._name = name

    @property
    def shape(self):
        return (self._blocks[0].shape[0], sum(b.shape[1] for b in self._blocks))

    @property
    def dtype(self):
        return jnp.result_type(*[b.dtype for b in self._blocks])

    def children(self):
        return self._blocks

    @property
    def blocks(self):
        return self._blocks

    def apply(self, x, adjoint=False):
        if adjoint:
            return jnp.concatenate(
                [b.apply(x, adjoint=True) for b in self._blocks], axis=0
            )
        y = None
        off = 0
        for b in self._blocks:
            n = b.shape[1]
            t = b.apply(x[off:off + n])
            y = t if y is None else y + t
            off += n
        return y

    def cost(self, ncols=1):
        f = b = 0
        for c in self._blocks:
            cf, cb = c.cost(ncols)
            f += cf
            b += cb
        return f, b

    def tree_flatten(self):
        return self._blocks, (self._name, len(self._blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._blocks = tuple(children)
        obj._name = aux[0]
        return obj


@register_pytree_node_class
class Scale(Operator):
    """alpha * A with a scalar alpha (reference: Scale).

    alpha is carried as a 0-d array leaf so it can be traced/differentiated.
    """

    def __init__(self, alpha, A, name=None):
        self._alpha = as_payload(alpha)
        self._A = A
        self._name = name

    @property
    def shape(self):
        return self._A.shape

    @property
    def dtype(self):
        return jnp.result_type(self._alpha.dtype, self._A.dtype)

    @property
    def alpha(self):
        return self._alpha

    @property
    def child(self):
        return self._A

    def children(self):
        return (self._A,)

    def apply(self, x, adjoint=False):
        a = unpack(cplx.conj(self._alpha) if adjoint else self._alpha)
        return a * self._A.apply(x, adjoint=adjoint)

    def cost(self, ncols=1):
        return self._A.cost(ncols)

    def tree_flatten(self):
        return (self._alpha, self._A), (self._name,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._alpha, obj._A = children
        obj._name = aux[0]
        return obj
