"""Blocked-ELL sparse format sized for the TPU MXU/VPU, plus converters.

TPU-native replacement for the reference's CSR + csrmm machinery
(reference parity: indigo/backends/{mkl,cuda,customcpu,customgpu}.py and
_customcpu.c/_customgpu.cu — unverified, mount empty; see SURVEY.md).

Design (SURVEY.md §7, north star): host-side scipy CSR matrices are converted
once, at build time, into fixed-width blocked-ELL tiles aligned to the TPU
(8x128) float32 tile. Both the forward matrix and its conjugate transpose are
tiled, so the adjoint apply is also gather-shaped — the TPU answer to the
reference's "exclusive-write" scatter-avoidance design in its custom kernels.

Two execution paths consume this structure:
  * :func:`bell_spmm` — pure-jnp gather + einsum, runs anywhere XLA runs.
  * :mod:`indigo_tpu.ops.ell_spmm` — Pallas TPU kernel (hot path).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .cplx import as_payload, unpack, to_numpy, iscpair

__all__ = [
    "BlockedELL", "csr_to_bell", "bell_spmm", "bell_to_csr",
    "BlockedJag", "csr_to_jag", "jag_spmm", "jag_to_csr",
    "ElementELL", "csr_to_element", "element_spmm", "element_to_csr",
    "estimate_jag_bytes",
]


@register_pytree_node_class
class BlockedELL:
    """Fixed-width blocked-ELL matrix.

    data: (R, W, bm, bn) dense blocks — float32 array, or a split-complex
          :class:`~indigo_tpu.cplx.CPair` of two float32 planes (TPU has no
          native complex buffers; see cplx.py).
    cols: (R, W) int32 column-block indices; padding slots point at block 0
          with all-zero data, so no masking is needed on the gather path.

    Logical shape is ``shape`` = (M, N); R = ceil(M/bm), C = ceil(N/bn).
    """

    def __init__(self, data, cols, shape, nnz=0):
        self.data = data
        self.cols = cols
        self.shape = tuple(int(s) for s in shape)
        self.nnz = int(nnz)

    @property
    def bm(self):
        return self.data.shape[2]

    @property
    def bn(self):
        return self.data.shape[3]

    @property
    def R(self):
        return self.data.shape[0]

    @property
    def W(self):
        return self.data.shape[1]

    @property
    def C(self):
        return -(-self.shape[1] // self.bn)

    @property
    def dtype(self):
        return self.data.dtype

    def memusage(self):
        return self.data.nbytes + self.cols.nbytes

    def fill_fraction(self):
        """nnz / stored entries — MXU work efficiency of the tiling."""
        stored = self.data.size
        return self.nnz / stored if stored else 0.0

    def tree_flatten(self):
        return (self.data, self.cols), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols = children
        shape, nnz = aux
        obj = cls.__new__(cls)
        obj.data = data
        obj.cols = cols
        obj.shape = shape
        obj.nnz = nnz
        return obj

    def __repr__(self):
        return (
            f"BlockedELL(shape={self.shape}, blocks={self.data.shape[:2]}, "
            f"tile=({self.bm},{self.bn}), dtype={self.data.dtype}, "
            f"nnz={self.nnz}, fill={self.fill_fraction():.4f})"
        )


def csr_to_bell(A, bm=8, bn=128, dtype=None):
    """Convert a scipy sparse matrix to :class:`BlockedELL` (host-side, numpy).

    Fully vectorized: groups nonzeros by (row-block, col-block), computes the
    per-row-block slot assignment with one sort, and scatters values with
    ``np.add.at`` (duplicates are summed, matching CSR semantics).
    """
    A = sp.coo_matrix(A)
    M, N = A.shape
    if dtype is None:
        dtype = np.complex64 if np.iscomplexobj(A.data) else np.float32
    R = -(-M // bm) if M else 1
    C = -(-N // bn) if N else 1
    R = max(R, 1)
    C = max(C, 1)

    if A.nnz == 0:
        data = np.zeros((R, 1, bm, bn), dtype=dtype)
        cols = np.zeros((R, 1), dtype=np.int32)
        return BlockedELL(as_payload(data), jnp.asarray(cols), (M, N), nnz=0)

    rows = A.row.astype(np.int64)
    colsx = A.col.astype(np.int64)
    vals = A.data.astype(dtype)

    brow = rows // bm
    bcol = colsx // bn
    key = brow * C + bcol
    # Unique (row-block, col-block) pairs, sorted — within a row-block the
    # col-blocks come out sorted, which keeps the gather pattern monotone.
    ukey, inv = np.unique(key, return_inverse=True)
    ubrow = ukey // C
    ubcol = ukey % C
    # Slot index of each unique pair within its row-block.
    first_in_brow = np.zeros(len(ukey), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, ubrow[1:] != ubrow[:-1]])
    first_in_brow[starts] = np.arange(len(ukey))[starts]
    np.maximum.accumulate(first_in_brow, out=first_in_brow)
    uslot = np.arange(len(ukey)) - first_in_brow
    W = int(uslot.max()) + 1

    data = np.zeros((R, W, bm, bn), dtype=dtype)
    cols = np.zeros((R, W), dtype=np.int32)
    cols[ubrow, uslot] = ubcol.astype(np.int32)
    np.add.at(data, (brow, uslot[inv], rows % bm, colsx % bn), vals)
    return BlockedELL(as_payload(data), jnp.asarray(cols), (M, N), nnz=int(A.nnz))


def bell_to_csr(ell):
    """Inverse conversion (testing): BlockedELL -> scipy CSR."""
    data = to_numpy(ell.data)
    cols = np.asarray(ell.cols)
    R, W, bm, bn = data.shape
    M, N = ell.shape
    r_blk = np.repeat(np.arange(R), W * bm * bn)
    slot = np.tile(np.repeat(np.arange(W), bm * bn), R)
    rr = np.tile(np.repeat(np.arange(bm), bn), R * W)
    cc = np.tile(np.arange(bn), R * W * bm)
    rows = r_blk * bm + rr
    cblk = cols[r_blk, slot]
    ccols = cblk * bn + cc
    vals = data.reshape(-1)
    keep = (vals != 0) & (rows < M) & (ccols < N)
    return sp.coo_matrix((vals[keep], (rows[keep], ccols[keep])), shape=(M, N)).tocsr()


@register_pytree_node_class
class BlockedJag:
    """Ragged blocked-CSR: variable blocks per block-row (no ELL padding).

    data:  (NB, bm, bn) dense blocks (float32 or CPair)
    bcols: (NB,) int32 column-block index of each stored block
    brows: (NB,) int32 row-block index, NON-DECREASING; every block-row in
           [0, R) appears at least once (empty rows carry one zero block),
           which lets the Pallas kernel zero its output on first visit.

    Storage is sum_r W_r blocks instead of ELL's R * max_r W_r — for
    irregular NUFFT adjoints that's a 10-30x reduction (measured: radial 2D
    adjoint Wmax=101 vs Wmean=3.2).
    """

    def __init__(self, data, bcols, brows, shape, nnz=0):
        self.data = data
        self.bcols = bcols
        self.brows = brows
        self.shape = tuple(int(s) for s in shape)
        self.nnz = int(nnz)

    @property
    def bm(self):
        return self.data.shape[1]

    @property
    def bn(self):
        return self.data.shape[2]

    @property
    def NB(self):
        return self.data.shape[0]

    @property
    def R(self):
        return max(1, -(-self.shape[0] // self.bm))

    @property
    def C(self):
        return max(1, -(-self.shape[1] // self.bn))

    @property
    def dtype(self):
        return self.data.dtype

    def memusage(self):
        return self.data.nbytes + self.bcols.nbytes + self.brows.nbytes

    def fill_fraction(self):
        stored = self.data.size
        return self.nnz / stored if stored else 0.0

    def smem_ok(self, budget_bytes=400 * 1024):
        """Do brows+bcols fit the Pallas scalar-prefetch SMEM budget?"""
        return 2 * 4 * self.NB <= budget_bytes

    def tree_flatten(self):
        return (self.data, self.bcols, self.brows), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.bcols, obj.brows = children
        obj.shape, obj.nnz = aux
        return obj

    def __repr__(self):
        return (
            f"BlockedJag(shape={self.shape}, NB={self.NB}, "
            f"tile=({self.bm},{self.bn}), dtype={self.data.dtype}, "
            f"nnz={self.nnz}, fill={self.fill_fraction():.4f})"
        )


def csr_to_jag(A, bm=8, bn=128, dtype=None, auto_bm=True,
               smem_budget=400 * 1024):
    """scipy sparse -> BlockedJag (host-side, vectorized numpy).

    With ``auto_bm``, bm doubles (up to 128) until the block index arrays
    fit the Pallas SMEM budget, trading a little fill for kernel coverage.
    """
    A = sp.coo_matrix(A)
    M, N = A.shape
    if dtype is None:
        dtype = np.complex64 if np.iscomplexobj(A.data) else np.float32

    while True:
        R = max(1, -(-M // bm) if M else 1)
        C = max(1, -(-N // bn) if N else 1)
        if A.nnz == 0:
            data = np.zeros((R, bm, bn), dtype=dtype)
            return BlockedJag(as_payload(data),
                              jnp.zeros((R,), jnp.int32),
                              jnp.asarray(np.arange(R, dtype=np.int32)),
                              (M, N), nnz=0)
        rows = A.row.astype(np.int64)
        colsx = A.col.astype(np.int64)
        brow = rows // bm
        bcol = colsx // bn
        key = brow * C + bcol
        ukey, inv = np.unique(key, return_inverse=True)
        ubrow = (ukey // C).astype(np.int64)
        # add one zero block for every empty block-row
        missing = np.setdiff1d(np.arange(R, dtype=np.int64), ubrow,
                               assume_unique=False)
        NB = len(ukey) + len(missing)
        if auto_bm and 2 * 4 * NB > smem_budget and bm < 128:
            bm *= 2
            continue
        break

    all_brow = np.concatenate([ubrow, missing])
    all_bcol = np.concatenate([(ukey % C).astype(np.int64),
                               np.zeros(len(missing), np.int64)])
    order = np.argsort(all_brow, kind="stable")
    all_brow = all_brow[order]
    all_bcol = all_bcol[order]
    # position of each original unique block after the sort
    pos = np.empty(NB, dtype=np.int64)
    pos[order] = np.arange(NB)
    blk_of_nnz = pos[inv]

    vals = A.data.astype(dtype)
    data = np.zeros((NB, bm, bn), dtype=dtype)
    np.add.at(data, (blk_of_nnz, rows % bm, colsx % bn), vals)
    return BlockedJag(
        as_payload(data),
        jnp.asarray(all_bcol.astype(np.int32)),
        jnp.asarray(all_brow.astype(np.int32)),
        (M, N), nnz=int(A.nnz))


def jag_to_csr(jag):
    """Inverse conversion (testing): BlockedJag -> scipy CSR."""
    data = to_numpy(jag.data)
    bcols = np.asarray(jag.bcols)
    brows = np.asarray(jag.brows)
    NB, bm, bn = data.shape
    M, N = jag.shape
    b = np.repeat(np.arange(NB), bm * bn)
    rr = np.tile(np.repeat(np.arange(bm), bn), NB)
    cc = np.tile(np.arange(bn), NB * bm)
    rows = brows[b] * bm + rr
    ccols = bcols[b] * bn + cc
    vals = data.reshape(-1)
    keep = (vals != 0) & (rows < M) & (ccols < N)
    return sp.coo_matrix((vals[keep], (rows[keep], ccols[keep])),
                         shape=(M, N)).tocsr()


@register_pytree_node_class
class ElementELL:
    """Element-level ELL: exactly-nnz storage for very sparse matrices.

    data: (M, L) weights (rows padded with zeros), cols: (M, L) int32.
    Used when blocked tiles would blow up memory (3D gridding matrices sit
    at ~1% block fill: tiles would be 30-100x nnz bytes). The forward apply
    is a gather+reduce; the adjoint is a scatter-add FROM THE SAME ARRAYS
    (no transposed structure is ever built — the adjoint of a gather is a
    scatter of the conjugate weights).
    """

    def __init__(self, data, cols, shape, nnz=0, adj_rows=None,
                 adj_vals=None, adj_segs=None):
        self.data = data
        self.cols = cols
        self.shape = tuple(int(s) for s in shape)
        self.nnz = int(nnz)
        # optional column-sorted layout: adjoint = gather + SORTED
        # segment_sum instead of a scatter-add (TPU scatters serialize)
        self.adj_rows = adj_rows   # (nnz,) int32 row of each nnz
        self.adj_vals = adj_vals   # (nnz,) weights, sorted by column
        self.adj_segs = adj_segs   # (nnz,) int32 column of each nnz (sorted)

    @property
    def L(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    def memusage(self):
        b = self.data.nbytes + self.cols.nbytes
        for a in (self.adj_rows, self.adj_vals, self.adj_segs):
            if a is not None:
                b += a.nbytes
        return b

    def fill_fraction(self):
        return self.nnz / max(self.data.size, 1)

    def tree_flatten(self):
        return ((self.data, self.cols, self.adj_rows, self.adj_vals,
                 self.adj_segs), (self.shape, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.data, obj.cols, obj.adj_rows, obj.adj_vals,
         obj.adj_segs) = children
        obj.shape, obj.nnz = aux
        return obj

    def __repr__(self):
        return (f"ElementELL(shape={self.shape}, L={self.L}, "
                f"dtype={self.data.dtype}, nnz={self.nnz})")


def csr_to_element(A, dtype=None, adjoint_segments=True):
    """scipy sparse -> ElementELL (host-side).

    ``adjoint_segments``: also store the nonzeros sorted by column so the
    adjoint runs as gather + sorted segment_sum (a scatter-add otherwise).
    """
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    M, N = A.shape
    if dtype is None:
        dtype = np.complex64 if np.iscomplexobj(A.data) else np.float32
    nnz_row = np.diff(A.indptr)
    L = max(1, int(nnz_row.max()) if M else 1)
    data = np.zeros((max(M, 1), L), dtype=dtype)
    cols = np.zeros((max(M, 1), L), dtype=np.int32)
    r = np.repeat(np.arange(M), nnz_row)
    slot = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz_row)
    data[r, slot] = A.data.astype(dtype)
    cols[r, slot] = A.indices
    adj_rows = adj_vals = adj_segs = None
    if adjoint_segments and A.nnz:
        Ac = A.tocsc()
        adj_vals = as_payload(Ac.data.astype(dtype))
        adj_rows = jnp.asarray(Ac.indices.astype(np.int32))
        segs = np.repeat(np.arange(N), np.diff(Ac.indptr))
        adj_segs = jnp.asarray(segs.astype(np.int32))
    return ElementELL(as_payload(data), jnp.asarray(cols), (M, N),
                      nnz=int(A.nnz), adj_rows=adj_rows,
                      adj_vals=adj_vals, adj_segs=adj_segs)


def element_to_csr(e):
    data = to_numpy(e.data)
    cols = np.asarray(e.cols)
    M, N = e.shape
    rows = np.repeat(np.arange(data.shape[0]), data.shape[1])
    keep = data.ravel() != 0
    return sp.coo_matrix(
        (data.ravel()[keep], (rows[keep], cols.ravel()[keep])),
        shape=(M, N)).tocsr()


def element_spmm(e, x, adjoint=False, precision="highest"):
    """y = A @ x (or A^H @ x) for ElementELL A.

    forward: y[i] = sum_l data[i,l] * x[cols[i,l]]  (gather + reduce)
    adjoint: y[cols[i,l]] += conj(data[i,l]) * x[i] (scatter-add)
    """
    M, N = e.shape
    K = x.shape[1]
    data = unpack(e.data)
    out_dtype = jnp.result_type(data.dtype, x.dtype)
    if adjoint:
        if e.adj_segs is not None:
            # column-sorted layout: gather + sorted segment_sum
            vals = jnp.conj(unpack(e.adj_vals))
            contrib = vals[:, None] * x[e.adj_rows]          # (nnz, K)
            return jax.ops.segment_sum(
                contrib, e.adj_segs, num_segments=N,
                indices_are_sorted=True).astype(out_dtype)
        contrib = jnp.conj(data)[..., None] * x[:, None, :]  # (M, L, K)
        y = jnp.zeros((N, K), dtype=out_dtype)
        return y.at[e.cols.reshape(-1)].add(
            contrib.reshape(-1, K), indices_are_sorted=False,
            unique_indices=False)
    g = x[e.cols]  # (M, L, K)
    y = jnp.einsum("ml,mlk->mk", data, g, precision=precision)
    return y.astype(out_dtype)


def estimate_jag_bytes(A, bm=8, bn=128):
    """Cheap host estimate of BlockedJag tile bytes (no materialization).

    Counts the zero block every empty block-row carries (the converter adds
    them so the kernel can zero-init on first visit) — for very tall sparse
    adjoints those dominate.
    """
    A = sp.coo_matrix(A)
    esz = 8 if np.iscomplexobj(A.data) else 4  # CPair stores 2 f32 planes
    R = max(1, -(-A.shape[0] // bm))
    if A.nnz == 0:
        return R * bm * bn * esz
    C = max(1, -(-A.shape[1] // bn))
    brow = A.row.astype(np.int64) // bm
    key = brow * C + A.col.astype(np.int64) // bn
    ukey = np.unique(key)
    n_brows = len(np.unique(ukey // C))
    NB = len(ukey) + (R - n_brows)
    return NB * bm * bn * esz


def jag_spmm(jag, x, precision="highest"):
    """y = A @ x for BlockedJag A — pure-jnp path (gather + segment_sum)."""
    M, N = jag.shape
    K = x.shape[1]
    bm, bn, R, C = jag.bm, jag.bn, jag.R, jag.C
    out_dtype = jnp.result_type(jag.data.dtype, x.dtype)
    data = unpack(jag.data)
    xb = _pad_rows(x, C * bn).reshape(C, bn, K)
    g = xb[jag.bcols]  # (NB, bn, K)
    prod = jnp.einsum("nmb,nbk->nmk", data, g,
                      precision=precision).astype(out_dtype)
    y = jax.ops.segment_sum(prod, jag.brows, num_segments=R,
                            indices_are_sorted=True)
    return y.reshape(R * bm, K)[:M]


def _pad_rows(x, n_padded):
    pad = n_padded - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def bell_spmm(ell, x, precision="highest"):
    """y = A @ x with A in BlockedELL form — pure-jnp path (runs on CPU/TPU).

    x: (N, K) -> y: (M, K). Loops over the (small, static) ELL width with
    ``lax.scan``-free Python unrolling so XLA fuses gather+matmul per slot
    without materializing the full (R, W, bn, K) gather.
    """
    M, N = ell.shape
    K = x.shape[1]
    bm, bn, R, C = ell.bm, ell.bn, ell.R, ell.C
    out_dtype = jnp.result_type(ell.data.dtype, x.dtype)
    data = unpack(ell.data)  # CPair -> complex inside traced code
    xb = _pad_rows(x, C * bn).reshape(C, bn, K)
    y = jnp.zeros((R, bm, K), dtype=out_dtype)
    for w in range(ell.W):
        xg = xb[ell.cols[:, w]]  # (R, bn, K)
        y = y + jnp.einsum(
            "rmn,rnk->rmk", data[:, w], xg, precision=precision
        ).astype(out_dtype)
    return y.reshape(R * bm, K)[:M]
