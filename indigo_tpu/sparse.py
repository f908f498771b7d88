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

__all__ = ["BlockedELL", "csr_to_bell", "bell_spmm", "bell_to_csr"]


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
