"""Tree analyses: memory usage, FLOP/byte accounting per node.

Reference parity: indigo/analyses.py (Memusage visitor — unverified, mount
empty; SURVEY.md §2). The reference used this to pre-allocate intermediates;
XLA allocates for us, so here the analyses feed the roofline report instead:
bytes of payload per node and bytes moved / FLOPs per apply.
"""
from __future__ import annotations

import numpy as np

from .operators import (
    Operator, SpMatrix, DenseMatrix, Diag, UnscaledFFT, CenteredDFT, Eye,
    One, CropPad, Product, Adjoint, KronI, BlockDiag, VStack, HStack, Scale,
)
from .transforms import Visitor

__all__ = ["Memusage", "memusage_report", "apply_cost"]


class Memusage(Visitor):
    """Collect (name, shape, payload bytes) rows for every node."""

    def __init__(self):
        self.rows = []

    def generic_visit(self, node):
        own = node.memusage() - sum(c.memusage() for c in node.children())
        self.rows.append((node.name, node.shape, int(own)))
        for c in node.children():
            self.visit(c)
        return node


def memusage_report(op: Operator) -> str:
    v = Memusage()
    v.visit(op)
    total = op.memusage()
    lines = [f"{'node':<16} {'shape':<20} {'payload':>12}"]
    for name, shape, b in v.rows:
        lines.append(f"{name:<16} {str(shape):<20} {b:>12,}")
    lines.append(f"{'TOTAL':<16} {'':<20} {total:>12,}")
    return "\n".join(lines)


def _itemsize(dtype):
    return np.dtype(dtype).itemsize


def apply_cost(op: Operator, ncols: int = 1):
    """Estimate (flops, hbm_bytes) for one forward apply with K columns.

    Used by bench.py for the speed-of-light roofline comparison
    (north star: "per-apply time at roofline"). Complex multiply-add is
    counted as 8 flops.
    """
    K = ncols
    isz = _itemsize(op.dtype)

    def rec(node):
        if isinstance(node, SpMatrix):
            ell = node.ell
            stored = ell.data.size
            flops = 8 * stored * K  # MXU does the whole stored tile
            idx_bytes = ell.memusage() - ell.data.nbytes
            bytes_ = (ell.data.nbytes + idx_bytes
                      + (node.shape[0] + node.shape[1]) * K * isz)
            return flops, bytes_
        if isinstance(node, Diag):
            n = node.shape[0]
            return 8 * n * K, (3 * n * K + n) * isz
        if isinstance(node, DenseMatrix):
            m, n = node.shape
            return 8 * m * n * K, (m * n + (m + n) * K) * isz
        if isinstance(node, UnscaledFFT):
            n = int(np.prod(node.vol_shape))
            flops = 5 * n * max(1, int(np.log2(max(n, 2)))) * K * 2
            return flops, 2 * 2 * n * K * isz  # read+write, ~2 passes
        if isinstance(node, CenteredDFT):
            # per-axis matmul stages over a volume morphing img -> grid:
            # stage d contracts g_d x n_d over the mixed intermediate
            img, grid = node.img_shape, node.grid_shape
            flops = 0
            vol = int(np.prod(img))
            bytes_ = node.shape[1] * K * isz
            for n_, g_ in zip(img, grid):
                vol = vol // n_ * g_
                flops += 8 * vol * n_ * K
                bytes_ += 2 * vol * K * isz + n_ * g_ * isz
            return flops, bytes_
        if isinstance(node, (Eye,)):
            return 0, 0
        if isinstance(node, CropPad):
            m, n_ = node.shape
            return 0, (m + n_) * K * isz
        if type(node).__name__ == "Perm":
            n_ = node.shape[0]
            return 0, (2 * n_ * K) * isz + n_ * 4
        if type(node).__name__ == "KBInterp":
            # tile-gather interpolation: each sample reads/accumulates S
            # super-tile rows of K*128 lanes + its factored weights; the
            # tiled grid is streamed once per direction
            plan = node.plan
            M, S = plan.n_samples, plan.S
            NT = int(np.prod(plan.nt))
            gather = M * S * K * 128 * 4
            flops = 2 * M * S * K * 128
            bytes_ = (gather + plan.memusage() + NT * K * 128 * 4
                      + (node.shape[0] + node.shape[1]) * K * isz)
            return flops, bytes_
        if type(node).__name__ == "ToeplitzNormal":
            big = int(np.prod(node._T.shape))
            n_ = node.shape[0]
            flops = 5 * big * max(1, int(np.log2(max(big, 2)))) * K * 4
            # zero-aware padded round trip: ~(2+4+8)/8 passes of big + T read
            return flops, int(1.75 * big * K * isz * 2) + big * 4
        if type(node).__name__ == "DWT":
            n_ = node.shape[0]
            return 16 * n_ * K, 4 * n_ * K * isz
        if isinstance(node, One):
            m, n = node.shape
            return 2 * (m + n) * K, (m + n) * K * isz
        if isinstance(node, KronI):
            f, b = rec(node.child)
            return node.c * f, node.c * b
        if isinstance(node, (Adjoint, Scale)):
            return rec(node.children()[0])
        f = b = 0
        for c in node.children():
            cf, cb = rec(c)
            f += cf
            b += cb
        return f, b

    return rec(op)
