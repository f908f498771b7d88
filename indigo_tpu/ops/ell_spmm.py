"""Pallas TPU kernel: blocked-ELL SpMM (the NUFFT gridding hot path).

TPU-native replacement for the reference's hand-written SpMM kernels
(indigo/backends/_customcpu.c `exw_csrmm` and _customgpu.cu — unverified,
mount empty; SURVEY.md §2 "native-component checklist"). Design notes:

  * The matrix is pre-tiled host-side into (bm, 128) dense blocks with a
    fixed ELL width W per block-row (sparse.csr_to_bell). The kernel is a
    dense (bm,128)x(128,K) MXU matmul per (block-row, slot) grid step —
    no scatter anywhere: the adjoint uses a separately tiled A^H, so both
    directions are gather-shaped (the TPU answer to the reference's
    "exclusive-write" race-avoidance design).
  * Column-block indices are scalar-prefetched (SMEM) and drive the x-block
    BlockSpec index_map, so the needed 128-row slab of x is DMA'd from HBM
    per step — x never has to fit in VMEM whole.
  * The output block stays resident in VMEM across the inner W loop
    (out index_map ignores w), accumulating in f32.

Complex data is handled by the caller (ops.spmm): a real matrix times a
complex x runs as one f32 kernel over [Re | Im] stacked columns; a complex
matrix runs 4 real SpMMs (rarely hot: gridding matrices are real).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse import BlockedELL, BlockedJag, _pad_rows

__all__ = ["ell_spmm_pallas", "jag_spmm_pallas"]


def _kernel(cols_ref, data_ref, x_ref, out_ref):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # precision=HIGHEST: the MXU natively multiplies in bf16; 3-pass f32
    # emulation is required to hit the <=1e-6 rel-err target (SURVEY.md §7
    # hard parts). SpMM is bandwidth-bound, so the extra passes are free.
    out_ref[0] += jnp.dot(
        data_ref[0, 0], x_ref[0],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_spmm_call(data, cols, xb, interpret=False):
    R, W, bm, bn = data.shape
    C, _, K = xb.shape
    grid = (R, W)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bm, bn),
                    lambda r, w, cols_ref: (r, w, 0, 0),
                ),
                pl.BlockSpec(
                    (1, bn, K),
                    lambda r, w, cols_ref: (cols_ref[r * W + w], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec((1, bm, K), lambda r, w, cols_ref: (r, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, bm, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * W * bm * bn * K,
            bytes_accessed=data.nbytes + R * W * (bn * K * 4) + R * bm * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols.reshape(-1), data, xb)
    return out


def _jag_kernel(brows_ref, bcols_ref, data_ref, x_ref, out_ref):
    i = pl.program_id(0)
    prev = brows_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (brows_ref[i] != prev)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0] += jnp.dot(
        data_ref[0], x_ref[0],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def _jag_spmm_call(data, bcols, brows, xb, R, interpret=False):
    NB, bm, bn = data.shape
    C, _, K = xb.shape
    out = pl.pallas_call(
        _jag_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, bm, bn),
                             lambda i, brows, bcols: (i, 0, 0)),
                pl.BlockSpec((1, bn, K),
                             lambda i, brows, bcols: (bcols[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, K),
                                   lambda i, brows, bcols: (brows[i], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, bm, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * NB * bm * bn * K,
            bytes_accessed=data.nbytes + NB * bn * K * 4 + R * bm * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(brows, bcols, data, xb)
    return out


def jag_spmm_pallas(jag: BlockedJag, x, interpret=None):
    """y = A @ x for float32 BlockedJag A and float32 x of shape (N, K).

    The grid runs over stored blocks (ragged — no ELL padding is ever read);
    the output block stays VMEM-resident while consecutive grid steps share
    a block-row (brows is sorted), and is zeroed on first visit. Block
    row/column indices ride the scalar-prefetch SMEM path and drive the
    x-slab DMA, so x itself stays in HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, N = jag.shape
    bm, bn, R, C = jag.bm, jag.bn, jag.R, jag.C
    K = x.shape[1]
    xb = _pad_rows(x, C * bn).reshape(C, bn, K)
    y = _jag_spmm_call(jag.data, jag.bcols, jag.brows, xb, R,
                       interpret=interpret)
    return y.reshape(R * bm, K)[:M]


def ell_spmm_pallas(ell: BlockedELL, x, interpret=None):
    """y = A @ x with float32 BlockedELL A and float32 x of shape (N, K)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, N = ell.shape
    bm, bn, R, C, W = ell.bm, ell.bn, ell.R, ell.C, ell.W
    K = x.shape[1]
    xb = _pad_rows(x, C * bn).reshape(C, bn, K)
    y = _ell_spmm_call(ell.data, ell.cols, xb, interpret=interpret)
    return y.reshape(R * bm, K)[:M]
