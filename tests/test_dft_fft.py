"""Matmul-DFT block-layout padded FFTs (ops/dft_fft.py) vs numpy oracle
and vs the jnp.fft path (ops/toeplitz_fft.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from indigo_tpu.ops.dft_fft import (
    dft_pad2x_mats, block_perm, block_spectrum,
    fft_pad2x_block, ifft_crop2x_block, toeplitz_apply_block)
from indigo_tpu.utils import rand64c, rel_err


@pytest.mark.parametrize("shape", [(16,), (8, 12), (6, 8, 10)])
@pytest.mark.parametrize("batch", [1, 3])
def test_fft_pad2x_block_vs_numpy(shape, batch, rng):
    x = rand64c(batch, *shape, rng=rng)
    out = np.asarray(fft_pad2x_block(jnp.asarray(x)))
    big = np.zeros((batch,) + tuple(2 * s for s in shape), np.complex64)
    big[(slice(None),) + tuple(slice(0, s) for s in shape)] = x
    ref = np.fft.fftn(big, axes=tuple(range(1, 1 + len(shape))))
    # block layout: stored index s -> true frequency perm[s]
    ref_block = ref[np.ix_(np.arange(batch),
                           *(block_perm(2 * s) for s in shape))]
    assert rel_err(out, ref_block) < 1e-5


@pytest.mark.parametrize("shape", [(16,), (8, 12), (6, 8, 10)])
def test_roundtrip_is_identity_with_ones_kernel(shape, rng):
    """FFT then IFFT with a ones spectrum must reproduce the input exactly
    (pad -> transform -> inverse -> crop == identity)."""
    x = rand64c(2, *shape, rng=rng)
    Tfb = np.ones(tuple(2 * s for s in shape), np.float32)
    out = np.asarray(toeplitz_apply_block(jnp.asarray(Tfb), jnp.asarray(x)))
    assert rel_err(out, x) < 1e-5


@pytest.mark.parametrize("shape", [(8, 12), (6, 8, 10)])
def test_matches_jnp_fft_path(shape, rng):
    """Same circular convolution as the interleaved jnp.fft path."""
    from indigo_tpu.ops.toeplitz_fft import fft_pad2x, ifft_crop2x

    x = rand64c(2, *shape, rng=rng)
    Tf = rng.standard_normal(
        tuple(2 * s for s in shape)).astype(np.float32)
    axes = tuple(range(1, 1 + len(shape)))
    ref = np.asarray(ifft_crop2x(
        jnp.asarray(Tf)[None] * fft_pad2x(jnp.asarray(x), axes), axes))
    out = np.asarray(toeplitz_apply_block(
        jnp.asarray(block_spectrum(Tf)), jnp.asarray(x)))
    assert rel_err(out, ref) < 1e-5


def test_block_spectrum_involution_shapes(rng):
    Tf = rng.standard_normal((8, 12)).astype(np.float32)
    Tb = block_spectrum(Tf)
    assert Tb.shape == Tf.shape
    # the permutation is a bijection: every value appears exactly once
    assert np.allclose(np.sort(Tb.ravel()), np.sort(Tf.ravel()))
    # spot-check: stored index s<n holds even frequency 2s
    assert Tb[1, 2] == Tf[2, 4]
    assert Tb[5, 7] == Tf[2 * (5 - 4) + 1, 2 * (7 - 6) + 1]


def test_mats_are_exact_dfts():
    n = 16
    Mf, Mi = dft_pad2x_mats(n)
    x = np.random.default_rng(0).standard_normal(n).astype(np.complex64)
    big = np.zeros(2 * n, np.complex64)
    big[:n] = x
    X = np.fft.fft(big)
    p = block_perm(2 * n)
    assert rel_err(Mf @ x, X[p]) < 1e-5
    assert rel_err(Mi @ (X[p]), x) < 1e-5


def test_toeplitz_normal_dft_matches_fft_method(rng):
    """ToeplitzNormal(method='dft') == ToeplitzNormal(method='fft')."""
    from indigo_tpu.toeplitz import ToeplitzNormal

    img = (8, 10)
    Tf = rng.standard_normal(tuple(2 * s for s in img)).astype(np.float32)
    x = rand64c(int(np.prod(img)), 3, rng=rng)
    Kd = ToeplitzNormal(Tf, img)              # default: dft
    Kf = ToeplitzNormal(Tf, img, method="fft")
    assert rel_err(np.asarray(Kd * x), np.asarray(Kf * x)) < 1e-5
    # pytree round-trip keeps the method + block payload
    import jax
    leaves, td = jax.tree_util.tree_flatten(Kd)
    Kd2 = jax.tree_util.tree_unflatten(td, leaves)
    assert rel_err(np.asarray(Kd2 * x), np.asarray(Kf * x)) < 1e-5


def test_sense_normal_batched_layouts_agree(rng):
    """layout='raw' (device permute) == 'block' (host permute) == 'fft'."""
    import indigo_tpu as it
    from indigo_tpu.parallel.recon import sense_normal_batched

    img = (8, 8)
    nc, S = 3, 2
    Tf = rng.standard_normal(tuple(2 * s for s in img)).astype(np.float32)
    maps = rand64c(nc, *img, rng=rng)
    xs = rand64c(S, int(np.prod(img)), rng=rng)
    def f(lay):
        return it.cplx.cjit(
            lambda T, m, x: sense_normal_batched(T, m, x, layout=lay))
    y_raw = np.asarray(f("raw")(jnp.asarray(Tf), maps, xs))
    y_blk = np.asarray(
        f("block")(jnp.asarray(block_spectrum(Tf)), maps, xs))
    y_fft = np.asarray(f("fft")(jnp.asarray(Tf), maps, xs))
    assert rel_err(y_raw, y_fft) < 1e-5
    assert rel_err(y_blk, y_fft) < 1e-5
