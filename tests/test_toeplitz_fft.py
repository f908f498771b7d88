"""Zero-aware padded FFTs vs explicit pad + fftn."""
import numpy as np
import pytest
import jax.numpy as jnp

from indigo_tpu.ops.toeplitz_fft import fft_pad2x, ifft_crop2x
from indigo_tpu.utils import rand64c, rel_err


@pytest.mark.parametrize("shape,axes", [
    ((8,), (0,)), ((8, 6), (0, 1)), ((4, 6, 8), (0, 1, 2)),
    ((4, 6, 3), (1,)),        # only one axis padded
    ((5, 8, 2), (0, 1)),      # batch-like trailing dim untouched
])
def test_fft_pad2x(shape, axes, rng):
    x = rand64c(*shape, rng=rng)
    out = np.asarray(fft_pad2x(jnp.asarray(x), axes))
    pad = [(0, shape[a]) if a in axes else (0, 0) for a in range(len(shape))]
    ref = np.fft.fftn(np.pad(x, pad), axes=axes)
    assert rel_err(out, ref) < 1e-5


@pytest.mark.parametrize("shape,axes", [
    ((16,), (0,)), ((8, 12), (0, 1)), ((8, 4, 6), (0, 1, 2)),
])
def test_ifft_crop2x(shape, axes, rng):
    X = rand64c(*shape, rng=rng)
    out = np.asarray(ifft_crop2x(jnp.asarray(X), axes))
    full = np.fft.ifftn(X, axes=axes)
    sl = tuple(slice(0, shape[a] // 2) if a in axes else slice(None)
               for a in range(len(shape)))
    assert rel_err(out, full[sl]) < 1e-5


def test_roundtrip_toeplitz_shape(rng):
    """crop(ifft(T*fft(pad(x)))) == zero-aware version, on random T."""
    n = 8
    x = rand64c(n, n, rng=rng)
    T = rng.standard_normal((2 * n, 2 * n)).astype(np.float32)
    ref = np.fft.ifftn(T * np.fft.fftn(np.pad(x, ((0, n), (0, n)))))[:n, :n]
    out = np.asarray(ifft_crop2x(
        jnp.asarray(T) * fft_pad2x(jnp.asarray(x), (0, 1)), (0, 1)))
    assert rel_err(out, ref) < 1e-5
