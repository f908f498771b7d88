"""Fused Pallas Toeplitz kernels (ops/dft_pallas.py) vs the jnp matmul-DFT
oracle, in interpret mode on CPU (the TPU-compiled path is exercised by
bench.py and the verify recipe).

Tolerances are ~1e-4: the kernels run Karatsuba x bf16x3 float32 emulation
(~1.2e-5 round-trip error), not exact f32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indigo_tpu.ops.dft_fft import block_spectrum, toeplitz_apply_block
from indigo_tpu.ops.dft_pallas import (
    pallas_spectrum, toeplitz_apply_pallas, pallas_supported)
from indigo_tpu.utils import rand64c, rel_err


@pytest.mark.parametrize("shape", [(16, 16, 16), (8, 16, 32), (24, 8, 16)])
def test_matches_jnp_block_path(shape, rng):
    n1, n2, n3 = shape
    Tf = rng.standard_normal((2 * n1, 2 * n2, 2 * n3)).astype(np.float32)
    u = rand64c(2, *shape, rng=rng)
    ref = np.asarray(jax.jit(toeplitz_apply_block)(
        jnp.asarray(block_spectrum(Tf)), jnp.asarray(u)))
    out = np.asarray(toeplitz_apply_pallas(
        jnp.asarray(pallas_spectrum(Tf)), jnp.asarray(u), interpret=True))
    assert rel_err(out, ref) < 2e-4


# one >128 axis at a time: exercises every radix-2 role pair
# (z: fwd_T/inv_M, y: fwd_M/inv_M, x: fwd_T/inv_T) without a big volume
@pytest.mark.parametrize("shape", [(136, 8, 16), (8, 136, 16), (8, 16, 136)])
def test_radix2_axes_match_jnp_block_path(shape, rng):
    n1, n2, n3 = shape
    Tf = rng.standard_normal((2 * n1, 2 * n2, 2 * n3)).astype(np.float32)
    u = rand64c(1, *shape, rng=rng)
    ref = np.asarray(jax.jit(toeplitz_apply_block)(
        jnp.asarray(block_spectrum(Tf)), jnp.asarray(u)))
    out = np.asarray(toeplitz_apply_pallas(
        jnp.asarray(pallas_spectrum(Tf)), jnp.asarray(u), interpret=True))
    assert rel_err(out, ref) < 2e-4


def test_sigma_basis_contract(rng):
    # solver contract: sigma in, sigma out == natural path conjugated by
    # the per-radix-axis reorder (so CG loops can skip per-iter fixups)
    from indigo_tpu.ops.dft_pallas import (
        to_sigma_basis, from_sigma_basis, uses_sigma_basis)

    shape = (136, 8, 136)            # two radix axes at once
    assert uses_sigma_basis(shape)
    sig_ax = (1, 3)
    Tf = rng.standard_normal(
        tuple(2 * s for s in shape)).astype(np.float32)
    u = rand64c(1, *shape, rng=rng)
    Tp = jnp.asarray(pallas_spectrum(Tf))
    ref = np.asarray(toeplitz_apply_pallas(Tp, jnp.asarray(u),
                                           interpret=True))
    us = to_sigma_basis(jnp.asarray(u), sig_ax)
    out = from_sigma_basis(
        toeplitz_apply_pallas(Tp, us, interpret=True, sigma=True), sig_ax)
    assert rel_err(np.asarray(out), ref) < 1e-5
    # round-trip of the reorder helpers
    assert np.allclose(
        np.asarray(from_sigma_basis(to_sigma_basis(jnp.asarray(u), sig_ax),
                                    sig_ax)), u)


def test_toeplitz_sigma_basis_conjugation(rng):
    # operator-level solver form: K == P.H * K_sigma * P on radix volumes
    from indigo_tpu.toeplitz import ToeplitzNormal

    img = (8, 8, 136)
    Tf = rng.standard_normal(tuple(2 * s for s in img)).astype(np.float32)
    K = ToeplitzNormal(Tf, img, method="pallas")
    Ks, P = K.sigma_basis()
    assert P is not None
    x = rand64c(int(np.prod(img)), 2, rng=rng)
    lhs = np.asarray(K * x)
    rhs = np.asarray(P.H * (Ks * (P * x)))
    assert rel_err(rhs, lhs) < 1e-5
    # no-op on non-radix volumes
    K64 = ToeplitzNormal(Tf[:16, :16, :32], (8, 8, 16), method="pallas")
    Ks64, P64 = K64.sigma_basis()
    assert Ks64 is K64 and P64 is None


def test_identity_kernel_roundtrip(rng):
    shape = (16, 16, 16)
    u = rand64c(1, *shape, rng=rng)
    Tfp = jnp.asarray(pallas_spectrum(
        np.ones(tuple(2 * s for s in shape), np.float32)))
    out = np.asarray(toeplitz_apply_pallas(Tfp, jnp.asarray(u),
                                           interpret=True))
    assert rel_err(out, u) < 2e-4


def test_supported_predicate():
    assert pallas_supported((128, 128, 128))
    assert pallas_supported((8, 16, 128))
    assert pallas_supported((256, 256, 256))       # fits 100MB VMEM budget
    assert not pallas_supported((512, 512, 512))   # VMEM-gated
    assert not pallas_supported((12, 16, 16))      # not multiple of 8
    assert not pallas_supported((16, 16))          # 2D


def test_toeplitz_normal_pallas_method(rng):
    from indigo_tpu.toeplitz import ToeplitzNormal

    img = (8, 8, 16)
    Tf = rng.standard_normal(tuple(2 * s for s in img)).astype(np.float32)
    x = rand64c(int(np.prod(img)), 2, rng=rng)
    Kp = ToeplitzNormal(Tf, img, method="pallas")
    Kd = ToeplitzNormal(Tf, img, method="dft")
    assert rel_err(np.asarray(Kp * x), np.asarray(Kd * x)) < 2e-4
    # auto on CPU resolves to dft
    Ka = ToeplitzNormal(Tf, img)
    assert Ka._method == "dft"


@pytest.mark.parametrize("img", [(8, 8, 8), (8, 136, 8)])
def test_sense_normal_batched_pallas_layout(img, rng):
    import indigo_tpu as it
    from indigo_tpu.parallel.recon import sense_normal_batched

    nc, S = 2, 2
    Tf = rng.standard_normal(tuple(2 * s for s in img)).astype(np.float32)
    maps = rand64c(nc, *img, rng=rng)
    xs = rand64c(S, int(np.prod(img)), rng=rng)

    def f(lay, T):
        return np.asarray(it.cplx.cjit(
            lambda T, m, x: sense_normal_batched(T, m, x, layout=lay)
        )(jnp.asarray(T), maps, xs))

    ref = f("block", block_spectrum(Tf))
    out = f("pallas", pallas_spectrum(Tf))
    assert rel_err(out, ref) < 2e-4
