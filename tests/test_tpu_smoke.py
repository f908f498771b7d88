"""TPU-compiled kernel smoke lane (Mosaic lowering regressions).

The CPU suite runs every Pallas kernel in interpret mode, which cannot catch
Mosaic lowering/compile regressions. This file compiles each kernel for the
REAL device and checks it against the jnp/scipy oracle on small shapes. Run
with:

    INDIGO_TEST_PLATFORM=axon python -m pytest tests/test_tpu_smoke.py -q

Skipped automatically on CPU. Axon constraint: no complex array may cross
the host<->device boundary eagerly (the runtime holds no complex buffers,
and one failed complex allocation poisons the process) — everything here
moves float32 planes and forms complex values inside jit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU-compiled kernel smoke lane (set INDIGO_TEST_PLATFORM=axon)")


def test_jag_spmm_pallas_compiles_and_matches(rng):
    import scipy.sparse as sp
    from indigo_tpu.sparse import csr_to_jag
    from indigo_tpu.ops.ell_spmm import jag_spmm_pallas

    A = sp.random(300, 700, density=0.05, format="csr",
                  random_state=np.random.RandomState(0),
                  dtype=np.float32)
    jag = csr_to_jag(A)
    x = rng.standard_normal((700, 8)).astype(np.float32)
    y = np.asarray(jag_spmm_pallas(jag, jnp.asarray(x), interpret=False))
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_ell_spmm_pallas_compiles_and_matches(rng):
    import scipy.sparse as sp
    from indigo_tpu.sparse import csr_to_bell
    from indigo_tpu.ops.ell_spmm import ell_spmm_pallas

    A = sp.random(256, 512, density=0.05, format="csr",
                  random_state=np.random.RandomState(1),
                  dtype=np.float32)
    ell = csr_to_bell(A)
    x = rng.standard_normal((512, 8)).astype(np.float32)
    y = np.asarray(ell_spmm_pallas(ell, jnp.asarray(x), interpret=False))
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_dft_pallas_compiles_and_matches(rng):
    from indigo_tpu.ops.dft_fft import block_spectrum, toeplitz_apply_block
    from indigo_tpu.ops.dft_pallas import pallas_spectrum, \
        toeplitz_apply_pallas

    shape = (16, 16, 32)
    Tf = rng.standard_normal(tuple(2 * s for s in shape)).astype(np.float32)
    ur = rng.standard_normal((2,) + shape).astype(np.float32)
    ui = rng.standard_normal((2,) + shape).astype(np.float32)
    Tb = jnp.asarray(block_spectrum(Tf))
    Tp = jnp.asarray(pallas_spectrum(Tf))

    @jax.jit
    def ref(Tb, ur, ui):
        o = toeplitz_apply_block(Tb, jax.lax.complex(ur, ui))
        return o.real, o.imag

    @jax.jit
    def out(Tp, ur, ui):
        o = toeplitz_apply_pallas(Tp, jax.lax.complex(ur, ui))
        return o.real, o.imag

    rr, ri = ref(Tb, jnp.asarray(ur), jnp.asarray(ui))
    orr, ori = out(Tp, jnp.asarray(ur), jnp.asarray(ui))
    err = (np.linalg.norm(np.asarray(orr) - np.asarray(rr))
           / np.linalg.norm(np.asarray(rr)))
    assert err < 2e-4


@pytest.mark.parametrize("shape", [
    (8, 136, 16),    # radix y: fwd_M (kernel A) + inv_M (kernel C)
    (16, 16, 136),   # radix x: fwd_T (kernel B) + inv_T (kernel C) —
                     # otherwise TPU-compiled only via the all-radix bench
])
def test_dft_pallas_radix2_compiles_and_matches(shape, rng):
    # >128 axes: the radix-2 stage path (sigma-basis splits/concats) must
    # survive Mosaic lowering per role pair
    from indigo_tpu.ops.dft_fft import block_spectrum, toeplitz_apply_block
    from indigo_tpu.ops.dft_pallas import pallas_spectrum, \
        toeplitz_apply_pallas

    Tf = rng.standard_normal(tuple(2 * s for s in shape)).astype(np.float32)
    ur = rng.standard_normal((2,) + shape).astype(np.float32)
    ui = rng.standard_normal((2,) + shape).astype(np.float32)
    Tb = jnp.asarray(block_spectrum(Tf))
    Tp = jnp.asarray(pallas_spectrum(Tf))

    @jax.jit
    def ref(Tb, ur, ui):
        o = toeplitz_apply_block(Tb, jax.lax.complex(ur, ui))
        return o.real, o.imag

    @jax.jit
    def out(Tp, ur, ui):
        o = toeplitz_apply_pallas(Tp, jax.lax.complex(ur, ui))
        return o.real, o.imag

    rr, _ = ref(Tb, jnp.asarray(ur), jnp.asarray(ui))
    orr, _ = out(Tp, jnp.asarray(ur), jnp.asarray(ui))
    err = (np.linalg.norm(np.asarray(orr) - np.asarray(rr))
           / np.linalg.norm(np.asarray(rr)))
    assert err < 2e-4


def test_tile_interp_compiles_and_matches(rng):
    from indigo_tpu.noncart import interp_mat, beatty_beta
    from indigo_tpu.ops.tile_interp import plan_tile_interp, \
        tile_interp_apply

    grid = (16, 16, 24)
    traj = (rng.random((400, 3)) - 0.5).astype(np.float64)
    beta = beatty_beta(4, 1.5)
    A = interp_mat(traj, grid, width=4, beta=beta, impl="numpy")
    plan = plan_tile_interp(traj, grid, width=4, beta=beta)
    N = int(np.prod(grid))
    x = rng.standard_normal((N, 4)).astype(np.float32)
    y = rng.standard_normal((400, 4)).astype(np.float32)
    fwd = np.asarray(tile_interp_apply(plan, jnp.asarray(x)))
    assert np.linalg.norm(fwd - A @ x) / np.linalg.norm(A @ x) < 1e-5
    adj = np.asarray(tile_interp_apply(plan, jnp.asarray(y), adjoint=True))
    ref = A.T @ y
    assert np.linalg.norm(adj - ref) / np.linalg.norm(ref) < 1e-5


def test_griddft_fused_compiles_and_matches(rng):
    """The fused GridDFT leaf (tiled-adjoint IDFT + linear_transpose
    forward — the round-4 rewrite) compiled for the real device matches
    the unfused KBInterp * CenteredDFT chain in both directions."""
    from indigo_tpu.models import nufft_op
    from indigo_tpu.utils import rand64c, rel_err

    img = (8, 8, 8)
    traj = (rng.random((200, 3)) - 0.5).astype(np.float64)
    A_f, _ = nufft_op(traj, img, oversamp=2.0, width=4, fft="mm",
                      interp="tile")
    A_x, _ = nufft_op(traj, img, oversamp=2.0, width=4, fft="xla",
                      interp="tile")
    x = rand64c(int(np.prod(img)), 2, rng=rng)
    assert rel_err(np.asarray(A_f * x), np.asarray(A_x * x)) < 2e-5
    y = rand64c(A_f.shape[0], 2, rng=rng)
    assert rel_err(np.asarray(A_f.H * y), np.asarray(A_x.H * y)) < 2e-5
