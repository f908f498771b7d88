"""Pallas ELL SpMM kernel vs scipy oracle, in interpret mode on CPU.

(SURVEY.md §4 test plan item 4: "Pallas SpMM kernel vs scipy.sparse oracle
on the exact blocked-ELL tiling".) On real TPU the same code path runs
compiled; the bench harness exercises that.
"""
import numpy as np
import pytest

from indigo_tpu.sparse import csr_to_bell
from indigo_tpu.ops.ell_spmm import ell_spmm_pallas
from indigo_tpu.ops import spmm, set_spmm_impl
from indigo_tpu.utils import randM, rand64c, rel_err


@pytest.mark.parametrize("m,n,k,density", [
    (64, 256, 8, 0.05),
    (100, 300, 4, 0.02),
    (8, 128, 128, 0.5),
    (257, 640, 16, 0.01),
])
def test_kernel_vs_scipy(m, n, k, density, rng):
    A = randM(m, n, density, rng=rng, dtype=np.float32)
    x = rng.standard_normal((n, k), dtype=np.float32)
    ell = csr_to_bell(A)
    y = np.asarray(ell_spmm_pallas(ell, x, interpret=True))
    assert rel_err(y, A @ x) < 1e-5


def test_dispatch_complex_x_through_pallas(rng):
    """Real matrix x complex vector via the [Re|Im] column-folding path."""
    A = randM(60, 200, 0.05, rng=rng, dtype=np.float32)
    x = rand64c(200, 3, rng=rng)
    ell = csr_to_bell(A)
    set_spmm_impl("pallas")
    try:
        y = np.asarray(spmm(ell, x))
    finally:
        set_spmm_impl("auto")
    assert rel_err(y, A @ x) < 1e-5
