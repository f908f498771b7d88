"""BlockedELL conversion + SpMM vs scipy ground truth (SURVEY.md §4)."""
import numpy as np
import pytest
import scipy.sparse as sp

from indigo_tpu.sparse import csr_to_bell, bell_to_csr, bell_spmm
from indigo_tpu.utils import rand64c, randM, rel_err


@pytest.mark.parametrize("m,n,density", [
    (8, 128, 0.5), (100, 300, 0.05), (1, 1, 1.0), (257, 129, 0.02),
    (64, 64, 0.0),
])
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_roundtrip(m, n, density, dtype, rng):
    A = randM(m, n, density, rng=rng, dtype=dtype)
    ell = csr_to_bell(A)
    B = bell_to_csr(ell)
    assert (abs(A - B)).max() < 1e-6 if A.nnz else B.nnz == 0
    assert ell.nnz == A.nnz


@pytest.mark.parametrize("m,n,k", [(100, 300, 1), (300, 100, 7), (8, 8, 3)])
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_spmm(m, n, k, dtype, rng):
    A = randM(m, n, 0.05, rng=rng, dtype=dtype)
    x = rand64c(n, k, rng=rng)
    if dtype == np.float32:
        x = x.real.copy()
    ell = csr_to_bell(A)
    y = np.asarray(bell_spmm(ell, x))
    y_ref = A @ x
    assert rel_err(y, y_ref) < 1e-6


def test_spmm_real_matrix_complex_x(rng):
    A = randM(50, 70, 0.1, rng=rng, dtype=np.float32)
    x = rand64c(70, 4, rng=rng)
    y = np.asarray(bell_spmm(csr_to_bell(A), x))
    assert rel_err(y, A @ x) < 1e-6


def test_duplicates_summed():
    # COO with duplicate entries must sum, matching CSR semantics.
    rows = np.array([0, 0, 1])
    cols = np.array([3, 3, 200])
    vals = np.array([1.0, 2.0, 5.0], dtype=np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(4, 300))
    ell = csr_to_bell(A)
    B = bell_to_csr(ell)
    assert B[0, 3] == 3.0 and B[1, 200] == 5.0
