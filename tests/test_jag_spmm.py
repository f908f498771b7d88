"""Ragged blocked-CSR (BlockedJag) conversion + SpMM vs scipy oracle."""
import numpy as np
import pytest
import scipy.sparse as sp

from indigo_tpu.sparse import csr_to_jag, jag_to_csr, jag_spmm
from indigo_tpu.ops.ell_spmm import jag_spmm_pallas
from indigo_tpu.ops import spmm, set_spmm_impl
from indigo_tpu.utils import rand64c, randM, rel_err


@pytest.mark.parametrize("m,n,density", [
    (8, 128, 0.5), (100, 300, 0.05), (257, 129, 0.02), (64, 64, 0.0),
])
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_roundtrip(m, n, density, dtype, rng):
    A = randM(m, n, density, rng=rng, dtype=dtype)
    jag = csr_to_jag(A)
    B = jag_to_csr(jag)
    assert (abs(A - B)).max() < 1e-6 if A.nnz else B.nnz == 0
    assert jag.nnz == A.nnz
    # brows sorted and covers all block rows
    brows = np.asarray(jag.brows)
    assert (np.diff(brows) >= 0).all()
    assert set(brows.tolist()) == set(range(jag.R))


@pytest.mark.parametrize("m,n,k", [(100, 300, 1), (300, 100, 7), (8, 8, 3)])
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_jag_spmm_jnp(m, n, k, dtype, rng):
    A = randM(m, n, 0.05, rng=rng, dtype=dtype)
    x = rand64c(n, k, rng=rng)
    if dtype == np.float32:
        x = x.real.copy()
    y = np.asarray(jag_spmm(csr_to_jag(A), x))
    assert rel_err(y, A @ x) < 1e-6


@pytest.mark.parametrize("m,n,k,density", [
    (64, 256, 8, 0.05), (100, 300, 4, 0.02), (257, 640, 16, 0.01),
    (40, 1000, 8, 0.001),   # many empty block rows
])
def test_jag_pallas_vs_scipy(m, n, k, density, rng):
    A = randM(m, n, density, rng=rng, dtype=np.float32)
    x = rng.standard_normal((n, k), dtype=np.float32)
    jag = csr_to_jag(A)
    y = np.asarray(jag_spmm_pallas(jag, x, interpret=True))
    assert rel_err(y, A @ x) < 1e-5


def test_jag_empty_rows_zeroed(rng):
    """Rows with no nonzeros must come out exactly zero (first-visit init)."""
    A = sp.csr_matrix((np.ones(1, np.float32), ([17], [5])), shape=(64, 256))
    jag = csr_to_jag(A)
    x = rng.standard_normal((256, 4), dtype=np.float32)
    y = np.asarray(jag_spmm_pallas(jag, x, interpret=True))
    assert (y[0:8] == 0).all() and (y[32:] == 0).all()
    assert rel_err(y, (A @ x)) < 1e-6


def test_auto_bm_smem(rng):
    """Tall sparse matrix + tiny SMEM budget: auto_bm grows bm until the
    block index arrays fit (same growth path as production shapes, scaled
    down so interpret-mode SpMM stays fast)."""
    A = randM(6000, 1024, 0.002, rng=rng, dtype=np.float32)
    budget = 2 * 1024  # force several doublings
    jag = csr_to_jag(A, smem_budget=budget)
    assert jag.bm > 8  # growth actually happened
    assert jag.smem_ok(budget) or jag.bm == 128
    x = np.ones((1024, 2), np.float32)
    y = np.asarray(jag_spmm(jag, x))
    assert rel_err(y, A @ x) < 1e-5


def test_spmm_dispatch_jag_complex(rng):
    A = randM(60, 200, 0.05, rng=rng, dtype=np.float32)
    x = rand64c(200, 3, rng=rng)
    jag = csr_to_jag(A)
    set_spmm_impl("pallas")
    try:
        y = np.asarray(spmm(jag, x))
    finally:
        set_spmm_impl("auto")
    assert rel_err(y, A @ x) < 1e-5


# ---- ElementELL (exactly-nnz storage for very sparse matrices) ----------

from indigo_tpu.sparse import csr_to_element, element_to_csr, element_spmm


@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_element_roundtrip_and_spmm(dtype, rng):
    A = randM(80, 500, 0.01, rng=rng, dtype=dtype)
    e = csr_to_element(A)
    assert (abs(element_to_csr(e) - A)).max() < 1e-6
    x = rand64c(500, 3, rng=rng)
    y = np.asarray(element_spmm(e, x))
    assert rel_err(y, A @ x) < 1e-5
    # adjoint via scatter from the same arrays
    s = rand64c(80, 3, rng=rng)
    ya = np.asarray(element_spmm(e, s, adjoint=True))
    assert rel_err(ya, A.conj().T @ s) < 1e-5


def test_element_adjoint_consistency(rng):
    A = randM(50, 300, 0.02, rng=rng, dtype=np.complex64)
    e = csr_to_element(A)
    x = rand64c(300, 1, rng=rng)
    y = rand64c(50, 1, rng=rng)
    lhs = np.vdot(np.asarray(element_spmm(e, x)), y)
    rhs = np.vdot(x, np.asarray(element_spmm(e, y, adjoint=True)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_spmatrix_auto_format_selects_element(rng):
    """Huge sparse matrix with terrible block fill -> element storage."""
    import indigo_tpu as it
    from indigo_tpu.sparse import ElementELL
    m = 3000
    rows = np.arange(m)
    cols = (rows * 7919) % (1 << 22)
    A = sp.csr_matrix((np.ones(m, np.float32), (rows, cols)),
                      shape=(m, 1 << 22))
    op = it.SpMatrix(A)
    assert isinstance(op.ell, ElementELL)
    x = np.zeros((1 << 22, 1), np.complex64)
    x[cols[5], 0] = 2.0
    y = np.asarray(op * x)
    assert abs(y[5, 0] - 2.0) < 1e-6
    # adjoint consistency through the operator
    s = rand64c(m, 1, rng=rng)
    lhs = np.asarray(op.H * s)
    assert abs(lhs[cols[5], 0] - np.conj(1.0) * s[5, 0]) < 1e-5


def test_element_adjoint_segment_vs_scatter(rng):
    """Column-sorted segment adjoint == scatter adjoint == scipy."""
    A = randM(120, 700, 0.01, rng=rng, dtype=np.complex64)
    e_seg = csr_to_element(A, adjoint_segments=True)
    e_sc = csr_to_element(A, adjoint_segments=False)
    assert e_seg.adj_segs is not None and e_sc.adj_segs is None
    s = rand64c(120, 3, rng=rng)
    y_seg = np.asarray(element_spmm(e_seg, s, adjoint=True))
    y_sc = np.asarray(element_spmm(e_sc, s, adjoint=True))
    ref = A.conj().T @ s
    assert rel_err(y_seg, ref) < 1e-5
    assert rel_err(y_sc, ref) < 1e-5
