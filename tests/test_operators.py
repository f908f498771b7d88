"""Per-operator forward/adjoint correctness vs dense numpy ground truth.

Mirrors the reference's test strategy (SURVEY.md §4): every operator is
compared against an explicitly constructed dense matrix, and the adjoint
identity <Ax, y> == <x, A^H y> is property-tested on random vectors.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import indigo_tpu as it
from indigo_tpu import cplx
from indigo_tpu.utils import rand64c, randM, rel_err


def dense_of(op):
    """Materialize operator as dense numpy matrix via identity columns."""
    return np.asarray(op.to_dense())


def check_against(op, M_dense, rng, tol=2e-5):
    M, N = op.shape
    assert M_dense.shape == (M, N)
    x = rand64c(N, 3, rng=rng)
    y = rand64c(M, 3, rng=rng)
    # forward
    assert rel_err(np.asarray(op * x), M_dense @ x) < tol
    # adjoint
    assert rel_err(np.asarray(op.H * y), M_dense.conj().T @ y) < tol
    # adjoint identity
    lhs = np.vdot(M_dense @ x, y)
    Ah = np.asarray(op.H * y)
    rhs = np.vdot(x, Ah)
    assert abs(lhs - rhs) / max(abs(lhs), 1e-12) < tol
    # 1-D vector path
    assert rel_err(np.asarray(op * x[:, 0]), M_dense @ x[:, 0]) < tol


def test_spmatrix(rng):
    A = randM(60, 90, 0.1, rng=rng)
    op = it.SpMatrix(A)
    check_against(op, A.toarray(), rng)


def test_densematrix(rng):
    A = rand64c(40, 30, rng=rng)
    check_against(it.DenseMatrix(A), A, rng)


def test_diag(rng):
    d = rand64c(50, rng=rng)
    check_against(it.Diag(d), np.diag(d), rng)


def test_eye(rng):
    check_against(it.Eye(33), np.eye(33, dtype=np.complex64), rng)


def test_one(rng):
    M, N = 13, 21
    check_against(it.One((M, N)), np.ones((M, N), dtype=np.complex64), rng)


def test_perm(rng):
    n = 64
    perm = rng.permutation(n)
    dense = np.eye(n, dtype=np.complex64)[perm]
    check_against(it.Perm(perm), dense, rng)
    # P^H P = I (orthogonal)
    op = it.Perm(perm)
    x = rand64c(n, 2, rng=rng)
    assert rel_err(np.asarray(op.H * (op * x)), x) < 1e-6


def test_mask(rng):
    n = 60
    mask = rng.random(n) < 0.4
    keep = np.flatnonzero(mask)
    dense = np.eye(n, dtype=np.complex64)[keep]
    check_against(it.Mask(keep, n), dense, rng)
    # from_bool builder + P P^H = I on the kept rows
    op = it.Mask.from_bool(mask.reshape(6, 10))
    assert op.shape == (len(keep), n)
    y = rand64c(len(keep), 2, rng=rng)
    assert rel_err(np.asarray(op * (op.H * y)), y) < 1e-6
    # matches the sparse-matrix encoding exactly
    import scipy.sparse as sp
    P = sp.csr_matrix((np.ones(len(keep), np.float32),
                       (np.arange(len(keep)), keep)), shape=(len(keep), n))
    x = rand64c(n, 2, rng=rng)
    assert rel_err(np.asarray(op * x), P @ x) < 1e-7


@pytest.mark.parametrize("vol", [(16,), (8, 12), (4, 6, 8)])
def test_unscaled_fft(vol, rng):
    op = it.UnscaledFFT(vol)
    n = int(np.prod(vol))
    I = np.eye(n, dtype=np.complex64)
    F = np.fft.fftn(I.reshape(vol + (n,)), axes=range(len(vol))).reshape(n, n)
    check_against(op, F, rng)
    # A^H A = n * I for the unnormalized pair
    x = rand64c(n, 2, rng=rng)
    y = np.asarray(op.H * (op * x))
    assert rel_err(y, n * x) < 1e-5


@pytest.mark.parametrize("img,grid", [
    ((12,), (16,)),
    ((10, 12), (16, 16)),
    ((6, 8, 10), (8, 10, 12)),   # non-cube, mixed oversampling
    ((8, 8), (8, 8)),            # img == grid: pure centered DFT
])
def test_centered_dft_equals_chain(img, grid, rng):
    """CenteredDFT == centered_fft_op(grid) * CropPad(img, grid) exactly
    (the fused leaf folds pad + fftshift checkerboards into the per-axis
    DFT matrices)."""
    from indigo_tpu.models.sense import centered_fft_op

    fused = it.CenteredDFT(img, grid)
    chain = centered_fft_op(grid) * it.CropPad(img, grid)
    dense = dense_of(chain)
    check_against(fused, dense, rng)


def test_nufft_op_fft_mm_matches_xla(rng):
    """nufft_op(fft='mm') == nufft_op(fft='xla') end to end, both
    directions, and 'auto' picks the fused leaf for small even grids."""
    from indigo_tpu.models import nufft_op

    traj = (rng.random((80, 2)) - 0.5).astype(np.float64)
    img_shape = (12, 10)
    A_m, _ = nufft_op(traj, img_shape, oversamp=2.0, width=4, fft="mm")
    A_x, _ = nufft_op(traj, img_shape, oversamp=2.0, width=4, fft="xla")
    A_a, _ = nufft_op(traj, img_shape, oversamp=2.0, width=4)
    names = []
    stack = [A_a]
    while stack:
        op = stack.pop()
        names.append(type(op).__name__)
        stack.extend(op.children())
    assert "CenteredDFT" in names  # auto -> mm at this scale
    x = rand64c(int(np.prod(img_shape)), 2, rng=rng)
    assert rel_err(np.asarray(A_m * x), np.asarray(A_x * x)) < 2e-5
    y = rand64c(A_m.shape[0], 2, rng=rng)
    assert rel_err(np.asarray(A_m.H * y), np.asarray(A_x.H * y)) < 2e-5


def test_product(rng):
    A = rand64c(20, 30, rng=rng)
    B = randM(30, 25, 0.2, rng=rng)
    op = it.DenseMatrix(A) * it.SpMatrix(B)
    check_against(op, A @ B.toarray(), rng)


def test_adjoint_unwrap(rng):
    A = it.DenseMatrix(rand64c(10, 12, rng=rng))
    assert A.H.H is A
    check_against(A.H, cplx.to_numpy(A._A).conj().T, rng)


def test_kroni(rng):
    A = rand64c(6, 9, rng=rng)
    op = it.KronI(3, it.DenseMatrix(A))
    check_against(op, np.kron(np.eye(3), A), rng)


def test_blockdiag(rng):
    A = rand64c(5, 7, rng=rng)
    B = rand64c(4, 3, rng=rng)
    op = it.BlockDiag([it.DenseMatrix(A), it.DenseMatrix(B)])
    D = np.zeros((9, 10), dtype=np.complex64)
    D[:5, :7] = A
    D[5:, 7:] = B
    check_against(op, D, rng)


def test_vstack_hstack(rng):
    A = rand64c(5, 7, rng=rng)
    B = rand64c(4, 7, rng=rng)
    op = it.VStack([it.DenseMatrix(A), it.DenseMatrix(B)])
    check_against(op, np.vstack([A, B]), rng)
    C = rand64c(5, 6, rng=rng)
    oph = it.HStack([it.DenseMatrix(A), it.DenseMatrix(C)])
    check_against(oph, np.hstack([A, C]), rng)


def test_scale(rng):
    A = rand64c(8, 8, rng=rng)
    op = 2.5 * it.DenseMatrix(A)
    check_against(op, 2.5 * A, rng)
    op2 = (1 + 2j) * it.DenseMatrix(A)
    check_against(op2, (1 + 2j) * A, rng)


def test_composition_expression(rng):
    """A realistic composed tree evaluates like its dense realization."""
    n = 12
    F = it.UnscaledFFT((n,))
    d = rand64c(n, rng=rng)
    S = it.Diag(d)
    P = it.SpMatrix(randM(7, n, 0.3, rng=rng))
    A = P * F * S
    I = np.eye(n, dtype=np.complex64)
    Fd = np.fft.fft(I, axis=0)
    dense = np.asarray((P * (F * S)).to_dense())
    ref = np.asarray((P.to_dense())) @ Fd @ np.diag(d)
    assert rel_err(dense, ref) < 2e-5
    check_against(A, ref, rng)


def test_eval_alpha_beta(rng):
    A = it.DenseMatrix(rand64c(6, 6, rng=rng))
    x = rand64c(6, 2, rng=rng)
    y = rand64c(6, 2, rng=rng)
    out = np.asarray(A.eval(x, alpha=2.0, beta=3.0, y=jnp.asarray(y)))
    ref = 2.0 * (cplx.to_numpy(A._A) @ x) + 3.0 * y
    assert rel_err(out, ref) < 1e-5


def test_jit_and_grad_through_operator(rng):
    """Operators are pytrees: jit over (op, x) works with no re-trace magic."""
    A = it.SpMatrix(randM(30, 40, 0.2, rng=rng))
    F = it.UnscaledFFT((40,))
    op = A * F

    @jax.jit
    def f(op, x):
        return op.apply(x)

    x = jnp.asarray(rand64c(40, 2, rng=rng))
    y1 = f(op, x)
    y2 = op.apply(x)
    assert rel_err(np.asarray(y1), np.asarray(y2)) < 1e-6

    # vjp flows through the algebra (operators are differentiable programs)
    g = jax.grad(lambda x: jnp.sum(jnp.abs(op.apply(x)) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_dump_and_memusage(rng):
    A = it.SpMatrix(randM(30, 40, 0.2, rng=rng))
    op = it.KronI(2, A * it.UnscaledFFT((40,)))
    s = op.dump()
    assert "KronI" in s and "SpMatrix" in s and "UnscaledFFT" in s
    assert op.memusage() > 0


@pytest.mark.parametrize("img,oversamp", [
    ((16, 16), 2.0),            # 2D grid (32,32): tile (8,16) divides
    ((8, 8, 8), 2.0),           # 3D grid (16,16,16): tile (4,4,8) divides
])
def test_nufft_op_fused_griddft(img, oversamp, rng):
    """On periodic no-halo tilings nufft_op emits ONE fused GridDFT leaf
    that matches the unfused fft='xla' chain in both directions and
    satisfies the adjoint identity."""
    from indigo_tpu.models import nufft_op

    d = len(img)
    traj = (rng.random((120, d)) - 0.5).astype(np.float64)
    A_f, _ = nufft_op(traj, img, oversamp=oversamp, width=4, fft="mm",
                      interp="tile")
    A_x, _ = nufft_op(traj, img, oversamp=oversamp, width=4, fft="xla",
                      interp="tile")
    names = []
    stack = [A_f]
    while stack:
        op = stack.pop()
        names.append(type(op).__name__)
        stack.extend(op.children())
    assert "GridDFT" in names
    assert "CenteredDFT" not in names and "KBInterp" not in names

    n = int(np.prod(img))
    x = rand64c(n, 3, rng=rng)
    assert rel_err(np.asarray(A_f * x), np.asarray(A_x * x)) < 2e-5
    y = rand64c(A_f.shape[0], 3, rng=rng)
    adj_f = np.asarray(A_f.H * y)
    assert rel_err(adj_f, np.asarray(A_x.H * y)) < 2e-5
    # adjoint identity <Ax, y> == <x, A^H y>
    lhs = np.vdot(np.asarray(A_f * x), y)
    rhs = np.vdot(x, adj_f)
    assert abs(lhs - rhs) / abs(lhs) < 1e-5
    # cost model: fused leaf cheaper in bytes than the two-leaf chain
    ff, bf = A_f.cost(3)
    fx, bx = (nufft_op(traj, img, oversamp=oversamp, width=4, fft="mm",
                       interp="tile")[0]).cost(3)
    assert ff > 0 and bf > 0
