"""Solver tests: CG vs direct solve, FISTA on a toy lasso (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp

import indigo_tpu as it
from indigo_tpu.solvers import cg, apgd, max_eigen, soft_thresh
from indigo_tpu.utils import rand64c, rel_err


def spd_system(n, rng):
    B = rand64c(n, n, rng=rng)
    A = B.conj().T @ B + 0.5 * np.eye(n, dtype=np.complex64)
    x_true = rand64c(n, rng=rng)
    return A.astype(np.complex64), x_true, (A @ x_true).astype(np.complex64)


def test_cg_dense(rng):
    A, x_true, b = spd_system(24, rng)
    x, info = cg(it.DenseMatrix(A), jnp.asarray(b), tol=1e-7, maxiter=200)
    assert rel_err(np.asarray(x), x_true) < 1e-4
    assert int(info["iters"]) <= 200


def test_cg_matvec_callable(rng):
    A, x_true, b = spd_system(16, rng)
    Aj = jnp.asarray(A)
    x, _ = cg(lambda v: Aj @ v, jnp.asarray(b), tol=1e-7, maxiter=200)
    assert rel_err(np.asarray(x), x_true) < 1e-4


def test_cg_tikhonov(rng):
    A, _, b = spd_system(16, rng)
    lam = 0.7
    x, _ = cg(it.DenseMatrix(A), jnp.asarray(b), lamda=lam, tol=1e-8, maxiter=300)
    ref = np.linalg.solve(A + lam * np.eye(16), b)
    assert rel_err(np.asarray(x), ref) < 1e-4


def test_cg_history_matches_whileloop(rng):
    A, _, b = spd_system(12, rng)
    x1, i1 = cg(it.DenseMatrix(A), jnp.asarray(b), tol=1e-7, maxiter=100)
    x2, i2 = cg(it.DenseMatrix(A), jnp.asarray(b), tol=1e-7, maxiter=100,
                history=True)
    assert rel_err(np.asarray(x2), np.asarray(x1)) < 1e-5
    assert i2["resids"].shape == (100,)


def test_cg_jit(rng):
    A, x_true, b = spd_system(16, rng)
    f = jax.jit(lambda op, b: cg(op, b, tol=1e-7, maxiter=150)[0])
    x = f(it.DenseMatrix(A), jnp.asarray(b))
    assert rel_err(np.asarray(x), x_true) < 1e-4


def test_max_eigen(rng):
    A, _, _ = spd_system(20, rng)
    lam = float(max_eigen(it.DenseMatrix(A), 20, iters=200))
    lam_ref = float(np.linalg.eigvalsh(A).max())
    assert abs(lam - lam_ref) / lam_ref < 1e-2


def test_soft_thresh():
    x = jnp.asarray([3.0 + 4.0j, 0.1, -2.0], dtype=jnp.complex64)
    y = np.asarray(soft_thresh(x, 1.0))
    assert abs(y[0] - (3 + 4j) * (4 / 5)) < 1e-6
    assert y[1] == 0
    assert abs(y[2] - (-1.0)) < 1e-6


def test_fista_lasso(rng):
    """min 0.5||Ax-b||^2 + lam||x||_1 — check vs subgradient optimality."""
    m, n, lam = 40, 20, 0.001
    A = rand64c(m, n, rng=rng) / np.sqrt(m)
    x_true = np.zeros(n, dtype=np.complex64)
    x_true[:4] = rand64c(4, rng=rng)
    b = A @ x_true
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)

    def gradf(x):
        return Aj.conj().T @ (Aj @ x - bj)

    L = float(np.linalg.norm(A, 2)) ** 2
    proxg = lambda v, step: soft_thresh(v, lam * step)
    x, _ = apgd(gradf, proxg, 1.0 / L, jnp.zeros(n, jnp.complex64),
                maxiter=800)
    x = np.asarray(x)
    # optimality: |A^H(Ax-b)| <= lam... with lam->0 here FISTA solves LS;
    # check residual small on support and objective below initial.
    obj = 0.5 * np.linalg.norm(A @ x - b) ** 2
    assert obj < 1e-3


def test_apgd_no_tol_history(rng):
    """tol=0 (default hot path, no freeze machinery traced) still supports
    the history/objective outputs."""
    n = 16
    d = jnp.asarray(1.0 + np.arange(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    gradf = lambda x: d * x - b
    proxg = lambda v, a: v
    x, info = apgd(gradf, proxg, 1.0 / float(d.max()),
                   jnp.zeros(n, jnp.float32), maxiter=200, history=True,
                   objective=lambda x: 0.5 * jnp.vdot(
                       x, d * x).real - jnp.vdot(b, x).real)
    assert int(info["iters"]) == 200
    assert np.allclose(np.asarray(x), np.asarray(b / d), atol=1e-4)
    assert len(np.asarray(info["deltas"])) == 200
    objs = np.asarray(info["objs"])
    assert objs[-1] <= objs[0]


def test_apgd_tol_stops_early(rng):
    """Smooth strongly-convex quadratic: apgd with tol freezes early and
    reports iterations actually taken."""
    n = 24
    d = jnp.asarray(1.0 + np.arange(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    gradf = lambda x: d * x - b
    proxg = lambda v, a: v
    x, info = apgd(gradf, proxg, 1.0 / float(d.max()),
                   jnp.zeros(n, jnp.float32), maxiter=500, tol=1e-8,
                   history=True, objective=lambda x: 0.5 * jnp.vdot(
                       x, d * x).real - jnp.vdot(b, x).real)
    assert int(info["iters"]) < 500
    assert np.allclose(np.asarray(x), np.asarray(b / d), atol=1e-4)
    objs = np.asarray(info["objs"])
    k = int(info["iters"])
    # objective history monotone-ish down to convergence, frozen after
    assert abs(objs[min(k, len(objs) - 1)] - objs[-1]) < 1e-6
    deltas = np.asarray(info["deltas"])
    assert (deltas[k:] == 0).all()


def test_pcg_fewer_iters_and_cached(rng, monkeypatch):
    """Jacobi PCG reaches tol in fewer iterations than plain CG, and
    repeated solves with the same preconditioner callable reuse one
    compiled executable (no per-call retrace). Forces the complex-
    incapable (cjit) backend path — the one serving uses on TPU."""
    import indigo_tpu.cplx as cplx
    monkeypatch.setattr(cplx, "supports_complex_buffers", lambda: False)
    n = 64
    d = np.geomspace(1.0, 3e3, n).astype(np.float32)
    M = 0.05 * rand64c(n, n, rng=rng)
    A = (np.diag(d) + (M + M.conj().T)).astype(np.complex64)
    b = rand64c(n, rng=rng)
    traces = [0]

    def jacobi(r):
        traces[0] += 1          # incremented per TRACE, not per solve
        return r * jnp.asarray(1.0 / d)

    Aop = it.DenseMatrix(A)
    x0, i0 = cg(Aop, b, tol=1e-9, maxiter=400)
    x1, i1 = cg(Aop, b, tol=1e-9, maxiter=400, precond=jacobi)
    assert int(i1["iters"]) < int(i0["iters"])
    assert rel_err(np.asarray(x1), np.asarray(x0)) < 1e-5
    after_first = traces[0]          # invocations during the one trace
    assert after_first > 0
    x2, i2 = cg(Aop, 2 * b, tol=1e-9, maxiter=400, precond=jacobi)
    assert rel_err(np.asarray(x2), 2 * np.asarray(x1)) < 1e-5
    assert traces[0] == after_first, \
        "preconditioned solve re-traced on second call"


def test_pcg_operator_precond(rng):
    """A Diag operator works as the preconditioner and rides the shared
    per-config executable (pytree jit argument)."""
    from indigo_tpu.operators import Diag

    n = 48
    d = np.geomspace(1.0, 1e3, n).astype(np.float32)
    A = np.diag(d).astype(np.complex64)
    b = rand64c(n, rng=rng)
    Mi = Diag((1.0 / d).astype(np.complex64))
    x, info = cg(it.DenseMatrix(A), b, tol=1e-10, maxiter=100, precond=Mi)
    assert int(info["iters"]) <= 3   # exact preconditioner: ~1 step
    assert rel_err(np.asarray(x), b / d) < 1e-5


def test_apgd_cached_no_retrace(rng, monkeypatch):
    """Repeated eager apgd solves with the same (gradf, proxg) reuse one
    compiled executable on the complex-incapable path, and a changed
    step size alpha does NOT recompile (it rides in as a traced arg).

    This is the round-4 FISTA bench-lane bug: a fresh cjit wrapper per
    call paid a retrace + remote-compile RPC every solve (~3 s of pure
    overhead with seconds of jitter on the sandbox tunnel), which made
    per-iteration differencing meaningless (the 526-vs-5053 iters/s
    artifact — see DESIGN.md)."""
    import indigo_tpu.cplx as cplx
    monkeypatch.setattr(cplx, "supports_complex_buffers", lambda: False)
    n = 64
    d = np.geomspace(1.0, 50.0, n).astype(np.float32)
    b = rand64c(n, rng=rng)
    traces = [0]

    def gradf(x):
        traces[0] += 1           # incremented per TRACE, not per solve
        return jnp.asarray(d) * x - jnp.asarray(b)

    proxg = lambda v, a: v
    x1, _ = apgd(gradf, proxg, 1.0 / float(d.max()),
                 np.zeros(n, np.complex64), maxiter=200)
    after_first = traces[0]
    assert after_first > 0
    x2, _ = apgd(gradf, proxg, 1.0 / float(d.max()),
                 np.zeros(n, np.complex64), maxiter=200)
    assert traces[0] == after_first, "apgd re-traced on second call"
    # changed alpha: still no retrace (traced argument, not a constant)
    x3, _ = apgd(gradf, proxg, 0.5 / float(d.max()),
                 np.zeros(n, np.complex64), maxiter=200)
    assert traces[0] == after_first, "apgd re-traced on alpha change"
    assert rel_err(np.asarray(x1), b / d) < 5e-3
    assert rel_err(np.asarray(x2), np.asarray(x1)) < 1e-6


def test_max_eigen_cached_no_retrace(rng, monkeypatch):
    """Eager max_eigen on an Operator rides a per-(n, iters, dtype)
    executable with the operator as a jit argument — repeated calls
    (e.g. FISTA step-size picks across problems) don't retrace."""
    import indigo_tpu.cplx as cplx
    from indigo_tpu.solvers import max_eigen, _max_eigen_cjit
    monkeypatch.setattr(cplx, "supports_complex_buffers", lambda: False)
    _max_eigen_cjit.cache_clear()
    n = 32
    d = np.geomspace(1.0, 10.0, n).astype(np.float32)
    A1 = it.DenseMatrix(np.diag(d).astype(np.complex64))
    A2 = it.DenseMatrix(np.diag(2 * d).astype(np.complex64))
    l1 = max_eigen(A1, n, iters=50)
    l2 = max_eigen(A2, n, iters=50)   # same shape: shared executable
    assert abs(complex(l1).real - 10.0) < 0.2
    assert abs(complex(l2).real - 20.0) < 0.4
    info = _max_eigen_cjit.cache_info()
    assert info.misses == 1 and info.hits >= 1
