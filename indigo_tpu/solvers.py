"""Iterative solvers — fully on-device via lax.while_loop / lax.scan.

Reference parity: the reference implements Conjugate Gradient and accelerated
proximal gradient (FISTA) as ``Backend.cg`` / ``Backend.apgd`` on its device
primitive set (indigo/backends/backend.py — unverified, mount empty; see
SURVEY.md §2/§3.3). The reference returns control to Python between
primitives every iteration (host round-trips for each dot product); here the
entire solve is one compiled XLA loop — zero host syncs until the result is
fetched (SURVEY.md §3.3, north star).

All solvers accept either an :class:`~indigo_tpu.operators.Operator` or a
plain matvec callable, operate on arrays of any shape (treated as one long
vector for inner products), and are jit-compatible: operators/arrays are
traced pytree inputs, maxiter/tol are static.
"""
from __future__ import annotations

import functools
import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import cplx
from .operators import Operator

__all__ = ["cg", "apgd", "fista", "max_eigen", "soft_thresh"]


def _as_matvec(A):
    if isinstance(A, Operator):
        def mv(v):
            if v.ndim == 1:
                return A.apply(v[:, None])[:, 0]
            if v.ndim == 2:
                return A.apply(v)
            return A.apply(v.reshape(A.shape[1], -1)).reshape(v.shape)
        return mv
    return A


def _vdot(a, b):
    """Real inner product Re<a, b> over all elements (Hermitian systems)."""
    return jnp.real(jnp.vdot(a.ravel(), b.ravel()))


def cg(A, b, x0=None, lamda=0.0, tol=1e-6, maxiter=100, history=False,
       precond=None):
    """Conjugate Gradient for Hermitian positive-definite ``A`` (+ lamda*I).

    Solves (A + lamda*I) x = b. Reference parity: ``Backend.cg`` with optional
    Tikhonov lamda and per-iteration residual logging (SURVEY.md §3.3).

    Returns ``(x, info)`` where info has ``iters`` and ``resid`` (final
    relative residual). With ``history=True`` the solver runs a fixed-length
    ``lax.scan`` and info additionally carries ``resids`` of shape (maxiter,)
    (entries after convergence are frozen) — the on-device equivalent of the
    reference's per-iteration residual log.

    Fully jit-compatible; when called eagerly on a backend without complex
    buffer support (TPU) the whole solve is auto-wrapped in a complex-safe
    jit (see cplx.cjit) and ``x`` comes back as host numpy.
    """
    leaves = jax.tree_util.tree_leaves((A, b, x0))
    traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
    if traced or cplx.supports_complex_buffers():
        return _cg_core(A, b, x0, lamda=lamda, tol=tol, maxiter=maxiter,
                        history=history, precond=precond)
    # Eager on a complex-incapable backend: compile once per (solver
    # config), cached so repeated solves hit the same executable.
    cfg = (float(lamda), float(tol), int(maxiter), bool(history))
    if precond is None:
        return _cg_cjit(*cfg)(A, b, x0)
    if isinstance(precond, Operator):
        # operators are pytrees: ride in as a jit ARGUMENT (shared
        # executable per config, payload arrays not re-embedded)
        return _cg_cjit(*cfg, with_precond=True)(A, b, x0, precond)
    # plain callables can't be jit args; key the executable cache on the
    # callable's identity (weakref so we don't pin user closures forever)
    fn = _pcg_callable_cjit(precond, cfg)
    if fn is None:  # not weakref-able; one-shot complex-safe jit
        return cplx.eager_call(
            partial(_cg_core, lamda=lamda, tol=tol, maxiter=maxiter,
                    history=history, precond=precond), A, b, x0)
    return fn(A, b, x0)


@functools.lru_cache(maxsize=64)
def _cg_cjit(lamda, tol, maxiter, history, with_precond=False):
    if with_precond:
        return cplx.cjit(
            lambda A, b, x0, precond: _cg_core(
                A, b, x0, lamda=lamda, tol=tol, maxiter=maxiter,
                history=history, precond=precond))
    return cplx.cjit(partial(_cg_core, lamda=lamda, tol=tol,
                             maxiter=maxiter, history=history))


_pcg_cache = weakref.WeakKeyDictionary()


def _pcg_callable_cjit(precond, cfg):
    """Compiled-PCG cache keyed on the preconditioner callable: repeated
    solves with the same callable + solver config reuse one executable
    instead of re-tracing per call. Returns None when ``precond`` cannot
    be weak-referenced."""
    try:
        cfgs = _pcg_cache.setdefault(precond, {})
    except TypeError:
        return None
    if cfg not in cfgs:
        lamda, tol, maxiter, history = cfg
        cfgs[cfg] = cplx.cjit(partial(
            _cg_core, lamda=lamda, tol=tol, maxiter=maxiter,
            history=history, precond=precond))
    return cfgs[cfg]


def _cg_core(A, b, x0=None, *, lamda, tol, maxiter, history, precond=None):
    mv = _as_matvec(A)
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)

    def matvec(v):
        Av = mv(v)
        if not (isinstance(lamda, (int, float)) and lamda == 0):
            Av = Av + lamda * v
        return Av

    applyM = _as_matvec(precond) if precond is not None else (lambda r: r)

    bnorm = jnp.sqrt(_vdot(b, b))
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    r0 = b - matvec(x0)
    z0 = applyM(r0)
    rz0 = _vdot(r0, z0)
    rs0 = _vdot(r0, r0)

    # Preconditioned CG; with precond=None, z == r and this is textbook CG.
    def step(x, r, p, rz):
        Ap = matvec(p)
        alpha = rz / _vdot(p, Ap)
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * Ap
        z = applyM(r)
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta.astype(p.dtype) * p
        return x, r, p, rz_new, _vdot(r, r)

    if history:
        def body(carry, _):
            x, r, p, rz, rs, k, done = carry
            xn, rn, pn, rzn, rsn = step(x, r, p, rz)
            new_done = done | (jnp.sqrt(rsn) <= tol * bnorm)
            x, r, p, rz, rs = jax.tree.map(
                lambda new, old: jnp.where(done, old, new),
                (xn, rn, pn, rzn, rsn), (x, r, p, rz, rs))
            k = jnp.where(done, k, k + 1)
            return (x, r, p, rz, rs, k, new_done), jnp.sqrt(rs) / bnorm

        (x, r, p, rz, rs, k, _), resids = lax.scan(
            body,
            (x0, r0, z0, rz0, rs0, jnp.int32(0),
             jnp.sqrt(rs0) <= tol * bnorm),
            None, length=maxiter)
        info = {"iters": k, "resid": jnp.sqrt(rs) / bnorm, "resids": resids}
        return x, info

    def cond(state):
        _, _, _, _, rs, k = state
        return (k < maxiter) & (jnp.sqrt(rs) > tol * bnorm)

    def body(state):
        x, r, p, rz, rs, k = state
        x, r, p, rz, rs = step(x, r, p, rz)
        return (x, r, p, rz, rs, k + 1)

    x, r, p, rz, rs, k = lax.while_loop(
        cond, body, (x0, r0, z0, rz0, rs0, jnp.int32(0)))
    return x, {"iters": k, "resid": jnp.sqrt(rs) / bnorm}


def soft_thresh(x, lamda):
    """Complex soft-thresholding prox of lamda*||.||_1."""
    mag = jnp.abs(x)
    scale = jnp.maximum(mag - lamda, 0.0) / jnp.maximum(mag, 1e-30)
    return (scale * x).astype(x.dtype)


def apgd(gradf, proxg, alpha, x0, maxiter=100, history=False, tol=0.0,
         objective=None):
    """Accelerated proximal gradient descent (FISTA).

    Reference parity: ``Backend.apgd`` (SURVEY.md §2 "Solvers"). Minimizes
    f(x) + g(x) given ``gradf(x)`` and ``proxg(v, step)`` with step size
    ``alpha``, entirely inside one ``lax.scan``.

    ``tol``: optional stopping criterion on the relative step
    ||x_k - x_{k-1}|| / max(||x_k||, eps); once met, the iterate is frozen
    for the remaining scan steps (same on-device pattern as ``cg``'s
    history path) and ``info['iters']`` reports the iterations actually
    taken. ``objective``: optional callable f(x) -> scalar evaluated each
    iteration into ``info['objs']`` when ``history=True`` — the on-device
    equivalent of the reference's per-iteration objective log.

    Returns ``(x, info)``; with ``history=True`` info carries per-iteration
    step norms ``deltas`` (frozen after convergence) and, if ``objective``
    is given, ``objs``.
    """
    leaves = jax.tree_util.tree_leaves((alpha, x0))
    traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
    if traced or cplx.supports_complex_buffers():
        return _apgd_core(gradf, proxg, alpha, x0, maxiter, history,
                          tol, objective)
    # Eager on a complex-incapable backend: cache the complex-safe jit
    # wrapper on (gradf, proxg, static config) so repeated solves hit one
    # executable. A fresh wrapper per call (the old eager_call path) paid
    # a full retrace + a remote-compile-cache RPC EVERY call on this
    # sandbox — a ~3 s fixed cost with seconds of jitter that made the
    # FISTA bench lane's per-iteration differencing pure noise (the r4
    # 526-vs-5053 iters/s contradiction; see DESIGN.md). alpha rides in
    # as a traced argument so a changed step size does not recompile.
    fn = _apgd_callable_cjit(gradf, proxg,
                             (int(maxiter), bool(history), float(tol),
                              objective))
    if fn is None:  # gradf not weakref-able; one-shot complex-safe jit
        core = lambda x0: _apgd_core(gradf, proxg, alpha, x0, maxiter,
                                     history, tol, objective)
        return cplx.eager_call(core, x0)
    return fn(np.float32(alpha), x0)


_apgd_cache = weakref.WeakKeyDictionary()


def _apgd_callable_cjit(gradf, proxg, cfg):
    """Compiled-FISTA cache keyed on the gradient callable (weakly, so user
    closures aren't pinned) then on (proxg, maxiter, history, tol,
    objective). Returns None when ``gradf`` cannot be weak-referenced."""
    try:
        cfgs = _apgd_cache.setdefault(gradf, {})
    except TypeError:
        return None
    key = (proxg, cfg)
    if key not in cfgs:
        maxiter, history, tol, objective = cfg
        cfgs[key] = cplx.cjit(
            lambda alpha, x0: _apgd_core(gradf, proxg, alpha, x0, maxiter,
                                         history, tol, objective))
    return cfgs[key]


def _apgd_core(gradf, proxg, alpha, x0, maxiter, history, tol=0.0,
               objective=None):
    x0 = jnp.asarray(x0)

    track = tol > 0   # static: with tol == 0 no convergence machinery is
    # traced at all — no step norm, no freeze selects, no done carry use

    def body(carry, _):
        x, z, t, k, done = carry
        g = gradf(z)
        xn = proxg(z - alpha * g, alpha)
        tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        zn = xn + ((t - 1.0) / tn).astype(xn.dtype) * (xn - x)
        if track or history:
            delta = jnp.linalg.norm((xn - x).ravel())
        if track:
            rel = delta / jnp.maximum(jnp.linalg.norm(xn.ravel()), 1e-30)
            new_done = done | (rel <= tol)
            xn, zn, tn = jax.tree.map(
                lambda new, old: jnp.where(done, old, new),
                (xn, zn, tn), (x, z, t))
            k = jnp.where(done, k, k + 1)
        else:
            new_done = done
            k = k + 1
        out = ()
        if history:
            out += (jnp.where(done, 0.0, delta) if track else delta,)
        if objective is not None:
            out += (objective(xn),)
        return (xn, zn, tn, k, new_done), out

    (x, _, _, k, _), outs = lax.scan(
        body, (x0, x0, jnp.float32(1.0), jnp.int32(0), jnp.bool_(False)),
        None, length=maxiter)
    info = {"iters": k}
    i = 0
    if history:
        info["deltas"] = outs[i]
        i += 1
    if history and objective is not None:
        info["objs"] = outs[i]
    return x, info


fista = apgd


def max_eigen(A, n, iters=30, key=None, dtype=jnp.complex64):
    """Largest eigenvalue of Hermitian PSD ``A`` by power iteration.

    Used to pick the FISTA step size alpha = 1 / L. Runs as one lax.scan.
    """
    if (isinstance(A, Operator) and not cplx.supports_complex_buffers()
            and not any(isinstance(l, jax.core.Tracer)
                        for l in jax.tree_util.tree_leaves(A))):
        # operators are pytrees: ride in as a jit ARGUMENT so repeated
        # calls share one executable per (n, iters, dtype) instead of
        # paying a retrace + remote-compile-cache RPC per call
        return _max_eigen_cjit(int(n), int(iters),
                               jnp.dtype(dtype).name)(
            A, key if key is not None else jax.random.PRNGKey(0))
    core = lambda A: _max_eigen_core(A, n, iters, key, dtype)
    return cplx.eager_call(core, A)


@functools.lru_cache(maxsize=64)
def _max_eigen_cjit(n, iters, dtype_name):
    dtype = jnp.dtype(dtype_name)
    return cplx.cjit(
        lambda A, key: _max_eigen_core(A, n, iters, key, dtype))


def _max_eigen_core(A, n, iters, key, dtype):
    mv = _as_matvec(A)
    key = key if key is not None else jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (n,), dtype=jnp.float32).astype(dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(v, _):
        w = mv(v)
        lam = _vdot(v, w)
        return w / jnp.maximum(jnp.linalg.norm(w.ravel()), 1e-30), lam

    _, lams = lax.scan(body, v0, None, length=iters)
    return lams[-1]
