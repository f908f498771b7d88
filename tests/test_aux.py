"""Aux subsystems: profiling/roofline, dcf, preconditioned CG, checkpoint,
analyses (SURVEY.md §5)."""
import os

import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu import noncart, oracle
from indigo_tpu.analyses import memusage_report, apply_cost
from indigo_tpu.checkpoint import save_state, load_state
from indigo_tpu.profiling import time_apply, roofline_report
from indigo_tpu.utils import rand64c, randM, rel_err, Timer


def test_timer():
    with Timer("t") as t:
        sum(range(1000))
    assert t.elapsed > 0


def test_memusage_report(rng):
    op = it.KronI(2, it.SpMatrix(randM(30, 40, 0.2, rng=rng))
                  * it.UnscaledFFT((40,)))
    rep = memusage_report(op)
    assert "TOTAL" in rep and "SpMatrix" in rep


def test_apply_cost_positive(rng):
    op = it.SpMatrix(randM(30, 40, 0.2, rng=rng)) * it.UnscaledFFT((40,))
    flops, bytes_ = apply_cost(op, ncols=2)
    assert flops > 0 and bytes_ > 0


def test_apply_cost_new_leaf_fails_loudly():
    """A leaf without cost() must raise, not silently report zero: the
    roofline denominators in bench.py depend on every node contributing
    (round-3 advisory: string dispatch let renamed leaves report 0)."""
    from indigo_tpu.operators import Operator

    class Mystery(Operator):
        @property
        def shape(self):
            return (4, 4)

        def apply(self, x, adjoint=False):
            return x

    with pytest.raises(NotImplementedError, match="cost"):
        apply_cost(Mystery(), ncols=1)
    # ...including when buried inside combinators
    with pytest.raises(NotImplementedError, match="cost"):
        apply_cost(it.KronI(2, Mystery()), ncols=1)


def test_apply_cost_covers_every_registered_leaf(rng):
    """Every leaf the models compose must carry a real cost (bytes > 0
    unless structurally free like Eye)."""
    from indigo_tpu.toeplitz import ToeplitzNormal
    from indigo_tpu.wavelet import DWT
    from indigo_tpu.ops.tile_interp import plan_tile_interp
    from indigo_tpu.operators import KBInterp

    traj = rng.random((32, 2)) - 0.5
    plan = plan_tile_interp(traj, (16, 16), width=4)
    leaves = [
        it.SpMatrix(randM(30, 40, 0.2, rng=rng)),
        it.Diag(rand64c(16, rng=rng)),
        it.DenseMatrix(rand64c(8, 8, rng=rng)),
        it.UnscaledFFT((16,)),
        it.CenteredDFT((8,), (12,)),
        it.One((8, 4)),
        it.Perm(np.arange(8)[::-1].copy()),
        it.CropPad((8,), (12,)),
        KBInterp(plan),
        ToeplitzNormal(np.ones((8, 8), np.float32), (4, 4), method="fft"),
        DWT((16,), wavelet="haar", levels=1),
    ]
    for leaf in leaves:
        flops, bytes_ = leaf.cost(2)
        assert bytes_ > 0, leaf
    assert it.Eye(8).cost(1) == (0, 0)


def test_roofline_report(rng):
    op = it.Diag(rand64c(256, rng=rng))
    result, text = roofline_report(op, ncols=1, measure=True)
    assert result["sol_sec"] > 0 and result["measured_sec"] > 0
    assert "roofline fraction" in text


def test_time_apply_square(rng):
    op = it.UnscaledFFT((64,))
    t = time_apply(op, ncols=1, k1=1, k2=3)
    assert t > 0


def test_pipe_menon_dcf_radial():
    """Radial trajectory: DCF should grow ~linearly with |k| (ramp)."""
    ang = np.pi * np.arange(16) / 16
    r = (np.arange(32) - 16) / 32
    traj = np.stack([np.outer(np.cos(ang), r).ravel(),
                     np.outer(np.sin(ang), r).ravel()], axis=1)
    w = noncart.pipe_menon_dcf(traj, (48, 48), width=4, iters=25)
    w = w.reshape(16, 32)
    # weight at |k|=0.25 should exceed weight near DC across all spokes
    inner = w[:, 16]   # DC sample
    outer = w[:, 28]   # |k| = 0.375
    assert (outer > 2 * inner).all()


def test_pipe_menon_dcf_device_matches_host(rng):
    """The device (tile-gather) fixed point equals the frozen host CSR
    path to f32 rounding — including in 3D."""
    traj = (rng.random((250, 3)) - 0.5)
    w_host = noncart.pipe_menon_dcf(traj, (16, 16, 20), width=4, iters=12,
                                    impl="host")
    w_dev = noncart.pipe_menon_dcf(traj, (16, 16, 20), width=4, iters=12,
                                   impl="device")
    assert rel_err(w_dev, w_host) < 1e-4


def test_pcg_with_diag_precond(rng):
    """Jacobi-preconditioned CG: same solution, fewer iterations on an
    ill-conditioned diagonal-dominant system."""
    n = 64
    d = np.linspace(1, 1000, n).astype(np.float32)
    B = (rand64c(n, n, rng=rng) * 0.05).astype(np.complex64)
    A = np.diag(d).astype(np.complex64) + B + B.conj().T
    x_true = rand64c(n, rng=rng)
    b = (A @ x_true).astype(np.complex64)
    Aop = it.DenseMatrix(A)
    x_plain, info_plain = it.cg(Aop, b, tol=1e-8, maxiter=500)
    Minv = it.Diag((1.0 / d).astype(np.complex64))
    x_pcg, info_pcg = it.cg(Aop, b, tol=1e-8, maxiter=500, precond=Minv)
    assert rel_err(np.asarray(x_pcg), x_true) < 1e-3
    assert int(info_pcg["iters"]) < int(info_plain["iters"])


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {"x": rand64c(16, rng=rng), "k": np.int32(7),
             "resid": np.float32(1e-3)}
    p = save_state(os.path.join(tmp_path, "ckpt.npz"), state)
    out = load_state(p, like=state)
    assert rel_err(out["x"], state["x"]) < 1e-7
    assert int(out["k"]) == 7


def test_checkpoint_resume_cg(tmp_path, rng):
    """CG resumed from a checkpointed x equals uninterrupted CG."""
    A, x_true, b = _spd(24, rng)
    Aop = it.DenseMatrix(A)
    x_full, _ = it.cg(Aop, b, tol=1e-10, maxiter=60)
    x_half, _ = it.cg(Aop, b, tol=1e-10, maxiter=30)
    p = save_state(os.path.join(tmp_path, "cg.npz"), {"x": np.asarray(x_half)})
    x_rest = load_state(p, like={"x": np.asarray(x_half)})["x"]
    x_resumed, _ = it.cg(Aop, b, x0=x_rest.astype(np.complex64),
                         tol=1e-10, maxiter=60)
    assert rel_err(np.asarray(x_resumed), np.asarray(x_full)) < 1e-4


def _spd(n, rng):
    B = rand64c(n, n, rng=rng)
    A = (B.conj().T @ B + 0.5 * np.eye(n)).astype(np.complex64)
    x = rand64c(n, rng=rng)
    return A, x, (A @ x).astype(np.complex64)


def test_checkpoint_restores_without_template(tmp_path, rng):
    """load_state(path) alone rebuilds the full pytree (treedef stored)."""
    import os
    from indigo_tpu.utils import rand64c

    state = {"x": rand64c(9, rng=rng), "k": np.int32(3),
             "nested": [np.float32(1.5), rand64c(2, 3, rng=rng)]}
    p = save_state(os.path.join(tmp_path, "c.npz"), state)
    out = load_state(p)
    assert set(out) == {"x", "k", "nested"}
    assert np.allclose(out["x"], state["x"])
    assert int(out["k"]) == 3
    assert np.allclose(out["nested"][1], state["nested"][1])


def test_toeplitz_kernel_info_and_lamda_floor(rng):
    """Kernel diagnostics expose the spectrum min; SenseRecon's lamda floor
    (> -min, valid by Parseval) makes the CG system PSD without touching
    the operator, even for deliberately coarse kernels."""
    from indigo_tpu.toeplitz import toeplitz_kernel
    from indigo_tpu.models.recon import SenseRecon

    traj = (rng.random((60, 2)) - 0.5)
    Tf, info = toeplitz_kernel(traj, (16, 16), oversamp=1.25, width=3,
                               return_info=True, warn=False)
    assert info["min"] == float(Tf.min())
    assert not info["clipped"]
    # psd_clip opt-in clips and records it
    Tfc, infoc = toeplitz_kernel(traj, (16, 16), oversamp=1.25, width=3,
                                 psd_clip=True, return_info=True)
    assert Tfc.min() >= 0.0 and infoc["clipped"] == (info["min"] < 0)

    maps = np.ones((1, 16, 16), np.complex64)
    r = SenseRecon(traj, maps, oversamp=1.25, width=3, iters=8, dcf=None)
    # coarse kernel (width 3): gridding-error lamda floor engages
    assert r.lamda >= 1e-2 * r.kernel_info["max"]
    y = r.simulate(np.ones((16, 16), np.complex64))
    x, resids = r(y, return_resids=True)
    assert np.isfinite(x).all()
    # PSD system => CG residual decreases
    assert resids[-1] < resids[0]
