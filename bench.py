"""Headline benchmark: 3D multicoil NUFFT CG-SENSE (BASELINE.json metric).

Prints ONE JSON line per benched config; the LAST line is the headline
(128^3, 8 coils, ~260k radial samples — comparable across rounds):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is CG iterations/sec using the Toeplitz-embedded normal operator
— the production CG path (each iteration = one doubled-grid batched FFT
round-trip + coil combine; no host syncs). The default run also emits, in
order BEFORE the headline line:
  * the gridded/SpMM hot-path lanes (SURVEY.md §2 checklist rows 1-2):
    2D radial 8-coil gridded CG (jag Pallas SpMM in the loop) and the 3D
    tile-gather interpolation forward/adjoint apply rate;
  * the full BASELINE config-3 size (256^3, 1M samples, coil-chunked).

vs_baseline compares against the committed CPU reference measurements
(bench_cpu.json, generated with `python bench.py --cpu` and
`python bench.py --cpu --huge` for the 256^3 entry), mirroring the
reference's "numpy backend is the baseline" convention (SURVEY.md §6).
Detailed stage timings and a roofline estimate go to stderr.

Flags: --small (64^3 only), --huge (256^3 only), --cpu (write the CPU
baseline; combine with --huge for the 256^3 entry), --sharded (also run
256^3 volume-sharded over all devices).
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def kooshball_traj(nspokes, nread, seed=0):
    """3D kooshball-ish radial trajectory (M, 3)."""
    rng = np.random.default_rng(seed)
    u = rng.random(nspokes)
    v = rng.random(nspokes)
    th = np.arccos(2 * u - 1)
    ph = 2 * np.pi * v
    dirs = np.stack([np.sin(th) * np.cos(ph),
                     np.sin(th) * np.sin(ph),
                     np.cos(th)], axis=1)
    r = (np.arange(nread) - nread // 2) / nread
    return (dirs[:, None, :] * r[None, :, None]).reshape(-1, 3)


def build_problem(n=128, nc=8, nspokes=2048, nread=128, seed=0):
    rng = np.random.default_rng(seed)
    traj = kooshball_traj(nspokes, nread, seed=seed)

    img_shape = (n, n, n)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n
    maps = []
    for c in range(nc):
        a, b, cph = rng.random(3)
        amp = 0.4 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2
                              + (zz - cph) ** 2) * 3))
        maps.append(amp * np.exp(1j * 2 * np.pi * (a * xx + b * yy)))
    maps = np.asarray(maps, dtype=np.complex64)
    rhs = (rng.standard_normal((1, n ** 3), dtype=np.float32)
           + 1j * rng.standard_normal((1, n ** 3), dtype=np.float32)
           ).astype(np.complex64)
    return traj, img_shape, maps, rhs


def toeplitz_cached(traj, img_shape, n):
    from indigo_tpu.toeplitz import toeplitz_kernel

    t0 = time.time()
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f".bench_toeplitz_{n}_{16 * n}x{n}.npy")  # keyed on acquisition too
    if os.path.exists(cache):
        Tf = np.load(cache)
    else:
        Tf = toeplitz_kernel(traj, img_shape, oversamp=1.25, width=4)
        np.save(cache, Tf)
    log(f"toeplitz kernel ready in {time.time()-t0:.1f}s "
        f"(2x grid {Tf.shape})")
    return Tf


def enable_compile_cache():
    """Persistent XLA compilation cache: the 256^3 fused kernels take
    ~10 min to compile fresh; cached reruns skip it entirely."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # pragma: no cover
        log(f"compilation cache unavailable: {e}")


def run_config(n, cpu=False):
    """Measure one (n^3, 8-coil) config; returns the metrics dict."""
    import jax
    import jax.numpy as jnp
    from indigo_tpu import cplx
    from indigo_tpu.ops import use_pallas
    from indigo_tpu.ops.dft_fft import block_spectrum
    from indigo_tpu.ops.dft_pallas import (
        pallas_spectrum, pallas_supported, uses_sigma_basis,
        to_sigma_basis, solver_sigma_axes)
    from indigo_tpu.parallel.recon import sense_normal_batched, batched_cg

    cc_env = os.environ.get("BENCH_COIL_CHUNK")
    if cc_env is not None:
        coil_chunk = int(cc_env) or None
    else:
        coil_chunk = 4 if n >= 256 else None
    t0 = time.time()
    # acquisition scales with the grid: ~16n spokes x n readout points
    traj, img_shape, maps, rhs = build_problem(n=n, nspokes=16 * n, nread=n)
    log(f"problem built in {time.time()-t0:.1f}s "
        f"(n={n}, coils={maps.shape[0]}, samples={len(traj)})")
    Tf = toeplitz_cached(traj, img_shape, n)

    # Timing notes for this environment: host<->device transfers ride a
    # ~27MB/s tunnel and block_until_ready does not synchronize, so (a) all
    # payloads are uploaded ONCE outside the timed region, (b) runs are
    # timed by a forced scalar fetch, (c) per-iteration time is the
    # difference between two iteration counts (cancels fetch latency).

    # spectrum pre-permuted host-side into the layout of the selected path:
    # fused Pallas kernels on TPU (supported volumes), matmul-DFT otherwise
    if use_pallas() and pallas_supported(img_shape):
        layout = "pallas"
        Tf_d = jax.device_put(jnp.asarray(pallas_spectrum(Tf)))
    else:
        layout = "block"
        Tf_d = jax.device_put(jnp.asarray(block_spectrum(Tf)))
    log(f"toeplitz path: {layout}")
    maps_d = jax.device_put(cplx.pack(maps))
    rhs_d = jax.device_put(cplx.pack(rhs))

    # sigma CG basis: the radix-2 Pallas kernels' >128 image axes ride
    # even|odd block order; reorder rhs once per solve instead of per
    # iteration (CG is permutation-invariant, so convergence is identical)
    sig = layout == "pallas" and uses_sigma_basis(img_shape)
    sig_ax = solver_sigma_axes(img_shape)

    def to_basis(b):
        if not sig:
            return b
        S = b.shape[0]
        return to_sigma_basis(b.reshape((S,) + img_shape),
                              sig_ax).reshape(S, -1)

    def make_solver(k):
        @jax.jit
        def solve(Tf, maps_p, rhs_p):
            m = cplx.unpack(maps_p)
            b = to_basis(cplx.unpack(rhs_p))
            xs, resids = batched_cg(
                lambda v: sense_normal_batched(Tf, m, v,
                                               coil_chunk=coil_chunk,
                                               layout=layout, sigma=sig),
                b, lamda=1.0, iters=k)
            return resids[-1], jnp.linalg.norm(xs.real)
        return solve

    def make_apply(k):
        @jax.jit
        def apply_k(Tf, maps_p, rhs_p):
            m = cplx.unpack(maps_p)
            b = to_basis(cplx.unpack(rhs_p))

            def body(v, _):
                out = sense_normal_batched(Tf, m, v,
                                           coil_chunk=coil_chunk,
                                           layout=layout, sigma=sig)
                # renormalize so the iterated value stays finite
                return out / jnp.maximum(
                    jnp.linalg.norm(out.real), 1e-30), None

            v, _ = jax.lax.scan(body, b, None, length=k)
            return jnp.linalg.norm(v.real)
        return apply_k

    # CPU baselines need only a rate: at 256^3 one iteration is minutes
    k1, k2 = ((1, 2) if n >= 256 else (2, 4)) if cpu else (5, 10)
    s1, s2 = make_solver(k1), make_solver(k2)

    def timed(f):
        t0 = time.time()
        r, nrm = f(Tf_d, maps_d, rhs_d)
        np.asarray(nrm)  # forced fetch = real synchronization
        return time.time() - t0, float(np.asarray(nrm))

    t0 = time.time()
    t_w1, nrm = timed(s1)
    t_w2, _ = timed(s2)
    t_first = time.time() - t0

    def iter_estimate(ka, kb, fa, fb, npairs=5):
        """Median of (t(kb)-t(ka))/(kb-ka) difference pairs — fetch
        latency cancels; median resists the multi-ms tunnel jitter that
        made a min-of-3 estimator flatter small configs by ~15%."""
        ds = []
        nrm = None
        for _ in range(npairs):
            ta, _ = timed(fa)
            tb, nrm = timed(fb)
            ds.append(tb - ta)
        med = float(np.median(ds))
        if med <= 0:   # noise dominates (tiny problems)
            med = max(float(np.mean(ds)), 1e-9)
        return med / (kb - ka), nrm

    per_iter, nrm = iter_estimate(k1, k2, s1, s2,
                                  npairs=1 if cpu else 3)
    assert np.isfinite(nrm), "non-finite reconstruction"
    # adapt the span so the measured difference is >= ~0.5 s of device
    # work: at 128^3 a 5-iter span is ~30 ms, far below the tunnel's
    # multi-ms fetch jitter. Skip when the default span is already >=0.3 s
    # (e.g. 256^3) — the adapted solvers would recompile for minutes.
    span = min(max(int(np.ceil(0.5 / max(per_iter, 1e-9))), k2 - k1), 1000)
    if not cpu and span > k2 - k1 and per_iter * (k2 - k1) < 0.3:
        k1a, k2a = k2, k2 + span
        s1a, s2a = make_solver(k1a), make_solver(k2a)
        timed(s1a)
        timed(s2a)  # compile both
        per_iter, nrm = iter_estimate(k1a, k2a, s1a, s2a)
        assert np.isfinite(nrm), "non-finite reconstruction"
    t_warm = per_iter * k2
    ips = 1.0 / per_iter

    # NUFFT normal-op applies/sec (the BASELINE.json companion metric)
    ka1, ka2 = k1, k1 + max(k2 - k1, min(span, 200))
    a1, a2 = make_apply(ka1), make_apply(ka2)

    def timed_a(f):
        t0 = time.time()
        np.asarray(f(Tf_d, maps_d, rhs_d))
        return time.time() - t0

    timed_a(a1)
    timed_a(a2)
    adiffs = []
    for _ in range(1 if cpu else 5):
        u1 = timed_a(a1)
        u2 = timed_a(a2)
        adiffs.append(u2 - u1)
    besta = float(np.median(adiffs))
    if besta <= 0:
        besta = max(float(np.mean(adiffs)), 1e-9)
    per_apply = max(besta / (ka2 - ka1), per_iter / 4)
    log(f"normal-op applies/sec: {1.0/per_apply:.2f} "
        f"({per_apply*1e3:.1f} ms/apply)")

    # roofline for one CG iteration: both resource models live in ONE
    # place — profiling.toeplitz_cg_iter_bytes (HBM) and
    # toeplitz_cg_iter_macs (MXU). The speed-of-light is the max of the
    # two floors: both headline sizes are MXU-bound (the 9-pass
    # Karatsuba x bf16x3 scheme executes 4.3T MACs per iteration at
    # 256^3, 0.54T at 128^3 — see profiling.py for why those counts are
    # already the executed-FLOP optimum at f32 accuracy, and for the
    # round-4 correction of the non-radix inverse-stage depth).
    from indigo_tpu.profiling import (
        HBM_BYTES_PER_SEC, MXU_MACS_PER_SEC, toeplitz_cg_iter_bytes,
        toeplitz_cg_iter_macs, measure_hbm_bandwidth)

    nc = maps.shape[0]
    bytes_per_iter = toeplitz_cg_iter_bytes(img_shape, nc, layout,
                                            coil_chunk)
    t_hbm = bytes_per_iter / HBM_BYTES_PER_SEC
    if layout == "pallas":
        t_mxu = toeplitz_cg_iter_macs(img_shape, nc) / MXU_MACS_PER_SEC
    else:
        t_mxu = 0.0  # jnp matmul-DFT path: HBM model only
    sol = 1.0 / max(t_hbm, t_mxu)
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    try:
        hbm_meas = measure_hbm_bandwidth()
    except Exception as e:  # pragma: no cover
        log(f"bandwidth measurement failed: {e}")
        hbm_meas = None
    sol_meas = (1.0 / max(bytes_per_iter / hbm_meas, t_mxu)
                if hbm_meas else None)
    meas_txt = (f", measured-bw SoL ~{sol_meas:.1f}/s at "
                f"{hbm_meas/1e9:.0f}GB/s" if sol_meas else "")
    log(f"device={jax.devices()[0].platform} first={t_first:.2f}s "
        f"warm={t_warm:.3f}s iters/sec={ips:.2f} "
        f"(model speed-of-light ~{sol:.1f}/s, {bound}-bound: "
        f"HBM floor {t_hbm*1e3:.1f}ms at {HBM_BYTES_PER_SEC/1e9:.0f}GB/s"
        + (f", MXU floor {t_mxu*1e3:.1f}ms at "
           f"{MXU_MACS_PER_SEC/1e12:.0f}T MAC/s" if t_mxu else "")
        + f"; {100*ips/sol:.0f}% of roofline{meas_txt})")
    return {"ips": ips, "per_apply": per_apply, "roofline_frac": ips / sol}


def diff_timed(make_fn, args, k1, k2, npairs=3, min_span=0.5, max_k=2000):
    """Median (t(k2)-t(k1))/(k2-k1) with adaptive span widening.

    ``make_fn(k)`` returns a compiled callable of ``args`` whose result is
    fetched (np.asarray) to synchronize. The span k2-k1 is widened until it
    covers >= min_span seconds of device work so the ~ms tunnel fetch
    jitter can't flatter the estimate (see BASELINE.md caveats).
    """
    def timed(f):
        t0 = time.time()
        np.asarray(f(*args))
        return time.time() - t0

    def estimate(ka, kb, n):
        fa, fb = make_fn(ka), make_fn(kb)
        timed(fa)
        timed(fb)  # compile + warm
        ds = []
        for _ in range(n):
            ta = timed(fa)
            tb = timed(fb)
            ds.append(tb - ta)
        med = float(np.median(ds))
        if med <= 0:
            med = max(float(np.mean(ds)), 1e-9)
        return med / (kb - ka)

    per = estimate(k1, k2, npairs)
    span = min(max(int(np.ceil(min_span / max(per, 1e-9))), k2 - k1),
               max_k)
    if span > (k2 - k1) and per * (k2 - k1) < 0.6 * min_span:
        per = estimate(k2, k2 + span, npairs)
    return per


def run_gridded_2d(n=128, nc=8, cpu=False):
    """2D radial 8-coil gridded CG — the SpMM hot path IN the solver loop
    (SURVEY.md §2 checklist rows 1-2: jag/blocked-ELL Pallas SpMM on TPU).
    Unlike the Toeplitz lanes, every CG iteration here applies the actual
    gridding matrix twice (A^H A), plus the oversampled-grid FFTs."""
    import jax
    import jax.numpy as jnp
    from indigo_tpu import cplx, solvers
    from indigo_tpu.analyses import apply_cost
    from indigo_tpu.models import sense_nufft_op
    from indigo_tpu.profiling import HBM_BYTES_PER_SEC

    rng = np.random.default_rng(1)
    nspokes = int(1.5 * n)
    ang = np.pi * np.arange(nspokes) / nspokes
    r = (np.arange(2 * n) - n) / (2 * n)
    traj = np.stack([np.outer(np.cos(ang), r).ravel(),
                     np.outer(np.sin(ang), r).ravel()], axis=1)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
    maps = np.asarray([
        (0.4 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2) * 3)))
        * np.exp(2j * np.pi * (a * xx + b * yy))
        for a, b in rng.random((nc, 2))], dtype=np.complex64)

    A, plan = sense_nufft_op(traj, maps, oversamp=1.5, width=4)
    AHA = A.H * A
    log(f"gridded 2D: n={n} coils={nc} samples={plan.n_samples} "
        f"grid={plan.grid_shape} leaf={type(A).__name__}")
    rhs = (rng.standard_normal((n * n, 1), dtype=np.float32)
           + 1j * rng.standard_normal((n * n, 1), dtype=np.float32)
           ).astype(np.complex64)
    A_d = cplx.device_put_tree(AHA)
    rhs_d = jax.device_put(cplx.pack(rhs))
    lam = 1e-1

    def make(k):
        @cplx.cjit
        def f(Aop, b):
            x, _ = solvers.cg(Aop, b, lamda=lam, tol=0.0, maxiter=k,
                              history=True)
            return jnp.linalg.norm(jnp.real(x))
        return f

    k1, k2 = (1, 2) if cpu else (5, 15)
    per_iter = diff_timed(make, (A_d, rhs_d), k1, k2,
                          npairs=1 if cpu else 3,
                          min_span=0.0 if cpu else 0.5)
    ips = 1.0 / per_iter
    # roofline: 2 gridded-operator applies (A^H A via one normal apply
    # counted by apply_cost on the product tree) + 6 CG vector passes
    _, bytes_apply = apply_cost(AHA, 1)
    bytes_per_iter = bytes_apply + 6 * n * n * 8
    sol = HBM_BYTES_PER_SEC / bytes_per_iter
    log(f"gridded 2D CG: {ips:.1f} iters/sec "
        f"(SoL ~{sol:.0f}/s, {100*ips/sol:.0f}% of roofline)")
    return {"ips": ips, "roofline_frac": ips / sol}


def run_cartesian_2d(n=128, iters=50, cpu=False):
    """Config-1 lane: 2D Cartesian CG-SENSE at 128x128 (BASELINE.json
    configs[0]) — CG on A^H A where A = Mask . CenteredDFT (. coil maps
    for the 8-coil variant). The sampling mask rides the structured Mask
    leaf (one gather per direction; the reference pays a csrmm for this
    0/1 matrix — SURVEY.md §3.4). Reports single-coil iters/sec (the
    config-1 number), the 8-coil rate, and the normal-op rel-err vs the
    float64 oracle."""
    import jax
    import jax.numpy as jnp
    from indigo_tpu import cplx, oracle, solvers
    from indigo_tpu.analyses import apply_cost
    from indigo_tpu.models import cartesian_sense_op
    from indigo_tpu.profiling import HBM_BYTES_PER_SEC
    from indigo_tpu.utils import rel_err

    rng = np.random.default_rng(7)
    img_shape = (n, n)
    # variable-density row mask, fully-sampled center band (config-1's
    # "CSR sampling mask": ~1/3 of rows kept)
    p = 1.0 / (1.0 + 40.0 * np.abs(np.linspace(-0.5, 0.5, n)))
    rows = rng.random(n) < p / p.mean() / 3.0
    rows[int(n * 0.46):int(n * 0.54)] = True
    mask = np.zeros(img_shape, bool)
    mask[rows] = True
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
    maps8 = np.asarray([
        (0.4 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2) * 3)))
        * np.exp(2j * np.pi * (a * xx + b * yy))
        for a, b in rng.random((8, 2))], dtype=np.complex64)
    lam = 1e-2
    out = {}
    for tag, maps in (("c1", np.ones((1, n, n), np.complex64)),
                      ("c8", maps8)):
        A = cartesian_sense_op(mask, maps)
        # reference workflow: optimize() before the solve (SURVEY.md §3.2).
        # RealizeMatrices fuses Mask.H . Mask into a 0/1 Diag — the CG loop
        # then has NO gathers (the narrow-column mask gathers measured
        # 94-294 us/round-trip vs 2-16 us for the whole DFT round trip)
        from indigo_tpu import transforms
        AHA = transforms.optimize(A.H * A)
        rhs = (rng.standard_normal((n * n, 1), dtype=np.float32)
               + 1j * rng.standard_normal((n * n, 1), dtype=np.float32)
               ).astype(np.complex64)
        A_d = cplx.device_put_tree(AHA)
        rhs_d = jax.device_put(cplx.pack(rhs))

        def make(k):
            @cplx.cjit
            def f(Aop, b):
                x, _ = solvers.cg(Aop, b, lamda=lam, tol=0.0, maxiter=k,
                                  history=True)
                return jnp.linalg.norm(jnp.real(x))
            return f

        # the masked-FFT normal op is light (~us/iter at 128^2), so even
        # the CPU-baseline path needs a widened span: a 1-iter diff is
        # pure timer noise (observed 1e9 "iters/sec")
        k1, k2 = (1, 2) if cpu else (10, 30)
        per_iter = diff_timed(make, (A_d, rhs_d), k1, k2,
                              npairs=1 if cpu else 3,
                              min_span=0.05 if cpu else 0.5)
        out[tag] = 1.0 / per_iter
        if tag == "c1":
            # roofline: one normal-op apply + 6 CG vector passes
            _, bytes_apply = apply_cost(AHA, 1)
            sol = HBM_BYTES_PER_SEC / (bytes_apply + 6 * n * n * 8)
            out["roofline_frac"] = out[tag] / sol
            # correctness: device normal op vs the float64 oracle
            v = (rng.standard_normal((n * n,), dtype=np.float32)
                 + 1j * rng.standard_normal((n * n,), dtype=np.float32)
                 ).astype(np.complex64)
            dev = np.asarray(AHA * v[:, None])[:, 0]
            ref = oracle.cartesian_sense_adjoint(
                oracle.cartesian_sense_forward(
                    v.astype(np.complex128), mask, maps), mask, maps)[:, 0]
            out["oracle_err"] = rel_err(dev, ref)
    log(f"cartesian 2D CG {n}x{n}: single-coil {out['c1']:.1f} iters/sec "
        f"({100 * out['roofline_frac']:.0f}% of roofline), 8-coil "
        f"{out['c8']:.1f}, normal-op vs float64 oracle "
        f"{out['oracle_err']:.2e}")
    assert out["oracle_err"] < 1e-5
    return out


def run_tile_3d(n=128, cpu=False):
    """3D tile-gather KB interpolation applies/sec (the gridded forward/
    adjoint that serves rhs builds + simulation; ops/tile_interp.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu import noncart
    from indigo_tpu.ops.tile_interp import plan_tile_interp, \
        tile_interp_apply
    from indigo_tpu.profiling import HBM_BYTES_PER_SEC

    traj = kooshball_traj(16 * n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in (n, n, n))
    perm = noncart.sort_trajectory(traj, grid,
                                   tile=noncart.DEFAULT_TILES[3])
    plan = plan_tile_interp(traj[perm], grid, width=4, reorder=True)
    M = plan.n_samples
    N = int(np.prod(grid))
    log(f"tile 3D: grid={grid} samples={M} S={plan.S}")
    rng = np.random.default_rng(2)
    xr = jax.device_put(jnp.asarray(
        rng.standard_normal((N, 1), dtype=np.float32)))
    xi = jax.device_put(jnp.asarray(
        rng.standard_normal((N, 1), dtype=np.float32)))
    yr = jax.device_put(jnp.asarray(
        rng.standard_normal((M, 1), dtype=np.float32)))
    yi = jax.device_put(jnp.asarray(
        rng.standard_normal((M, 1), dtype=np.float32)))
    plan_d = jax.device_put(plan)

    def make_dir(adjoint):
        def make(k):
            @jax.jit
            def f(p, ar, ai):
                def step(s, _):
                    v = lax.complex(ar * (1 + 1e-37 * s), ai)
                    out = tile_interp_apply(p, v, adjoint=adjoint)
                    return jnp.sum(jnp.real(out)) * 1e-30, None

                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        return make

    k1, k2 = (1, 2) if cpu else (2, 6)
    per_f = diff_timed(make_dir(False), (plan_d, xr, xi), k1, k2,
                       npairs=1 if cpu else 3,
                       min_span=0.0 if cpu else 0.5)
    per_a = diff_timed(make_dir(True), (plan_d, yr, yi), k1, k2,
                       npairs=1 if cpu else 3,
                       min_span=0.0 if cpu else 0.5)
    # two-term speed-of-light: gather-shaped ops are ROW-bound (measured
    # ~8 ns per gathered row) before they are byte-bound, so the floor is
    # max(stream bytes / BW, gathered rows * GATHER_SEC_PER_ROW). The
    # grouped forward gathers only covered super-tile rows.
    from indigo_tpu.profiling import GATHER_SEC_PER_ROW
    NT = int(np.prod(plan.nt))
    if plan.fgroups is not None:
        rows = sum(int(t.shape[0] * t.shape[1]) for t in plan.fgroups.tids)
    else:
        rows = M * plan.S
    stream = rows * 2 * 128 * 4 + NT * 2 * 128 * 4 + plan.memusage()
    floor = max(stream / HBM_BYTES_PER_SEC, rows * GATHER_SEC_PER_ROW)
    sol_f = 1.0 / floor
    # adjoint floor: three-resource model mirroring _adjoint_binned
    # stage for stage (profiling.tile_adj_floor); K=2 (re/im folded)
    from indigo_tpu.profiling import tile_adj_floor
    a_floor, a_terms = tile_adj_floor(plan, K=2)
    log(f"tile 3D applies/sec: fwd {1/per_f:.1f} ({per_f*1e3:.1f} ms, "
        f"{100/(per_f*sol_f):.0f}% of the row-gather/stream floor "
        f"{floor*1e3:.1f} ms), adj {1/per_a:.1f} ({per_a*1e3:.1f} ms, "
        f"{100*a_floor/per_a:.0f}% of the {a_floor*1e3:.1f} ms floor: "
        + " ".join(f"{k}={v*1e3:.1f}ms" for k, v in a_terms.items()) + ")")
    return {"fwd": 1.0 / per_f, "adj": 1.0 / per_a,
            "fwd_roofline_frac": 1.0 / (per_f * sol_f),
            "adj_roofline_frac": a_floor / per_a}


def run_fista_cs(n=128, nc=4, lam=2e-3, iters=100, cpu=False):
    """Config-4 lane: l1-wavelet CS recon via FISTA (SURVEY.md §2 Solvers
    row; examples/cs_wavelet_fista.py is the demo form). Solved in the
    wavelet domain so the prox is plain soft-thresholding; the whole loop
    is one compiled lax.scan. Reports iters/sec and the final rel-err vs
    the float64 oracle FISTA on the same problem."""
    import jax.numpy as jnp
    import indigo_tpu as it
    from indigo_tpu import oracle
    from indigo_tpu.models import cartesian_sense_op
    from indigo_tpu.utils import rand64c, rel_err

    rng = np.random.default_rng(3)
    img_shape = (n, n)
    yy, xx = np.mgrid[0:n, 0:n] / n
    maps = np.asarray([
        (0.5 + np.exp(-(((xx - a) ** 2 + (yy - b) ** 2) * 3)))
        * np.exp(1j * 2 * np.pi * (a * xx + b * yy))
        for a, b in [(0.3, 0.3), (0.3, 0.7), (0.7, 0.3), (0.7, 0.7)][:nc]],
        dtype=np.complex64)
    # variable-density row mask, fully-sampled center band
    p = 1.0 / (1.0 + 40.0 * np.abs(np.linspace(-0.5, 0.5, n)))
    rows = rng.random(n) < p / p.mean() / 3.0
    rows[int(n * 0.46):int(n * 0.54)] = True
    mask = np.zeros(img_shape, bool)
    mask[rows] = True
    img = np.zeros(img_shape, np.complex64)   # ellipse phantom
    for cx, cy, rx, ry, a in [(0.5, 0.5, 0.35, 0.45, 1.0),
                              (0.45, 0.5, 0.1, 0.15, -0.5),
                              (0.6, 0.4, 0.08, 0.06, 0.7)]:
        img[((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1] += a
    x_true = img.ravel()

    A = cartesian_sense_op(mask, maps)
    W = it.DWT(img_shape, wavelet="db4", levels=3)
    y = np.array(A * x_true[:, None])
    y += 0.01 * np.abs(y).mean() * rand64c(*y.shape, rng=rng)
    L = float(it.max_eigen(A.H * A, n * n, iters=30).real) * 1.05
    proxg = lambda v, a: it.soft_thresh(v, lam * a)
    u0 = np.zeros((n * n, 1), np.complex64)

    # NB: close over the HOST copy of y — a complex64 *device* array cannot
    # be embedded as a jit constant on the axon backend (no complex buffer
    # support; tracing would try to fetch it back and die Unimplemented).
    def gradf(u):
        x = W.apply(u, adjoint=True)
        r = A.apply(x) - jnp.asarray(y)
        return W.apply(A.apply(r, adjoint=True))

    def make(k):
        def f():
            u, _ = it.apgd(gradf, proxg, 1.0 / L, u0, maxiter=k)
            return u
        return f

    k1, k2 = (2, 6) if cpu else (10, 30)
    per_iter = diff_timed(make, (), k1, k2, npairs=1 if cpu else 3,
                          min_span=0.0 if cpu else 0.5)
    ips = 1.0 / per_iter

    # final-answer correctness vs the float64 oracle FISTA (frozen spec)
    u_dev, _ = it.apgd(gradf, proxg, 1.0 / L, u0, maxiter=iters)

    def gradf_o(u):
        x = oracle.dwt(u, img_shape, "db4", 3, adjoint=True)
        r = oracle.cartesian_sense_forward(x, mask, maps) - y
        return oracle.dwt(oracle.cartesian_sense_adjoint(r, mask, maps),
                          img_shape, "db4", 3)

    u_o = oracle.fista(gradf_o,
                       lambda v, a: oracle.soft_thresh(v, lam * a),
                       1.0 / L, u0.astype(np.complex128), maxiter=iters)
    err = rel_err(np.asarray(u_dev), u_o)
    err_truth = rel_err(np.asarray(W.H * np.asarray(u_dev))[:, 0], x_true)
    log(f"FISTA CS {n}x{n} {nc}-coil: {ips:.1f} iters/sec, "
        f"rel-err vs float64 oracle {err:.2e}, vs truth {err_truth:.3f}")
    assert err < 5e-3, f"FISTA diverged from the float64 oracle: {err}"
    return {"ips": ips, "oracle_err": err, "truth_err": err_truth}


def run_serving(n=256, nc=8, iters=10):
    """Serving lane: the compiled SenseRecon pipeline at the full config-3
    acquisition (SURVEY.md §3.4). Reports the warm device-resident solve
    (rhs build + CG, the production number on a host-attached chip), the
    device->host egress of one volume on this link, and the overlapped
    3-acquisition stream rate (egress of k rides under the solve of k+1 —
    SenseRecon.stream), which should sit near the compute-only rate even
    on this sandbox's slow tunnel."""
    import jax
    from indigo_tpu.models import SenseRecon

    traj, img_shape, maps, _ = build_problem(n=n, nspokes=16 * n, nread=n)
    maps = maps[:nc]
    rng = np.random.default_rng(5)
    M = len(traj)
    t0 = time.time()
    recon = SenseRecon(traj, maps, iters=iters,
                       coil_chunk=4 if n >= 256 else None)
    t_init = time.time() - t0
    ys = [(rng.standard_normal((nc * M,), dtype=np.float32)
           + 1j * rng.standard_normal((nc * M,), dtype=np.float32)
           ).astype(np.complex64) for _ in range(3)]

    def dev_solve(y):
        x = recon(y, output="device")
        jax.block_until_ready((x.re, x.im))
        return x

    t0 = time.time()
    x0 = dev_solve(ys[0])
    t_first = time.time() - t0
    t0 = time.time()
    x0 = dev_solve(ys[0])
    t_warm = time.time() - t0
    t0 = time.time()
    _ = np.asarray(x0.re) + 1j * np.asarray(x0.im)
    t_egress = time.time() - t0
    t0 = time.time()
    out = list(recon.stream(ys))
    t_stream = (time.time() - t0) / len(out)

    # rhs G^H stage alone against its three-resource floor: the dominant
    # rhs cost at this config is the binned tile-gather adjoint at the
    # full folded coil count K=2*nc (the CG's normal op never runs it —
    # Toeplitz embedding — so the serving lane is the only place this
    # apply shape is driver-visible)
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu.ops.tile_interp import tile_interp_apply
    from indigo_tpu.profiling import tile_adj_floor
    tplan = None
    stack = [recon._A_d]
    while stack:
        node = stack.pop()
        p = getattr(node, "plan", None)
        if p is not None and getattr(p, "bins", None) is not None:
            tplan = p
            break
        stack.extend(c for c in (getattr(node, a, None)
                                 for a in ("left", "right", "child"))
                     if c is not None)
        stack.extend(getattr(node, "blocks", None) or [])
    rng2 = np.random.default_rng(7)
    yr = jax.device_put(rng2.standard_normal((M, nc), dtype=np.float32))
    yi = jax.device_put(rng2.standard_normal((M, nc), dtype=np.float32))

    def make_adj(k):
        @jax.jit
        def f(p, ar, ai):
            def step(s, _):
                v = lax.complex(ar * (1 + 1e-37 * s), ai)
                o = tile_interp_apply(p, v, adjoint=True)
                return jnp.sum(jnp.real(o)) * 1e-30, None
            s, _ = lax.scan(step, jnp.float32(0), None, length=k)
            return s
        return f

    per_adj = diff_timed(make_adj, (tplan, yr, yi), 1, 3, npairs=3,
                         min_span=0.5)
    a_floor, a_terms = tile_adj_floor(tplan, K=2 * nc)
    log(f"serving rhs G^H adjoint (K={2 * nc}): {per_adj * 1e3:.0f} ms, "
        f"{100 * a_floor / per_adj:.0f}% of the {a_floor * 1e3:.0f} ms "
        "floor: "
        + " ".join(f"{k}={v * 1e3:.0f}ms" for k, v in a_terms.items()))
    log(f"serving {n}^3 {nc}-coil: init {t_init:.1f}s first {t_first:.1f}s "
        f"warm {t_warm:.2f}s (device-resident) egress {t_egress:.2f}s "
        f"stream {t_stream:.2f}s/acq over {len(out)}")
    return {"warm_s": t_warm, "egress_s": t_egress, "stream_s": t_stream,
            "first_s": t_first, "adj_s": per_adj,
            "adj_roofline_frac": a_floor / per_adj}


def run_sharded_vol(n=256, iters=10, nspokes=None, nread=None):
    """n^3 volume-sharded (tensor-parallel) over all visible devices.

    The bench lane runs it at n=256 (``--sharded``, needs >1 real chip);
    tests exercise the same code path at small n on the virtual 8-device
    CPU mesh (tests/test_bench_smoke.py), so it cannot bitrot unnoticed.
    """
    import jax
    from jax.sharding import Mesh
    from indigo_tpu.parallel.recon import sense_vol_recon

    devs = np.array(jax.devices())
    traj, img_shape, maps, rhs = build_problem(
        n=n, nspokes=16 * n if nspokes is None else nspokes,
        nread=n if nread is None else nread)
    if n >= 256:
        Tf = toeplitz_cached(traj, img_shape, n)
    else:
        from indigo_tpu.toeplitz import toeplitz_kernel
        Tf = toeplitz_kernel(traj, img_shape, oversamp=1.25, width=4)
    mesh = Mesh(devs, ("vol",))
    t0 = time.time()
    x, resids = sense_vol_recon(Tf, maps, rhs.reshape(img_shape), mesh,
                                lamda=1.0, iters=iters)
    t_first = time.time() - t0
    t0 = time.time()
    x, resids = sense_vol_recon(Tf, maps, rhs.reshape(img_shape), mesh,
                                lamda=1.0, iters=iters)
    t_warm = time.time() - t0
    ips = iters / t_warm
    log(f"sharded {n}^3 over {len(devs)} devices: first={t_first:.1f}s "
        f"warm {ips:.2f} iters/sec")
    return {"ips": ips, "x": x, "resids": resids}


def emit(metric, value, vs=None, **extra):
    rec = {"metric": metric, "value": round(value, 3), "unit": "iters/sec",
           "vs_baseline": round(vs, 3) if vs else None}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    cpu = "--cpu" in sys.argv
    small = "--small" in sys.argv
    huge = "--huge" in sys.argv   # full config-3 size only: 256^3
    sharded = "--sharded" in sys.argv
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    enable_compile_cache()
    if small and huge:
        sys.exit("--small and --huge are mutually exclusive")

    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_cpu.json")
    base = {}
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
    # legacy single-value format -> per-config dict
    cfgs = base.setdefault("configs", {})
    if base.get("n") == 128 and base.get("value") and \
            "toeplitz_128" not in cfgs:
        cfgs["toeplitz_128"] = base["value"]

    if cpu:
        aux = "--aux" in sys.argv   # only the gridded/tile lanes (fast)
        if huge:
            r = run_config(256, cpu=True)
            cfgs["toeplitz_256"] = r["ips"]
        elif aux:
            # emit only what was actually measured this run: re-emitting
            # the cached toeplitz_128 here would make a stale baseline
            # look freshly measured (round-3 advisory)
            cfgs["cartesian2d_128"] = run_cartesian_2d(cpu=True)["c1"]
            cfgs["gridded2d_128"] = run_gridded_2d(cpu=True)["ips"]
            t = run_tile_3d(cpu=True)
            cfgs["tile3d_128_fwd"] = t["fwd"]
            cfgs["fista_128"] = run_fista_cs(cpu=True)["ips"]
            with open(base_file, "w") as f:
                json.dump(base, f, indent=1)
            log(f"wrote CPU aux baselines: "
                f"{ {k: round(v, 4) for k, v in cfgs.items()} }")
            emit("gridded_cg_iters_per_sec_2d_radial_128c8_cpu",
                 cfgs["gridded2d_128"], vs=1.0)
            return
        else:
            r = run_config(128, cpu=True)
            cfgs["toeplitz_128"] = r["ips"]
            base.update({"metric": "cg_iters_per_sec_3d_sense",
                         "value": r["ips"], "n": 128})
            cfgs["cartesian2d_128"] = run_cartesian_2d(cpu=True)["c1"]
            cfgs["gridded2d_128"] = run_gridded_2d(cpu=True)["ips"]
            t = run_tile_3d(cpu=True)
            cfgs["tile3d_128_fwd"] = t["fwd"]
            cfgs["fista_128"] = run_fista_cs(cpu=True)["ips"]
        with open(base_file, "w") as f:
            json.dump(base, f, indent=1)
        log(f"wrote CPU baselines: { {k: round(v, 4) for k, v in cfgs.items()} }")
        emit("cg_iters_per_sec_3d_sense_cpu", r["ips"], vs=1.0)
        return

    def vs(key, val):
        return (val / cfgs[key]) if cfgs.get(key) else None

    if sharded and len(jax.devices()) > 1:
        r = run_sharded_vol()
        emit("cg_iters_per_sec_3d_sense_256c8_sharded", r["ips"],
             n_devices=len(jax.devices()))

    if not (small or huge):
        # config-1 first (BASELINE.json order), then the gridded/SpMM
        # hot-path lanes (SURVEY.md §2 rows 1-2); the LAST line stays
        # the cross-round headline
        c = run_cartesian_2d()
        emit("cartesian_cg_iters_per_sec_2d_128c1", c["c1"],
             vs=vs("cartesian2d_128", c["c1"]),
             coil8_iters_per_sec=round(c["c8"], 3),
             roofline_pct=round(100 * c["roofline_frac"], 1),
             rel_err_vs_oracle=round(c["oracle_err"], 8))
        g = run_gridded_2d()
        emit("gridded_cg_iters_per_sec_2d_radial_128c8", g["ips"],
             vs=vs("gridded2d_128", g["ips"]),
             roofline_pct=round(100 * g["roofline_frac"], 1),
             model="tile-leaf-cost-r4")
        t = run_tile_3d()
        emit("tile_gather_fwd_applies_per_sec_3d_128", t["fwd"],
             vs=vs("tile3d_128_fwd", t["fwd"]), unit="applies/sec",
             adj_applies_per_sec=round(t["adj"], 3),
             roofline_pct=round(100 * t["fwd_roofline_frac"], 1),
             adj_roofline_pct=round(100 * t["adj_roofline_frac"], 1))
        f = run_fista_cs()
        emit("fista_cs_iters_per_sec_2d_128c4", f["ips"],
             vs=vs("fista_128", f["ips"]),
             rel_err_vs_oracle=round(f["oracle_err"], 6),
             rel_err_vs_truth=round(f["truth_err"], 4))
        s = run_serving()
        emit("serving_warm_seconds_3d_256c8", s["warm_s"], unit="seconds",
             egress_seconds=round(s["egress_s"], 2),
             stream_seconds_per_acq=round(s["stream_s"], 2),
             rhs_adj_seconds=round(s["adj_s"], 4),
             rhs_adj_roofline_pct=round(100 * s["adj_roofline_frac"], 1),
             delivery="device")

    configs = [64] if small else ([256] if huge else [256, 128])
    for n in configs:
        r = run_config(n)
        emit(f"cg_iters_per_sec_3d_sense_{n}c8", r["ips"],
             vs=vs(f"toeplitz_{n}", r["ips"]),
             normal_op_applies_per_sec=round(1.0 / r["per_apply"], 3),
             roofline_pct=round(100 * r["roofline_frac"], 1))


if __name__ == "__main__":
    main()
