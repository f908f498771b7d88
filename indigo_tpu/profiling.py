"""Profiling, timing and roofline reporting.

Reference parity: indigo/util.py Timer + per-iteration residual logging
(SURVEY.md §5 "Tracing/profiling"). TPU-native additions: jax.profiler
trace capture (XProf/Perfetto), a transfer-proof timing harness (this
sandbox's runtime neither synchronizes on block_until_ready nor transfers
faster than ~27MB/s, so naive timing lies), and a bytes/FLOPs roofline
report per operator apply.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import cplx
from .analyses import apply_cost
from .operators import Operator

__all__ = ["trace", "time_apply", "roofline_report", "HBM_BYTES_PER_SEC",
           "GATHER_SEC_PER_ROW",
           "MXU_MACS_PER_SEC", "toeplitz_cg_iter_bytes",
           "toeplitz_cg_iter_macs", "tile_adj_floor",
           "measure_hbm_bandwidth"]

# v5e HBM bandwidth (bytes/sec); override for other parts. This is the
# MODEL speed-of-light; ``measure_hbm_bandwidth`` provides the measured
# (achievable) figure on the current device — bench.py prints both.
HBM_BYTES_PER_SEC = 819e9

# XLA row-gather cost on v5e (best case, wide rows): measured ~6-12 ns
# per gathered row near-independent of row width (tools/ + DESIGN.md
# round-3 roadmap item 2); gather-shaped ops are ROW-bound, not
# byte-bound, so their speed-of-light is max(bytes/BW, rows * this).
GATHER_SEC_PER_ROW = 8e-9

# v5e MXU peak (bf16 MAC/s; 197 TFLOP/s nominal). Back-to-back Pallas
# dots of the kernels' exact shapes measure ~91e12 (tools/dot_probe.py,
# loopT/loopM forms) — 92% of this nominal figure.
MXU_MACS_PER_SEC = 98.5e12


def toeplitz_cg_iter_bytes(img_shape, nc, layout, coil_chunk=None):
    """Minimum HBM traffic (bytes) of ONE Toeplitz-SENSE CG iteration.

    Single source of the roofline denominator used by bench.py and the
    docs. Traffic model per coil-volume V (= prod(img_shape) complex64):

    * ``pallas`` (ops/dft_pallas.py, coil handling fused in): kernel A
      reads the map + writes 4V; B reads 4V + the spectrum, writes 4V;
      C reads 4V + the map, accumulates 1/nc V — 18V total, with the
      doubled-grid spectrum re-read once per coil chunk.
    * matmul-DFT (``block``) / fft layouts: per axis read V write 2V
      growing 1→8V forward and mirrored back (42V), plus the unfused
      coil multiply/combine (4V per coil).

    Both add the CG vector updates (6 image-size passes: Ap read/write,
    x/r/p updates).
    """
    npx = int(np.prod(img_shape))
    big = int(np.prod([2 * s for s in img_shape]))
    nchunks = max(1, nc // coil_chunk) if coil_chunk else 1
    cplx_b = 8
    vols = 18 if layout == "pallas" else 42
    fft_bytes = vols * npx * nc * cplx_b + big * 4 * nchunks
    other = ((0 if layout == "pallas" else 4 * npx * nc) + 6 * npx) * cplx_b
    return fft_bytes + other


def toeplitz_cg_iter_macs(img_shape, nc):
    """Executed bf16 MXU MACs of ONE Toeplitz-SENSE CG iteration on the
    fused Pallas path (ops/dft_pallas.py) — the COMPUTE axis of the
    roofline. 256-class volumes are MXU-bound, so the speed-of-light is
    max(HBM time, MXU time), not the HBM figure alone.

    Model, per coil-volume V, in 128-deep MXU-pass units at 9 bf16 passes
    per complex output (Karatsuba x bf16x3). Forward stages produce
    2V + 4V + ... + 2^nd V matmul outputs, each a depth-128 contraction
    (the input support is n <= 128, or the radix split's half-size m).
    Inverse stages mirror the forward for axes with s > 64: a non-radix
    inverse pack is the (s, 2s) crop-IFFT matrix — a depth-2s
    contraction, i.e. 2x 128-deep passes per final output when 2s > 128
    — and a radix inverse runs four half-size products per butterfly,
    again 2x its final outputs. For s <= 64 the whole depth-2s
    contraction fits ONE padded pass. (An earlier version counted
    non-radix inverse stages at depth 128 — half their executed MACs —
    which understated the 128^3 floor by 25% and mislabeled the headline
    lane at 64% of roofline; the corrected floor puts the measured
    6.4 ms iteration at ~85%. A later advisory fix added the s <= 64
    single-pass case, which the flat 2x had overstated ~33% at 64^3.)
    Executed-MAC floor notes (DESIGN.md): radix-4/split-radix does NOT
    reduce this — the MXU pads any contraction to depth 128, so base-128
    blocks are already the executed-FLOP optimum (splitting a non-radix
    inverse into m = n/2 quarters pads each to depth 128, landing on the
    same 2x); fewer than 9 passes costs ~2^-9-class relative error
    (>= 100x over the 5e-5 test bar).
    """
    nd = len(img_shape)
    V = int(np.prod(img_shape))
    fwd = sum(2 ** (d + 1) for d in range(nd))
    # Inverse pass-units are PER AXIS SIZE: a non-radix inverse pack is
    # the (s, 2s) crop-IFFT — depth 2s — which pads past the 128-deep MXU
    # only for s > 64 (2x passes per final output; radix axes s > 128
    # also run 2x via their four half-size butterfly products). For
    # s <= 64 the contraction fits ONE padded pass, so counting 2x there
    # overstated the 64^3 floor ~33% (round-4 advisory finding).
    inv = sum(2 ** (nd - 1 - d) * (2 if s > 64 else 1)
              for d, s in enumerate(img_shape))
    return (fwd + inv) * V * 128 * 9 * nc


def tile_adj_floor(plan, K):
    """Three-resource speed-of-light (seconds) for ONE binned tile-gather
    adjoint apply (ops/tile_interp._adjoint_binned + the untile
    transpose) at folded column count K (complex K' folds to K = 2K').

    The terms mirror the implementation stage for stage:

    * gather rows: one packed-table row per PADDED bin entry, plus the
      NT-row commit gather — row-bound at GATHER_SEC_PER_ROW.
    * HBM bytes: pack the (M, pw) table (write + the source reads),
      gather-read pw bytes per entry, write the reduced rows, commit
      (read rows_buf rows + write the tiled grid), and the untile
      transpose (read + write the full (NT, K*128) grid).
    * MXU MACs: the per-class dot_generals contract the padded entries
      at f32-HIGHEST (6 bf16 passes), K*128 outputs per entry row.

    Returns (floor_seconds, dict of per-term seconds).
    """
    bins = plan.bins
    if bins is None:
        raise ValueError("plan has no binned adjoint layout")
    NT = int(np.prod(plan.nt))
    M = plan.n_samples
    nsup = [w.shape[1] for w in plan.wfac]
    pw = K + sum(n * t for n, t in zip(nsup, plan.tile))
    if pw > 24 and pw % 64:            # width-cliff pad, as in the impl
        pw += 64 - pw % 64
    entries = sum(int(i.shape[0]) * w
                  for i, w in zip(bins.idx, bins.widths))
    nred = [int(i.shape[0]) for i in bins.idx]
    if bins.cap_seg is not None:
        nred[-1] = bins.cap_ntiles
    grid_b = NT * K * 128 * 4
    t_rows = (entries + NT) * GATHER_SEC_PER_ROW
    stream = (2 * M * pw * 4           # build the packed table
              + entries * pw * 4       # per-entry gather reads
              + sum(nred) * K * 128 * 4  # reduced-row writes
              + 2 * grid_b             # commit: read rows_buf, write grid
              + 2 * grid_b)            # untile transpose read + write
    t_hbm = stream / HBM_BYTES_PER_SEC
    t_mxu = entries * K * 128 * 6 / MXU_MACS_PER_SEC
    terms = {"rows": t_rows, "hbm": t_hbm, "mxu": t_mxu}
    return max(terms.values()), terms


def measure_hbm_bandwidth(nbytes=1 << 29, k1=4, k2=12):
    """Measured achievable HBM copy bandwidth (bytes/sec) on the current
    default device: an iterated x = x + 1 pass (read V + write V per step)
    timed by iteration differencing (transfer/fetch latency cancels)."""
    n = nbytes // 4

    def build(k):
        @jax.jit
        def f(x):
            def step(c, _):
                return c + jnp.float32(1), None
            c, _ = lax.scan(step, x, None, length=k)
            return c[0]
        return f

    x = jnp.zeros((n,), jnp.float32)
    f1, f2 = build(k1), build(k2)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(x))
        return time.perf_counter() - t0

    run(f1)
    run(f2)  # compile + warm
    ds = [run(f2) - run(f1) for _ in range(3)]
    per_pass = max(float(np.median(ds)) / (k2 - k1), 1e-9)
    return 2.0 * n * 4 / per_pass


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler trace (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _iterated_apply(op, k, adjoint_pair=True):
    """jitted fn running k applications of op (normal-op round trips when
    adjoint_pair, so shapes stay fixed) and returning a scalar."""

    @jax.jit
    def f(op, xr, xi):
        def step(c, _):
            v = lax.complex(c[0], c[1])
            y = op.apply(v)
            if adjoint_pair:
                y = op.apply(y, adjoint=True)
            return (y.real.astype(jnp.float32),
                    y.imag.astype(jnp.float32)), None

        c, _ = lax.scan(step, (xr, xi), None, length=k)
        return jnp.sum(c[0])

    return f


def time_apply(op: Operator, ncols=1, k1=2, k2=6, adjoint_pair=True,
               seed=0):
    """Wall time per operator apply, transfer-proof.

    Runs k1 and k2 chained applies inside single jits and reports
    (t(k2)-t(k1))/(k2-k1): upload, fetch latency and dispatch overhead
    cancel. With adjoint_pair=True each "apply" is a forward+adjoint pair
    (required when op is non-square so shapes chain).
    """
    if op.shape[0] != op.shape[1] and not adjoint_pair:
        raise ValueError("non-square operator needs adjoint_pair=True")
    rng = np.random.default_rng(seed)
    n = op.shape[1]
    xr = jnp.asarray(rng.standard_normal((n, ncols)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((n, ncols)).astype(np.float32))
    f1 = _iterated_apply(op, k1, adjoint_pair)
    f2 = _iterated_apply(op, k2, adjoint_pair)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(op, xr, xi))
        return time.perf_counter() - t0

    run(f1)
    run(f2)  # compile + warm both
    t1 = run(f1)
    t2 = run(f2)
    per = max((t2 - t1) / (k2 - k1), 1e-9)
    return per / (2 if adjoint_pair else 1)


def roofline_report(op: Operator, ncols=1, measure=True):
    """Per-apply FLOPs/bytes estimate and (optionally) measured time vs the
    HBM speed-of-light (north star: 'per-apply time at roofline')."""
    flops, bytes_ = apply_cost(op, ncols)
    sol = bytes_ / HBM_BYTES_PER_SEC
    lines = [
        f"operator: {op.name} {op.shape} x {ncols} cols",
        f"est. flops/apply:  {flops:,}",
        f"est. bytes/apply:  {bytes_:,}",
        f"HBM speed-of-light: {sol*1e3:.3f} ms",
    ]
    result = {"flops": flops, "bytes": bytes_, "sol_sec": sol}
    if measure:
        t = time_apply(op, ncols)
        result["measured_sec"] = t
        result["roofline_frac"] = sol / t if t else 0.0
        lines += [
            f"measured/apply:    {t*1e3:.3f} ms",
            f"roofline fraction: {100*result['roofline_frac']:.1f}%",
        ]
    return result, "\n".join(lines)
