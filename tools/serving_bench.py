"""End-to-end SenseRecon serving latency with a stage breakdown.

Usage: python tools/serving_bench.py [n] [nc] [iters]   (defaults 256 8 10)

Times, at the full config-3 acquisition (16n spokes x n readout):
  * init (geometry + payload upload + host Toeplitz kernel build)
  * first call (compiles)
  * warm calls (median of >= 3): the serving number
  * stage split of a warm call: host sort / ingress (device_put of the
    sorted k-space planes) / rhs build / CG / egress (image fetch)

The ingress lane exists because this sandbox reaches its TPU through a
slow tunnel; on a production host-attached chip the device_put cost is
PCIe-class and the compute stages dominate. Reporting them separately
keeps the serving claim honest on both.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import build_problem, enable_compile_cache  # noqa: E402


def t(f, *a, **k):
    t0 = time.perf_counter()
    r = f(*a, **k)
    return time.perf_counter() - t0, r


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    enable_compile_cache()
    import jax
    from indigo_tpu import cplx
    from indigo_tpu.models.recon import SenseRecon

    traj, img_shape, maps, _ = build_problem(n=n, nspokes=16 * n, nread=n)
    maps = maps[:nc]
    rng = np.random.default_rng(0)
    M = len(traj)
    y = (rng.standard_normal((nc * M,), dtype=np.float32)
         + 1j * rng.standard_normal((nc * M,), dtype=np.float32)
         ).astype(np.complex64)

    kw = dict(iters=iters, coil_chunk=4 if n >= 256 else None)
    dt, recon = t(SenseRecon, traj, maps, **kw)
    print(f"init: {dt:.1f} s  (n={n} nc={nc} M={M} iters={iters} "
          f"device={jax.devices()[0].platform})", flush=True)

    dt, x0 = t(recon, y)
    print(f"first call: {dt:.1f} s", flush=True)
    warm = []
    for _ in range(3):
        dt, x1 = t(recon, y)
        warm.append(dt)
    warm.sort()
    print(f"warm calls (host delivery): {[f'{w:.2f}' for w in warm]} s  "
          f"-> median {warm[1]:.2f} s", flush=True)
    assert np.allclose(x0, x1), "serving result not deterministic"

    # device-resident delivery: the serving COMPUTE number (egress rides
    # the host link and belongs to the deployment, not the solve)
    def call_dev():
        x = recon(y, output="device")
        jax.block_until_ready((x.re, x.im))
        return x
    wd_ = []
    for _ in range(3):
        dt, xd = t(call_dev)
        wd_.append(dt)
    wd_.sort()
    print(f"warm calls (device delivery): {[f'{w:.2f}' for w in wd_]} s "
          f"-> median {wd_[1]:.2f} s", flush=True)
    xd_host = np.asarray(xd.re) + 1j * np.asarray(xd.im)
    assert np.allclose(x0, xd_host), "device output != host output"

    # ---- stage split of one warm call ----------------------------------
    dt_sort, y_sorted = t(recon.plan.sort_samples, y, ncoil=nc)
    y_sorted = y_sorted[:, None].astype(np.complex64)

    # ingress: the split-complex device upload the solve pays per call
    d0, pay = t(cplx.device_put_tree, y_sorted)
    jax.block_until_ready(jax.tree_util.tree_leaves(pay))
    d1, pay = t(cplx.device_put_tree, y_sorted)
    jax.block_until_ready(jax.tree_util.tree_leaves(pay))
    mb = y_sorted.nbytes / 1e6
    print(f"host sort: {dt_sort*1e3:.0f} ms; ingress {mb:.0f} MB: "
          f"{d1:.2f} s ({mb/max(d1,1e-9):.0f} MB/s)", flush=True)

    def timed(f, *a, reps=3):
        out = f(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(jax.tree_util.tree_leaves(out))
            best = min(best, time.perf_counter() - t0)
        return best, out

    # device-resident payload so the rhs lane times compute, not ingress
    d_rhs, (rr, ri) = timed(recon._rhs_fn, recon._A_d, recon._wd, pay)
    d_cg, out = timed(recon._cg_fn, recon._Tf, recon._maps, rr, ri,
                      recon._pd)
    d_fetch, _ = t(np.asarray, out[0])
    print(f"rhs build: {d_rhs:.2f} s; CG x{iters}: {d_cg:.2f} s "
          f"({iters/d_cg:.1f} iters/s); egress: {d_fetch:.2f} s",
          flush=True)
    print(f"stage sum: {dt_sort + d1 + d_rhs + d_cg + d_fetch:.2f} s "
          f"(vs warm median {warm[1]:.2f} s)", flush=True)


if __name__ == "__main__":
    main()
