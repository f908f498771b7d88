"""Measure the binned (scatter-free) tile-interp adjoint on TPU at serving
scale vs the scatter formulation, and validate exactness device-side.

Usage: python tools/binned_micro.py [n] [K]   (defaults 256 16)
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import kooshball_traj  # noqa: E402
from indigo_tpu import noncart  # noqa: E402
from indigo_tpu.ops import tile_interp as ti  # noqa: E402


def measure(fn, args, label, k1=1, k2=3):
    def build(k):
        @jax.jit
        def g(*a):
            def step(s, _):
                return fn(s, *a), None

            s, _ = lax.scan(step, jnp.float32(0), None, length=k)
            return s

        return g

    f1, f2 = build(k1), build(k2)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    run(f1)
    run(f2)
    t1 = min(run(f1) for _ in range(3))
    t2 = min(run(f2) for _ in range(3))
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{label}: {ms:.1f} ms", flush=True)
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    traj = kooshball_traj(16 * n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in (n, n, n))
    perm = noncart.sort_trajectory(traj, grid)
    t0 = time.time()
    plan = ti.plan_tile_interp(traj[perm], grid, width=4)
    M = plan.n_samples
    NT = int(np.prod(plan.nt))
    bins = plan.bins
    padded = sum(int(i.size) for i in bins.idx)
    print(f"plan+bins built in {time.time()-t0:.1f}s M={M} NT={NT} "
          f"classes={bins.widths} rows={[i.shape[0] for i in bins.idx]} "
          f"padded={padded} ({padded/(M*plan.S):.2f}x entries) "
          f"bins={bins.memusage()/1e6:.0f}MB", flush=True)

    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((M, K), dtype=np.float32)))
    plan_d = jax.device_put(plan)

    def f_binned(s, y):
        xt = ti._adjoint_binned(plan_d, y * (1 + 1e-37 * s), K, NT)
        return xt[0, 0]

    def f_scatter(s, y):
        chunk = max(1024, (1 << 30) // (plan.S * K * 512))
        xt = ti._adjoint(plan_d, y * (1 + 1e-37 * s), K, NT, chunk)
        return xt[0, 0]

    def f_full(s, y):
        g = ti.tile_interp_apply(plan_d, y * (1 + 1e-37 * s), adjoint=True)
        return g[0, 0]

    measure(f_binned, (y,), "binned adjoint (tiled out)")
    measure(f_full, (y,), "binned adjoint + untile")
    measure(f_scatter, (y,), "scatter adjoint (tiled out)")

    # device-side exactness on a subsample (full compare OOMs the tunnel)
    yt = np.asarray(rng.standard_normal((M, 2), dtype=np.float32))
    a_b = np.asarray(jax.jit(
        lambda p, v: ti._adjoint_binned(p, v, 2, NT),
        static_argnums=())(plan_d, jnp.asarray(yt))[:4096])
    chunk = max(1024, (1 << 30) // (plan.S * 2 * 512))
    a_s = np.asarray(ti._adjoint(plan_d, jnp.asarray(yt), 2, NT,
                                 chunk)[:4096])
    err = (np.linalg.norm(a_b - a_s)
           / max(np.linalg.norm(a_s), 1e-30))
    print(f"binned vs scatter on device (first 4096 tile rows): {err:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
