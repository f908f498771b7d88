"""Tile-interp ADJOINT strategy shootout at serving scale (the dominant
256^3 rhs stage: 1.68 s measured on the current scatter formulation).

Usage: python tools/adj_micro.py [n] [K] [variants...]
(defaults 256 16 all). Variants:

  base      current _adjoint (combined-slot scatter, auto chunk)
  chunk=X   current _adjoint with explicit chunk
  slot      per-slot scatter, samples sorted by corner tile id, so each
            slot's target ids are monotone (indices_are_sorted=True)
  seg       per-slot sorted segment_sum
  nomult    combined scatter of PRErolled contrib rows to measure the
            weight-multiply cost separately (scatters chunk 0's contrib
            every step — same scatter traffic, no per-step multiply)

K=16 matches serving (8 coils as split re/im planes).
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


def corner_sorted(plan):
    """Permutation sorting samples by corner tile id (tid[:, 0])."""
    corner = np.asarray(plan.tid[:, 0])
    return np.argsort(corner, kind="stable")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    want = sys.argv[3:] or ["base", "slot", "seg", "nomult"]

    traj = kooshball_traj(16 * n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in (n, n, n))
    perm = noncart.sort_trajectory(traj, grid)
    t0 = time.time()
    plan = ti.plan_tile_interp(traj[perm], grid, width=4)
    M, S = plan.n_samples, plan.S
    NT = int(np.prod(plan.nt))
    print(f"plan built in {time.time()-t0:.1f}s grid={grid} M={M} "
          f"S={S} NT={NT} K={K}", flush=True)

    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((M, K), dtype=np.float32)))
    plan_d = jax.device_put(plan)

    # corner-sorted copy (per-slot ids monotone)
    ps = corner_sorted(plan)
    plan_s = ti.TileInterpPlan(
        tid=jnp.asarray(np.asarray(plan.tid)[ps]),
        wfac=[jnp.asarray(np.asarray(w)[ps]) for w in plan.wfac],
        grid_shape=plan.grid_shape, tile=plan.tile, ext=plan.ext,
        nt=plan.nt, pad_lo=plan.pad_lo, width=plan.width)
    plan_s_d = jax.device_put(plan_s)
    y_s = jax.device_put(jnp.asarray(
        np.asarray(rng.standard_normal((M, K), dtype=np.float32))))

    for v in want:
        if v == "base" or v.startswith("chunk="):
            chunk = int(v.split("=")[1]) if "=" in v else None

            def f(s, y):
                xt = ti._adjoint(plan_d, y * (1 + 1e-37 * s), K, NT,
                                 chunk or max(1024, (1 << 30) // (S * K * 512)))
                return xt[0, 0]

            measure(f, (y,), f"scatter {v}")

        elif v == "slot":
            chunk = max(1024, (1 << 30) // (S * K * 512))
            nchunk = -(-M // chunk)
            Mp = nchunk * chunk

            def padm(a):
                if a.shape[0] == Mp:
                    return a
                return jnp.pad(a, [(0, Mp - a.shape[0])]
                               + [(0, 0)] * (a.ndim - 1))

            tid_c = padm(plan_s_d.tid).reshape(nchunk, chunk, S)
            wf_c = [padm(w).reshape(nchunk, chunk, *w.shape[1:])
                    for w in plan_s_d.wfac]

            def f(s, y):
                yp = padm(y * (1 + 1e-37 * s)).reshape(nchunk, chunk, K)

                def one(carry, args):
                    tid, wfac, yc = args
                    W = ti._lane_weights(plan_s_d, wfac)      # (m, S, 128)
                    contrib = yc[:, None, :, None] * W[:, :, None, :]
                    contrib = contrib.reshape(chunk, S, K * 128)
                    for s_ in range(S):
                        carry = carry.at[tid[:, s_]].add(
                            contrib[:, s_], indices_are_sorted=True)
                    return carry, None

                zero = jnp.zeros((NT, K * 128), jnp.float32)
                out, _ = lax.scan(one, zero, (tid_c, wf_c, yp))
                return out[0, 0]

            measure(f, (y_s,), "per-slot sorted scatter")

        elif v == "seg":
            chunk = max(1024, (1 << 30) // (S * K * 512))
            nchunk = -(-M // chunk)
            Mp = nchunk * chunk

            def padm(a):
                if a.shape[0] == Mp:
                    return a
                return jnp.pad(a, [(0, Mp - a.shape[0])]
                               + [(0, 0)] * (a.ndim - 1))

            tid_c = padm(plan_s_d.tid).reshape(nchunk, chunk, S)
            wf_c = [padm(w).reshape(nchunk, chunk, *w.shape[1:])
                    for w in plan_s_d.wfac]

            def f(s, y):
                yp = padm(y * (1 + 1e-37 * s)).reshape(nchunk, chunk, K)

                def one(carry, args):
                    tid, wfac, yc = args
                    W = ti._lane_weights(plan_s_d, wfac)
                    contrib = yc[:, None, :, None] * W[:, :, None, :]
                    contrib = contrib.reshape(chunk, S, K * 128)
                    for s_ in range(S):
                        carry = carry + jax.ops.segment_sum(
                            contrib[:, s_], tid[:, s_], num_segments=NT,
                            indices_are_sorted=True)
                    return carry, None

                zero = jnp.zeros((NT, K * 128), jnp.float32)
                out, _ = lax.scan(one, zero, (tid_c, wf_c, yp))
                return out[0, 0]

            measure(f, (y_s,), "per-slot sorted segment_sum")

        elif v == "nomult":
            chunk = max(1024, (1 << 30) // (S * K * 512))
            nchunk = -(-M // chunk)
            tid0 = plan_d.tid[:nchunk * chunk].reshape(nchunk, chunk, S)
            c0 = jnp.asarray(rng.standard_normal(
                (chunk * S, K * 128), dtype=np.float32))

            def f(s, c0):
                def one(carry, tid):
                    return carry.at[tid.reshape(-1)].add(
                        c0 * (1 + 1e-37 * s)), None

                zero = jnp.zeros((NT, K * 128), jnp.float32)
                out, _ = lax.scan(one, zero, tid0)
                return out[0, 0]

            measure(f, (c0,), "scatter only (fixed contrib)")


if __name__ == "__main__":
    main()
