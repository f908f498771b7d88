"""How much of the tile-forward's tile_grid stage (2.3 ms at 128^3,
~15x its copy floor) is the pad-wrap vs the retile transpose, and does
the big-volume two-stage _retile2 beat the monolithic 7D _retile at
128^3 too?

Run: python tools/retile_micro.py [--dim 3] [--n 128] [--K 2]
"""
import argparse
import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from tile_stage_probe import build_plan, diff_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--K", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu.ops import tile_interp as ti

    plan, grid = build_plan(args.dim, args.n)
    K = args.K
    N = int(np.prod(grid))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
    plan_d = jax.device_put(plan)
    G, E, T, lo = plan.grid_shape, plan.ext, plan.tile, plan.pad_lo
    nd = len(G)
    print(f"grid={G} ext={E} tile={T} nt={tuple(plan.nt)}")

    # the real consumer of tile_grid's output is a row GATHER (xt[tid]),
    # which takes a MATERIALIZED operand — a plain jnp.sum consumer lets
    # XLA delete the transpose outright (sum is permutation-invariant;
    # first version of this probe measured 0.0 ms everywhere). Gather a
    # fixed random row set and sum that.
    ridx = jnp.asarray(rng.integers(0, 1 << 30, size=4096, dtype=np.int64))

    def consume(out):
        flat = out.reshape(-1, out.shape[-1]) if out.ndim > 2 else out
        r = (ridx % flat.shape[0]).astype(jnp.int32)
        return jnp.sum(flat[r]) * 1e-30

    def timed(label, core):
        def make(k):
            @jax.jit
            def f(p, v):
                def step(s, _):
                    return consume(core(p, v * (1 + 1e-37 * s))
                                   ) + s * 0, None
                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        t = diff_time(make, (plan_d, x0))
        print(f"  {label:24s} {t * 1e3:8.2f} ms")

    def pad_only(plan, x):
        xk = x.T.reshape((K,) + G)
        pads = [(0, 0)] + [(lo[d], E[d] - G[d] - lo[d]) for d in range(nd)]
        return jnp.pad(xk, pads, mode="wrap")

    timed("pad-wrap only", pad_only)
    timed("pad + _retile (7D)",
          lambda p, x: ti._retile(pad_only(p, x), p.nt, T, K, nd))
    if nd == 3:
        timed("pad + _retile2 (2stage)",
              lambda p, x: ti._retile2(pad_only(p, x), p.nt, T, K, E))
    timed("tile_grid (current)", ti.tile_grid)
    # untile direction for reference (the adjoint's tail)
    NT = int(np.prod(plan.nt))
    xt0 = jnp.asarray(rng.standard_normal((NT, K * 128), dtype=np.float32))

    def timed_u(label, core):
        def make(k):
            @jax.jit
            def f(p, v):
                def step(s, _):
                    return consume(core(p, v * (1 + 1e-37 * s))
                                   ) + s * 0, None
                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        t = diff_time(make, (plan_d, xt0))
        print(f"  {label:24s} {t * 1e3:8.2f} ms")

    timed_u("untile_grid (current)",
            lambda p, v: ti.untile_grid(p, v, K))


if __name__ == "__main__":
    main()
