"""Which formulation of the tile-forward contraction is fastest?

tile_stage_probe.py attributed the 3D tile forward's 15.9 ms to the
multiply-reduce stage (+7.5 ms over the gather — vs ~1.5 ms of honest
traffic if the elementwise multiply and both reductions fused into one
pass over the gathered rows). This probe times the COMPLETE forward
(tile_grid + per-group gather + contraction + concat) under alternative
contraction formulations, all mathematically identical:

  v0_current   r = (g * W[:,:,None,:]).sum(1); out = r.sum(-1)
  v1_rowlayout keep the gather's native (m*S, K*128) row layout; tile W
               over K, multiply there, reduce S then lanes
  v2_einsum    einsum('mskl,msl->mk')
  v3_dot       dot_general, batch=m, contract S*128 (needs a transpose)
  v4_lanefirst reduce lanes before S: (g*W).sum(-1).sum(1)
  v5_loop      unrolled accumulation over S: sum_s g[:,s]*W[:,s]
               (each term fuses; no (m,S,K,128) intermediate survives)

Every variant returns jnp.sum(full_output) so XLA cannot DCE any rows.

Run: python tools/fwd_contract_probe.py [--dim 3] [--n 128] [--K 2]
"""
import argparse
import sys
import time

import numpy as np

import os

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from tile_stage_probe import build_plan, diff_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--K", type=int, default=2)
    ap.add_argument("--kinds", type=str,
                    default="v0,v1,v2,v3,v4,v5")
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

    groups = (list(zip(plan.fgroups.tids, plan.fgroups.wfacs))
              if plan.fgroups is not None else [(plan.tid, plan.wfac)])
    ginv = plan.fgroups.ginv if plan.fgroups is not None else None
    print(f"dim={args.dim} n={args.n} groups="
          f"{[(t.shape[0], t.shape[1]) for t, _ in groups]} ginv="
          f"{'folded' if ginv is None else 'gather'}")

    def contract(kind, g, W, m, Sg):
        # g (m, Sg, K, 128) f32, W (m, Sg, 128)
        if kind == "v0":
            r = jnp.sum(g * W[:, :, None, :], axis=1)
            return jnp.sum(r, axis=-1)
        if kind == "v1":
            g2 = g.reshape(m, Sg, K * 128)
            W2 = jnp.tile(W[:, :, None, :], (1, 1, K, 1)
                          ).reshape(m, Sg, K * 128)
            r = jnp.sum(g2 * W2, axis=1).reshape(m, K, 128)
            return jnp.sum(r, axis=-1)
        if kind == "v2":
            return jnp.einsum("mskl,msl->mk", g, W)
        if kind == "v3":
            lhs = g.transpose(0, 2, 1, 3).reshape(m, K, Sg * 128)
            rhs = W.reshape(m, Sg * 128)
            return lax.dot_general(lhs, rhs, (((2,), (1,)), ((0,), (0,))))
        if kind == "v4":
            h = jnp.sum(g * W[:, :, None, :], axis=-1)   # (m, Sg, K)
            return jnp.sum(h, axis=1)
        if kind == "v5":
            acc = g[:, 0] * W[:, 0, None, :]
            for s in range(1, Sg):
                acc = acc + g[:, s] * W[:, s, None, :]
            return jnp.sum(acc, axis=-1)
        if kind == "v6":
            return jnp.einsum("mskl,msl->mk", g, W,
                              precision=lax.Precision.HIGHEST)
        if kind == "v7":
            lhs = g.transpose(0, 2, 1, 3).reshape(m, K, Sg * 128)
            rhs = W.reshape(m, Sg * 128)
            return lax.dot_general(lhs, rhs, (((2,), (1,)), ((0,), (0,))),
                                   precision=lax.Precision.HIGHEST)
        raise ValueError(kind)

    def variant(kind):
        def core(plan, x):
            xt = ti.tile_grid(plan, x)
            outs = []
            for tid, wfac in groups:
                m, Sg = tid.shape
                g = xt[tid.reshape(-1)].reshape(m, Sg, K, 128)
                sub = ti.TileInterpPlan(tid, wfac, plan.grid_shape,
                                        plan.tile, plan.ext, plan.nt,
                                        plan.pad_lo, plan.width)
                W = ti._lane_weights(sub, wfac)
                outs.append(contract(kind, g, W, m, Sg))
            out = jnp.concatenate(outs, axis=0)
            if ginv is not None:
                out = out[ginv]
            return jnp.sum(out) * 1e-30

        def make(k):
            @jax.jit
            def f(p, v):
                def step(s, _):
                    return core(p, v * (1 + 1e-37 * s)) + s * 0, None
                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        return make

    for kind in args.kinds.split(","):
        try:
            t = diff_time(variant(kind), (plan_d, x0))
            print(f"  {kind:12s} {t * 1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  {kind:12s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
