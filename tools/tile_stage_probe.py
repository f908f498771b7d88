"""Stage attribution inside the tile-gather FORWARD (and 2D adjoint).

Round-4 verdict items 2-3: the 3D tile forward runs at 56% of its
row-gather floor and the 2D gridded lane's tile leaf at ~2.2x its gather
floor, with no per-stage numbers anywhere. This tool times CUMULATIVE
variants of the pipelines by in-jit iteration differencing (the same
method as adj_stage_probe.py), so successive differences attribute the
gap stage by stage:

  fwd:  tile   (tile_grid pad+retile transpose)
        gather (+ xt[tid] super-tile row gathers, per span group)
        weights(+ per-axis KB factor lane expansion)
        reduce (+ the multiply + S/lane reductions)
        full   (+ group concat + ginv reorder)

  adj:  gather (packed-table row gather per bin entry)
        expand (+ slot selects + lane expansion)
        matmul (+ per-class dot_general)
        full   (+ commit gather + untile transpose)

Geometry matches the bench lanes: --dim 3 = run_tile_3d (kooshball,
oversamp 1.25), --dim 2 = run_gridded_2d (radial, oversamp 1.5).

Run: python tools/tile_stage_probe.py [--dim 3] [--n 128] [--K 2]
     [--dir fwd|adj|both]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def diff_time(make, args, k1=2, k2=6, reps=3):
    f1, f2 = make(k1), make(k2)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    run(f1)
    run(f2)
    ds = [run(f2) - run(f1) for _ in range(reps)]
    return float(np.median(ds)) / (k2 - k1)


def build_plan(dim, n):
    from indigo_tpu import noncart
    from indigo_tpu.ops import tile_interp as ti

    if dim == 3:
        from bench import kooshball_traj
        traj = kooshball_traj(16 * n, n)
        oversamp = 1.25
    else:
        nspokes = int(1.5 * n)
        ang = np.pi * np.arange(nspokes) / nspokes
        r = (np.arange(2 * n) - n) / (2 * n)
        traj = np.stack([np.outer(np.cos(ang), r).ravel(),
                         np.outer(np.sin(ang), r).ravel()], axis=1)
        oversamp = 1.5
    grid = tuple(int(2 * round(s * oversamp / 2)) for s in (n,) * dim)
    perm = noncart.sort_trajectory(traj, grid,
                                   tile=noncart.DEFAULT_TILES[dim])
    plan = ti.plan_tile_interp(traj[perm], grid, width=4, reorder=True)
    return plan, grid


def probe_fwd(plan, grid, K):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu.ops import tile_interp as ti

    N = int(np.prod(grid))
    M = plan.n_samples
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
    plan_d = jax.device_put(plan)
    S = plan.S

    groups = (list(zip(plan.fgroups.tids, plan.fgroups.wfacs))
              if plan.fgroups is not None else [(plan.tid, plan.wfac)])
    ginv = plan.fgroups.ginv if plan.fgroups is not None else None

    def variant(stage):
        def core(plan, x):
            xt = ti.tile_grid(plan, x)
            if stage == "tile":
                return jnp.sum(xt[0]) * 1e-30
            acc = jnp.float32(0)
            outs = []
            for tid, wfac in groups:
                m, Sg = tid.shape
                g = xt[tid.reshape(-1)].reshape(m, Sg, K, 128)
                if stage == "gather":
                    acc += jnp.sum(g[0]) * 1e-30
                    continue
                sub = ti.TileInterpPlan(tid, wfac, plan.grid_shape,
                                        plan.tile, plan.ext, plan.nt,
                                        plan.pad_lo, plan.width)
                W = ti._lane_weights(sub, wfac)           # (m, S, 128)
                if stage == "weights":
                    acc += (jnp.sum(g[0]) + jnp.sum(W[0])) * 1e-30
                    continue
                r = jnp.sum(g * W[:, :, None, :], axis=1)  # (m, K, 128)
                out = jnp.sum(r, axis=-1)                  # (m, K)
                if stage == "reduce":
                    acc += jnp.sum(out[0]) * 1e-30
                    continue
                outs.append(out)
            if stage in ("gather", "weights", "reduce"):
                return acc
            out = jnp.concatenate(outs, axis=0)
            if ginv is not None:
                out = out[ginv]
            return jnp.sum(out[0]) * 1e-30

        def make(k):
            @jax.jit
            def f(p, v):
                def step(s, _):
                    return core(p, v * (1 + 1e-37 * s)) + s * 0, None
                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        return make

    print(f"forward (M={M}, S={S}, K={K}, NT={int(np.prod(plan.nt))}):")
    prev = 0.0
    for stage in ["tile", "gather", "weights", "reduce", "full"]:
        t = diff_time(variant(stage), (plan_d, x0))
        print(f"  {stage:8s} {t * 1e3:8.2f} ms   (+{(t - prev) * 1e3:7.2f})")
        prev = t


def probe_adj(plan, K):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu.ops import tile_interp as ti

    M = plan.n_samples
    nd = len(plan.tile)
    T = plan.tile
    nsup = [w.shape[1] for w in plan.wfac]
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    plan_d = jax.device_put(plan)

    def variant(stage):
        def core(plan, y):
            bins = plan.bins
            segs = [y.astype(jnp.float32)] + [
                w.reshape(w.shape[0], -1) for w in plan.wfac]
            offs = np.concatenate([[K], K + np.cumsum(
                [nn * t for nn, t in zip(nsup, T)])]).astype(int)
            P = jnp.concatenate(segs, axis=1)
            P = jnp.concatenate([P, jnp.zeros((1, P.shape[1]),
                                              jnp.float32)])
            if P.shape[1] > 24 and P.shape[1] % 64:
                P = jnp.pad(P, ((0, 0), (0, 64 - P.shape[1] % 64)))
            acc = jnp.float32(0)
            nred = [i.shape[0] for i in bins.idx]
            if bins.cap_seg is not None:
                nred[-1] = bins.cap_ntiles
            rows_buf = jnp.zeros((sum(nred) + 1, K * 128), jnp.float32)
            base = 0
            for ci, (idx, slot, w) in enumerate(zip(bins.idx, bins.slot,
                                                    bins.widths)):
                idx_c = idx.astype(jnp.int32)
                sl = slot.astype(jnp.int32)
                g = P[idx_c]
                if stage == "gather":
                    acc += jnp.sum(g[0]) * 1e-30
                    continue
                yg = g[..., :K]
                W = None
                div = 1
                for d in range(nd - 1, -1, -1):
                    sd = (sl // div) % nsup[d]
                    div *= nsup[d]
                    seg = g[..., offs[d]:offs[d] + nsup[d] * T[d]]
                    seg = seg.reshape(seg.shape[:2] + (nsup[d], T[d]))
                    wd = seg[:, :, 0, :]
                    for j in range(1, nsup[d]):
                        wd = jnp.where((sd == j)[..., None],
                                       seg[:, :, j, :], wd)
                    wd = ti._expand_lanes(wd, d, T, nd)
                    W = wd if W is None else W * wd
                if stage == "expand":
                    acc += jnp.sum(W[0]) * 1e-30 + jnp.sum(yg[0]) * 1e-30
                    continue
                rows = jax.lax.dot_general(
                    yg, W, (((1,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST)
                rows = rows.reshape(-1, K * 128)
                if stage == "matmul":
                    acc += jnp.sum(rows[0]) * 1e-30
                    continue
                if bins.cap_seg is not None and ci == len(bins.widths) - 1:
                    rows = jax.ops.segment_sum(
                        rows, bins.cap_seg, num_segments=bins.cap_ntiles,
                        indices_are_sorted=True)
                rows_buf = jax.lax.dynamic_update_slice(
                    rows_buf, rows, (base, 0))
                base += nred[ci]
            if stage in ("gather", "expand", "matmul"):
                return acc
            xt = rows_buf[bins.gidx]
            if stage == "commit":
                return jnp.sum(xt[0]) * 1e-30
            out = ti.untile_grid(plan, xt, K)
            return jnp.sum(out[0]) * 1e-30

        def make(k):
            @jax.jit
            def f(p, v):
                def step(s, _):
                    return core(p, v * (1 + 1e-37 * s)) + s * 0, None
                s, _ = lax.scan(step, jnp.float32(0), None, length=k)
                return s
            return f
        return make

    entries = sum(int(i.shape[0]) * w
                  for i, w in zip(plan.bins.idx, plan.bins.widths))
    print(f"adjoint (M={M}, K={K}, padded entries={entries}):")
    prev = 0.0
    for stage in ["gather", "expand", "matmul", "commit", "full"]:
        t = diff_time(variant(stage), (plan_d, y0))
        print(f"  {stage:8s} {t * 1e3:8.2f} ms   (+{(t - prev) * 1e3:7.2f})")
        prev = t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3, choices=(2, 3))
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--K", type=int, default=None,
                    help="folded column count (default: 2 for 3D lane, "
                    "16 for 2D lane = 2*8 coils)")
    ap.add_argument("--dir", default="both", choices=("fwd", "adj", "both"))
    args = ap.parse_args()
    K = args.K if args.K is not None else (2 if args.dim == 3 else 16)

    plan, grid = build_plan(args.dim, args.n)
    print(f"dim={args.dim} n={args.n} grid={grid} tile={plan.tile} "
          f"nt={plan.nt} samples={plan.n_samples}")
    if args.dir in ("fwd", "both"):
        probe_fwd(plan, grid, K)
    if args.dir in ("adj", "both"):
        probe_adj(plan, K)


if __name__ == "__main__":
    main()
