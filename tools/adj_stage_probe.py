"""Stage attribution INSIDE _adjoint_binned at bench geometry.

Times cumulative variants of the binned-adjoint pipeline (packed-table
gather -> weight expansion -> per-class matmul -> merged sorted scatter)
by in-jit iteration differencing, to locate the gap between the measured
kernel and its entry-gather floor.

Run: python tools/adj_stage_probe.py [n] [K]
"""
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


def main(n=128, K=16):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from indigo_tpu import noncart
    from indigo_tpu.ops import tile_interp as ti
    from bench import kooshball_traj

    traj = kooshball_traj(16 * n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in (n, n, n))
    perm = noncart.sort_trajectory(traj, grid, tile=noncart.DEFAULT_TILES[3])
    plan = ti.plan_tile_interp(traj[perm], grid, width=4, reorder=True)
    M = plan.n_samples
    NT = int(np.prod(plan.nt))
    nd = len(plan.tile)
    T = plan.tile
    nsup = [w.shape[1] for w in plan.wfac]
    bins = plan.bins
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
            out = rows_buf[bins.gidx]
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

    # bf16 variant: expansion+matmul in bf16 to probe the precision cost
    for stage in ["gather", "expand", "matmul", "full"]:
        t = diff_time(variant(stage), (plan_d, y0))
        print(f"{stage:8s} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(n, K)
