"""Stage-level profile of the binned tile-gather ADJOINT.

The bench lane reports the tile adjoint only as a raw rate (VERDICT r3
"what's missing" #2: no roofline accounting). This tool builds the bench
geometry, and times, by in-jit iteration-count differencing (the only
reliable method through the axon tunnel — per-call timing includes ~10s of
ms of dispatch):

  * the full tile_interp_apply adjoint,
  * _adjoint_binned alone (tiled-grid output, no halo fold/untile),
  * untile_grid alone,

and prints each against the entry-gather / stream floor terms.

Run on the TPU host:  python tools/adj_profile.py [n] [K]
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
    from indigo_tpu.profiling import (HBM_BYTES_PER_SEC, GATHER_SEC_PER_ROW)

    from bench import kooshball_traj

    traj = kooshball_traj(16 * n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in (n, n, n))
    perm = noncart.sort_trajectory(traj, grid, tile=noncart.DEFAULT_TILES[3])
    plan = ti.plan_tile_interp(traj[perm], grid, width=4, reorder=True)
    M, S = plan.n_samples, plan.S
    NT = int(np.prod(plan.nt))
    bins = plan.bins
    ent_pad = sum(int(i.shape[0] * i.shape[1]) for i in bins.idx)
    ent_live = sum(int((np.asarray(i) != M).sum()) for i in bins.idx)
    nrows = sum(int(i.shape[0]) for i in bins.idx)
    print(f"grid={grid} M={M} S={S} NT={NT} classes="
          f"{[(w, int(i.shape[0])) for w, i in zip(bins.widths, bins.idx)]}")
    print(f"entries: live={ent_live} padded={ent_pad} "
          f"(x{ent_pad/ent_live:.2f}) rows={nrows}")

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    plan_d = jax.device_put(plan)

    # floor terms
    Pw0 = int(K + sum(w.shape[1] * w.shape[2] for w in plan.wfac))
    Pw = Pw0 if Pw0 <= 24 or Pw0 % 64 == 0 else -(-Pw0 // 64) * 64
    t_gather = ent_pad * GATHER_SEC_PER_ROW
    by_gather = ent_pad * Pw * 4
    by_out = NT * K * 128 * 4
    nclass = len(bins.widths)
    t_stream1 = (by_gather + 2 * by_out) / HBM_BYTES_PER_SEC
    print(f"floors: entry-gather {t_gather*1e3:.1f} ms | stream(1-pass out) "
          f"{t_stream1*1e3:.1f} ms | {nclass}x out scatter passes alone "
          f"{2*by_out*nclass/HBM_BYTES_PER_SEC*1e3:.1f} ms | "
          f"untile stream {2*by_out/HBM_BYTES_PER_SEC*1e3:.1f} ms")

    def make_full(k):
        @jax.jit
        def f(p, v):
            def step(s, _):
                out = ti.tile_interp_apply(p, v * (1 + 1e-37 * s),
                                           adjoint=True)
                return jnp.sum(out[0]) * 1e-30, None
            s, _ = lax.scan(step, jnp.float32(0), None, length=k)
            return s
        return f

    def make_binned(k):
        @jax.jit
        def f(p, v):
            def step(s, _):
                xt = ti._adjoint_binned(p, v * (1 + 1e-37 * s), K, NT)
                return jnp.sum(xt[0]) * 1e-30, None
            s, _ = lax.scan(step, jnp.float32(0), None, length=k)
            return s
        return f

    xt0 = ti._adjoint_binned(plan_d, y, K, NT)

    def make_untile(k):
        @jax.jit
        def f(p, v):
            def step(s, _):
                g = ti.untile_grid(p, v * (1 + 1e-37 * s), K)
                return jnp.sum(g[0]) * 1e-30, None
            s, _ = lax.scan(step, jnp.float32(0), None, length=k)
            return s
        return f

    t_full = diff_time(make_full, (plan_d, y))
    t_bin = diff_time(make_binned, (plan_d, y))
    t_unt = diff_time(make_untile, (plan_d, xt0))
    print(f"full adjoint    {t_full*1e3:8.1f} ms")
    print(f"_adjoint_binned {t_bin*1e3:8.1f} ms "
          f"({100*max(t_gather, t_stream1)/t_bin:.0f}% of its floor)")
    print(f"untile_grid     {t_unt*1e3:8.1f} ms "
          f"(floor {2*by_out/HBM_BYTES_PER_SEC*1e3:.1f} ms)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(n, K)
