"""Stage-level profile of ONE 2D gridded CG iteration.

The bench lane `gridded_cg_iters_per_sec_2d_radial_128c8` sat at 16% of its
apply-traffic roofline in round 3 with no evidence of WHERE the time goes
(VERDICT r3 "what's missing" #3). This tool builds the exact bench problem
(bench.run_gridded_2d geometry) and times, by iteration differencing:

  * each pipeline stage of the A^H A apply as forward+adjoint pairs
    (coil diagonals, CenteredDFT, grid-tiling Perm, gridding SpMM),
  * the assembled A^H A apply,
  * one full CG iteration (solvers.cg k-iteration differencing),

and prints each against its own cost-model floor (operator.cost / HBM BW).

Run on the TPU host:  python tools/gridded_profile.py [n] [nc]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n=128, nc=8):
    import jax
    import jax.numpy as jnp
    from indigo_tpu import cplx, solvers
    from indigo_tpu.models import sense_nufft_op
    from indigo_tpu.operators import (KronI, Product, VStack, SpMatrix,
                                      CenteredDFT, Perm, KBInterp)
    from indigo_tpu.profiling import time_apply, HBM_BYTES_PER_SEC

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
    print(A.dump())
    AHA = A.H * A
    AHA_d = cplx.device_put_tree(AHA)
    A_d = cplx.device_put_tree(A)

    # --- pull the stages out of the tree: A = KronI(nc, core) * coils ----
    kron = A.children()[0]
    coils = A.children()[1]
    assert isinstance(kron, KronI)
    core = kron.child           # G [* Perm] * CenteredDFT
    stages = []

    def flatten(node):
        if isinstance(node, Product):
            flatten(node.left)
            flatten(node.right)
        else:
            stages.append(node)

    flatten(core)
    print("\ncore stages:", [s.name for s in stages])

    # --- time each stage as fwd+adj pairs at the KronI-folded width ------
    K = nc  # KronI folds coils into the column batch
    rows = []

    def bench_stage(op, ncols, label):
        op_d = cplx.device_put_tree(op)
        t = time_apply(op_d, ncols=ncols, k1=2, k2=10)  # per HALF-pair
        flops, bytes_ = op.cost(ncols)
        sol = bytes_ / HBM_BYTES_PER_SEC
        rows.append((label, 2 * t, 2 * sol))
        print(f"  {label:<28} pair {2*t*1e3:8.3f} ms   "
              f"floor {2*sol*1e3:8.3f} ms   ({100*sol/max(t,1e-12):5.1f}%)")

    print(f"\nper-stage fwd+adj pair times (K={K} columns):")
    for s in stages:
        bench_stage(s, K, f"{s.name} ({type(s).__name__})")
    bench_stage(coils, 1, "Coils (VStack diag)")

    # --- assembled normal apply + CG iteration ---------------------------
    t_aha = time_apply(AHA_d, ncols=1, k1=2, k2=10, adjoint_pair=False)
    _, bytes_aha = AHA.cost(1)
    print(f"\nA^H A apply:        {t_aha*1e3:8.3f} ms   "
          f"(cost-model floor {bytes_aha/HBM_BYTES_PER_SEC*1e3:.3f} ms)")
    print(f"sum of stage pairs: {sum(r[1] for r in rows)*1e3:8.3f} ms")

    rhs = (rng.standard_normal((n * n, 1), dtype=np.float32)
           + 1j * rng.standard_normal((n * n, 1), dtype=np.float32)
           ).astype(np.complex64)
    rhs_d = jax.device_put(cplx.pack(rhs))

    def make(k):
        @cplx.cjit
        def f(Aop, b):
            x, _ = solvers.cg(Aop, b, lamda=1e-1, tol=0.0, maxiter=k,
                              history=True)
            return jnp.linalg.norm(jnp.real(x))
        return f

    f1, f2 = make(5), make(25)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(AHA_d, rhs_d))
        return time.perf_counter() - t0

    run(f1)
    run(f2)
    ds = [run(f2) - run(f1) for _ in range(5)]
    per_iter = float(np.median(ds)) / 20
    print(f"CG iteration:       {per_iter*1e3:8.3f} ms "
          f"({1/per_iter:.1f} iters/s)")
    print(f"  vs A^H A apply    {t_aha*1e3:8.3f} ms "
          f"(CG overhead {100*(per_iter-t_aha)/per_iter:.0f}%)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(n, nc)
