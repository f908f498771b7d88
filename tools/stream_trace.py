"""Per-phase timeline of SenseRecon.stream at the serving config.

stream_probe.py proved the axon tunnel DOES overlap D2H fetches with
device execution (~100% when the burn spans the fetch), so the round-4
stream gap (5.91 s/acq vs egress 4.04 + warm 2.46) is NOT the link
serializing. This traces the actual pipeline: for each acquisition it
times the host sort, the solve dispatch (encode + H2D + RPCs), the two
plane fetches, and the host complex combine, against the same-run
egress-alone and warm-solve numbers.

Run:  python tools/stream_trace.py [--n 256] [--nc 8] [--iters 10]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--nc", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--acqs", type=int, default=3)
    args = ap.parse_args()
    n, nc = args.n, args.nc

    from bench import build_problem
    from indigo_tpu.models import SenseRecon
    from indigo_tpu import cplx

    traj, img_shape, maps, _ = build_problem(n=n, nspokes=16 * n, nread=n)
    maps = maps[:nc]
    rng = np.random.default_rng(5)
    M = len(traj)
    t0 = time.time()
    recon = SenseRecon(traj, maps, iters=args.iters,
                       coil_chunk=4 if n >= 256 else None)
    print(f"init {time.time() - t0:.1f}s", flush=True)
    ys = [(rng.standard_normal((nc * M,), dtype=np.float32)
           + 1j * rng.standard_normal((nc * M,), dtype=np.float32)
           ).astype(np.complex64) for _ in range(args.acqs)]

    def dev_solve(y):
        import jax
        x = recon(y, output="device")
        jax.block_until_ready((x.re, x.im))
        # axon: block_until_ready is a no-op; force a 1-elem fetch
        float(np.asarray(x.re.ravel()[:1])[0])
        float(np.asarray(x.im.ravel()[:1])[0])
        return x

    t0 = time.time(); x0 = dev_solve(ys[0]); t_first = time.time() - t0
    t0 = time.time(); x0 = dev_solve(ys[0]); t_warm = time.time() - t0
    t0 = time.time()
    np.asarray(x0.re); t_re = time.time() - t0
    t0 = time.time()
    np.asarray(x0.im); t_im = time.time() - t0
    t0 = time.time()
    _ = (np.asarray(x0.re).astype(np.complex64)
         + 1j * np.asarray(x0.im))
    t_comb_cached = time.time() - t0
    print(f"first {t_first:.2f}s warm {t_warm:.2f}s "
          f"egress re {t_re:.2f}s im {t_im:.2f}s "
          f"combine(cached) {t_comb_cached:.2f}s", flush=True)

    # manual stream loop, phase-timed (replicates SenseRecon.stream)
    prev = None
    for i, y in enumerate(ys):
        t0 = time.time()
        y = np.asarray(y).reshape(-1)
        y_sorted = recon.plan.sort_samples(y, ncoil=recon.nc)[:, None]
        y_sorted = y_sorted.astype(np.complex64)
        t_sort = time.time() - t0

        t0 = time.time()
        (xr, xi), resids, k = recon._solve(
            recon._Tf, recon._maps, recon._wd, y_sorted)
        x = cplx.CPair(xr.reshape(recon.img_shape),
                       xi.reshape(recon.img_shape))
        t_disp = time.time() - t0

        tf1 = tf2 = tc = 0.0
        if prev is not None:
            t0 = time.time(); re = np.asarray(prev.re); tf1 = time.time() - t0
            t0 = time.time(); im = np.asarray(prev.im); tf2 = time.time() - t0
            t0 = time.time()
            _ = re.astype(np.complex64) + 1j * im
            tc = time.time() - t0
        print(f"acq {i}: sort {t_sort:.2f}s dispatch {t_disp:.2f}s "
              f"fetch.re {tf1:.2f}s fetch.im {tf2:.2f}s combine {tc:.2f}s "
              f"| loop total {t_sort + t_disp + tf1 + tf2 + tc:.2f}s",
              flush=True)
        prev = x
    t0 = time.time()
    re = np.asarray(prev.re); im = np.asarray(prev.im)
    _ = re.astype(np.complex64) + 1j * im
    print(f"tail fetch+combine {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
