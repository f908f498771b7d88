"""Does a device->host fetch overlap device execution on this link?

The round-4 serving stream measured 5.91 s/acq against a warm solve of
2.46 s and an egress of 4.04 s (BENCH_r04.json): perfect overlap would
give ~max(solve, egress) ~= 4.0-4.3 s, fully serial ~6.5 s. A mid-round
run of the same lane got 13.95 s/acq at egress 7.7 s — worse than
serial. This probe isolates the question from the recon pipeline:
dispatch a long-running compiled computation, then fetch LARGE device
buffers that already exist (materialized + synced BEFORE dispatch, so
the fetch enqueues no device work), and compare

    t(concurrent)  vs  max(t_exec, t_fetch)  vs  t_exec + t_fetch.

Pitfalls this version avoids (all axon-tunnel specific):
  * jax.Array caches its host copy after the first np.asarray — every
    trial fetches FRESH arrays (outputs of a trivial jitted op).
  * slicing a device array (buf[i]) IS device work and would queue
    behind the burn — payloads are pre-split before dispatch.
  * block_until_ready does NOT synchronize on this backend — sync is a
    forced 1-element fetch of data dependent on the computation
    (BASELINE.md measurement caveats).

Run:  python tools/stream_probe.py [--mb 128] [--secs 3.0]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def build_burn(target_secs):
    """A compiled fn of ~target_secs of pure device compute, no I/O.
    Returns (dispatch, sync, measured_span): dispatch() enqueues and
    returns the lazy result; sync(y) forces a 1-element fetch."""
    m = 2048

    @partial(jax.jit, static_argnames="k")
    def burn(x, k):
        def body(_, a):
            a = a @ a
            return a / jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
        return jax.lax.fori_loop(0, k, body, x)[:1, :1]

    def sync(y):
        return float(np.asarray(y)[0, 0])

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((m, m), dtype=np.float32))
    k, span = 64, 0.0
    for _ in range(4):     # iterate: per-call RPC overhead (~70 ms)
        sync(burn(x, k))   # would otherwise inflate the per-iter rate
        t0 = time.time()
        sync(burn(x, k))
        span = time.time() - t0
        if span >= 0.8 * target_secs:
            break
        k = max(int(k * target_secs / max(span, 1e-9)), k + 1)
    return (lambda: burn(x, k)), sync, span


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=128.0)
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    nrow = int(args.mb * 1e6 / 4) // 1024
    rows = nrow // args.chunks
    mk = jax.jit(lambda s: jnp.full((rows, 1024), s, jnp.float32))
    salt = [0.0]

    def fresh_payload():
        """chunks fresh device arrays, host-copy caches empty, synced."""
        parts = []
        for _ in range(args.chunks):
            salt[0] += 1.0
            parts.append(mk(salt[0]))
        for p in parts:                      # force materialization
            float(np.asarray(p[:1, :1])[0, 0])
        return parts

    def fetch_all(parts):
        t0 = time.time()
        for p in parts:
            np.asarray(p)
        return time.time() - t0

    burn, sync, ex = build_burn(args.secs)
    print(f"exec alone       : {ex:6.2f} s", flush=True)

    fes = [fetch_all(fresh_payload()) for _ in range(2)]
    fe = min(fes)
    print(f"fetch alone      : {fe:6.2f} s  ({args.mb:.0f} MB, "
          f"{args.mb / fe:.1f} MB/s, {args.chunks} parts)", flush=True)

    ideal, serial = max(fe, ex), fe + ex
    for trial in range(3):
        parts = fresh_payload()
        t0 = time.time()
        y = burn()                  # async dispatch
        tf = fetch_all(parts)       # D2H while (?) the burn runs
        sync(y)
        conc = time.time() - t0
        ov = (serial - conc) / max(serial - ideal, 1e-9)
        print(f"concurrent trial {trial}: total {conc:6.2f} s, "
              f"fetch-part {tf:6.2f} s   (ideal {ideal:.2f}, "
              f"serial {serial:.2f}, overlap achieved {100 * ov:.0f}%)",
              flush=True)


if __name__ == "__main__":
    main()
