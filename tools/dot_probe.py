"""Probe Mosaic lowering + MXU throughput of dot_general forms in Pallas.

The dft_pallas kernels currently apply each DFT stage row-by-row inside a
fori_loop: every MXU pass is an (M=512, K=128, N=128)-class dot. XLA-level
probes show such small-N dots run far below peak while bigger-M dots do
not. This probe measures, inside real Pallas kernels with iteration
differencing (the tunnel's fetch cost cancels):

  loopT : per-row dot(data(128,512)^T q(128,128)) x 8 rows  [current st3]
  loopM : per-row dot(q(128,128), data(128,512))  x 8 rows  [current st4]
  r3sub : dot_general(data(8,128,512), q, contract dims (1,0)) -> (8,512,128)
  r3lane: dot_general(data(8,512,128), q, contract dims (2,0)) -> (8,512,128)
  r3lhs : dot_general(q, data(8,128,512), contract dims (1,1)) -> (128,8,512)

Each variant does R accumulated dots per grid step over NQ distinct
constants (defeats CSE), grid=G steps. Usage: python tools/dot_probe.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32          # dots per grid step
NQ = 8          # distinct constant matrices
G = 4096        # grid steps (large: tunnel fetch cost is ~tens of ms,
                # so each build must span hundreds of ms to difference)


def _measure(fn, args, label, macs, k1=2, k2=12):
    def build(k):
        @jax.jit
        def g(*a):
            def step(s, _):
                return fn(a[0] + s, *a[1:]), None
            s, _ = lax.scan(step, jnp.bfloat16(0), None, length=k)
            return s
        return g

    f1, f2 = build(k1), build(k2)

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    try:
        run(f1)
    except Exception as e:
        print(f"{label}: LOWERING FAILED: {str(e)[:200]}")
        return
    run(f2)
    t1 = min(run(f1) for _ in range(3))
    t2 = min(run(f2) for _ in range(3))
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{label}: {ms:.2f} ms  -> {macs / (ms * 1e-3) / 1e12:.1f} T MAC/s",
          flush=True)


def probe(name, kernel_body, data_shape, out_shape):
    q = jnp.asarray(np.random.default_rng(0).standard_normal(
        (NQ, 128, 128)).astype(np.float32), jnp.bfloat16)

    def f(d):
        return pl.pallas_call(
            kernel_body,
            grid=(G,),
            in_specs=[pl.BlockSpec(data_shape, lambda i: (0,) * len(data_shape),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(q.shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(d, q)[(0,) * len(out_shape)].astype(jnp.bfloat16)

    d = jnp.asarray(np.random.default_rng(1).standard_normal(
        data_shape).astype(np.float32) * 0.01, jnp.bfloat16)
    # MACs: every variant contracts K=128 producing 8*512*128 outputs per dot
    macs = G * R * 8 * 512 * 128 * 128
    _measure(f, (d,), name, macs)


def main():
    dot = lambda a, b, dn: lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32)

    def k_loopT(dr, qr, o):
        q = qr[...]
        acc = jnp.zeros((512, 128), jnp.float32)
        for j in range(8):
            row = dr[j]                      # (128, 512)
            for i in range(R // 8):
                acc += dot(row, q[(j + i) % NQ],
                           (((0,), (0,)), ((), ())))
        o[0:512, :] = acc

    probe("loopT  (8x per-row (512,128)@(128,128))",
          k_loopT, (8, 128, 512), (512, 128))

    def k_loopM(dr, qr, o):
        q = qr[...]
        acc = jnp.zeros((128, 512), jnp.float32)
        for j in range(8):
            row = dr[j]                      # (128, 512)
            for i in range(R // 8):
                acc += dot(q[(j + i) % NQ], row,
                           (((1,), (0,)), ((), ())))
        o[0:128, :] = acc

    probe("loopM  (8x per-row (128,128)@(128,512))",
          k_loopM, (8, 128, 512), (128, 512))

    def k_r3sub(dr, qr, o):
        d = dr[...]
        q = qr[...]
        acc = jnp.zeros((8, 512, 128), jnp.float32)
        for i in range(R):
            acc += dot(d, q[i % NQ], (((1,), (0,)), ((), ())))
        o[...] = acc

    probe("r3sub  (d(8,128,512) q -> (8,512,128))",
          k_r3sub, (8, 128, 512), (8, 512, 128))

    def k_r3lane(dr, qr, o):
        d = dr[...]
        q = qr[...]
        acc = jnp.zeros((8, 512, 128), jnp.float32)
        for i in range(R):
            acc += dot(d, q[i % NQ], (((2,), (0,)), ((), ())))
        o[...] = acc

    probe("r3lane (d(8,512,128) q -> (8,512,128))",
          k_r3lane, (8, 512, 128), (8, 512, 128))

    def k_r3lhs(dr, qr, o):
        d = dr[...]
        q = qr[...]
        acc = jnp.zeros((128, 8, 512), jnp.float32)
        for i in range(R):
            acc += dot(q[i % NQ], d, (((1,), (1,)), ((), ())))
        o[...] = acc

    probe("r3lhs  (q d(8,128,512) -> (128,8,512))",
          k_r3lhs, (8, 128, 512), (128, 8, 512))


if __name__ == "__main__":
    main()
