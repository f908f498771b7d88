"""Per-kernel timing for ops/dft_pallas.py on the real TPU.

Usage: python tools/kern_micro.py [A|B|C|all] [n] [B]
(defaults: all 128 8). Scalar-carry scan defeats CSE; iteration
differencing cancels the tunnel's fetch cost (block_until_ready does not
synchronize in this sandbox). Uses the repo's persistent compile cache.
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

import indigo_tpu.ops.dft_pallas as dp


def _measure(make_step, args, label, k1=2, k2=10):
    def build(k):
        @jax.jit
        def g(*a):
            def step(s, _):
                return make_step(s, *a), None

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
    print(f"{label}: {ms:.2f} ms")
    return ms


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "all").upper()
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    xt = dp._TILE
    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    st1 = dp._get_stage(n, "fwd_T")
    st2 = dp._get_stage(n, "fwd_M")
    st3 = dp._get_stage(n, "fwd_T")
    st4 = dp._get_stage(n, "inv_M")
    st5 = dp._get_stage(n, "inv_M")
    st6 = dp._get_stage(n, "inv_T")

    def f32(shape, scale=1.0):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale)

    if which in ("A", "ALL"):
        pA = st1.packs + st2.packs
        out = [jax.ShapeDtypeStruct((B, 2 * n, n, 2 * n), jnp.float32)] * 2

        def kA(ur, ui):
            return pl.pallas_call(
                dp._make_kernel_A(st1, st2), grid=(B, n // xt),
                in_specs=[pl.BlockSpec((1, xt, n, n),
                                       lambda b, t: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [full(p) for p in pA],
                out_specs=[pl.BlockSpec((1, 2 * n, xt, 2 * n),
                                        lambda b, t: (b, 0, t, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=out, compiler_params=cp)(ur, ui, *pA)

        ur, ui = f32((B, n, n, n)), f32((B, n, n, n))
        _measure(lambda s, a, b: kA(a + s, b)[0][0, 0, 0, 0], (ur, ui),
                 f"kernel A (n={n}, B={B})")

    if which in ("B", "ALL"):
        pB = st3.packs + st4.packs
        Tfp = f32((2 * n, 2 * n, 2 * n))
        out = [jax.ShapeDtypeStruct((B, n, 2 * n, 2 * n), jnp.float32)] * 2

        def kB(ar, ai, T):
            return pl.pallas_call(
                dp._make_kernel_B(st3, st4), grid=(2 * n // xt, B),
                in_specs=[pl.BlockSpec((1, xt, n, 2 * n),
                                       lambda t, b: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec((xt, 2 * n, 2 * n), lambda t, b: (t, 0, 0),
                                memory_space=pltpu.VMEM)]
                + [full(p) for p in pB],
                out_specs=[pl.BlockSpec((1, n, xt, 2 * n),
                                        lambda t, b: (b, 0, t, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=out, compiler_params=cp)(ar, ai, T, *pB)

        ar, ai = f32((B, 2 * n, n, 2 * n), 0.01), f32((B, 2 * n, n, 2 * n),
                                                      0.01)
        _measure(lambda s, a, b, T: kB(a + s, b, T)[0][0, 0, 0, 0],
                 (ar, ai, Tfp), f"kernel B (n={n}, B={B})")

    if which in ("C", "ALL"):
        pC = st5.packs + st6.packs
        out = [jax.ShapeDtypeStruct((B, n, n, n), jnp.float32)] * 2

        def kC(br, bi):
            return pl.pallas_call(
                dp._make_kernel_C(st5, st6), grid=(B, n // xt),
                in_specs=[pl.BlockSpec((1, xt, 2 * n, 2 * n),
                                       lambda b, t: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [full(p) for p in pC],
                out_specs=[pl.BlockSpec((1, xt, n, n),
                                        lambda b, t: (b, t, 0, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=out, compiler_params=cp)(br, bi, *pC)

        br, bi = f32((B, n, 2 * n, 2 * n), 0.01), f32((B, n, 2 * n, 2 * n),
                                                      0.01)
        _measure(lambda s, a, b: kC(a + s, b)[0][0, 0, 0, 0], (br, bi),
                 f"kernel C (n={n}, B={B})")


if __name__ == "__main__":
    main()
