"""Per-kernel timing for ops/dft_pallas.py on the real TPU.

Usage: python tools/kern_micro.py A|B|C
Scalar-carry scan defeats CSE; iteration differencing cancels fetch cost.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import indigo_tpu.ops.dft_pallas as dp
from indigo_tpu.ops.dft_fft import dft_pad2x_mats


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "A"
    rng = np.random.default_rng(0)
    n = 128
    Mf, Mi = dft_pad2x_mats(n)
    m1 = dp._cmat(Mf.T)
    m2 = dp._cmat(Mf)
    w1 = dp._cmat(Mi)
    w3 = dp._cmat(Mi.T)
    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    xt = 8
    V = 8 * n ** 3 * 8

    if which == "A":
        shape_in = (8, n, n, n)
        Vio = 5

        def fn(ur, ui):
            return pl.pallas_call(
                dp._kernel_A, grid=(8, n // xt),
                in_specs=[pl.BlockSpec((1, xt, n, n),
                                       lambda b, t: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [full(m1[0]), full(m1[1]), full(m2[0]), full(m2[1])],
                out_specs=[pl.BlockSpec((1, 2 * n, xt, 2 * n),
                                        lambda b, t: (b, 0, t, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((8, 2 * n, n, 2 * n),
                                                jnp.float32)] * 2,
                compiler_params=cp)(ur, ui, *m1, *m2)
    elif which == "B":
        shape_in = (8, 2 * n, n, 2 * n)
        Vio = 8
        Tfp = jax.device_put(jnp.asarray(
            rng.standard_normal((2 * n,) * 3, dtype=np.float32)))
        m3 = dp._cmat(Mf.T)

        def fn(ur, ui):
            return pl.pallas_call(
                dp._kernel_B, grid=(2 * n // xt, 8),
                in_specs=[pl.BlockSpec((1, xt, n, 2 * n),
                                       lambda t, b: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec((xt, 2 * n, 2 * n),
                                lambda t, b: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   full(m3[0]), full(m3[1]), full(w1[0]), full(w1[1])],
                out_specs=[pl.BlockSpec((1, n, xt, 2 * n),
                                        lambda t, b: (b, 0, t, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((8, n, 2 * n, 2 * n),
                                                jnp.float32)] * 2,
                compiler_params=cp)(ur, ui, Tfp, *m3, *w1)
    else:
        shape_in = (8, n, 2 * n, 2 * n)
        Vio = 5
        w2 = dp._cmat(Mi)

        def fn(ur, ui):
            return pl.pallas_call(
                dp._kernel_C, grid=(8, n // xt),
                in_specs=[pl.BlockSpec((1, xt, 2 * n, 2 * n),
                                       lambda b, t: (b, t, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2
                + [full(w2[0]), full(w2[1]), full(w3[0]), full(w3[1])],
                out_specs=[pl.BlockSpec((1, xt, n, n),
                                        lambda b, t: (b, t, 0, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((8, n, n, n),
                                                jnp.float32)] * 2,
                compiler_params=cp)(ur, ui, *w2, *w3)

    u0 = jax.device_put(jnp.asarray(
        rng.standard_normal(shape_in, dtype=np.float32)))
    u1 = jax.device_put(jnp.asarray(
        rng.standard_normal(shape_in, dtype=np.float32)))

    def make(k):
        def step(s, _):
            o1, o2 = fn(u0 * s, u1)
            return 1.0 + 1e-30 * o1[0, 0, 0, 0] + 1e-30 * o2[0, 0, 0, 0], None

        @jax.jit
        def g():
            s, _ = lax.scan(step, jnp.float32(1.0), None, length=k)
            return s
        return g

    def run(f):
        t0 = time.time()
        np.asarray(f())
        return time.time() - t0

    f1, f2 = make(2), make(4)
    run(f1)
    run(f2)
    a = min(run(f1) for _ in range(3))
    b = min(run(f2) for _ in range(3))
    sec = max((b - a) / 2, 1e-9)
    print("kernel %s: %.2f ms (%.0f GB/s at %dVio)"
          % (which, sec * 1e3, Vio * V / sec / 1e9, Vio))


if __name__ == "__main__":
    main()
