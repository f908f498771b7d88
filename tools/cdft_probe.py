"""Probe the fused CenteredDFT leaf on TPU: exactness vs the Fc.Z chain at
a small shape, then serving-scale adjoint timing (256^3 -> 320^3, K coils).

Usage: python tools/cdft_probe.py [n] [nc]   (defaults 256 8)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from indigo_tpu import cplx, CenteredDFT, CropPad
from indigo_tpu.models.sense import centered_fft_op
from indigo_tpu.utils import rand64c, rel_err


def measure(fn, args, label, k1=1, k2=3):
    def build(k):
        @jax.jit
        def g(*a):
            def step(s, _):
                return fn(s, *a), None

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
    print(f"{label}: {ms:.1f} ms", flush=True)
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)

    # exactness on TPU at a small 3D shape
    img, grid = (12, 10, 8), (16, 12, 10)
    fused = CenteredDFT(img, grid)
    chain = centered_fft_op(grid) * CropPad(img, grid)
    x = rand64c(int(np.prod(img)), 3, rng=rng)
    y = rand64c(int(np.prod(grid)), 3, rng=rng)
    ef = rel_err(np.asarray(fused * x), np.asarray(chain * x))
    ea = rel_err(np.asarray(fused.H * y), np.asarray(chain.H * y))
    print(f"exactness vs chain on TPU: fwd {ef:.2e} adj {ea:.2e}",
          flush=True)
    assert ef < 2e-5 and ea < 2e-5

    # serving-scale timing
    img = (n, n, n)
    grid = tuple(int(2 * round(s * 1.25 / 2)) for s in img)
    Ng, Ni = int(np.prod(grid)), int(np.prod(img))
    op = cplx.device_put_tree(CenteredDFT(img, grid))
    gr = jax.device_put(jnp.asarray(
        rng.standard_normal((Ng, nc), dtype=np.float32)))
    gi = jax.device_put(jnp.asarray(
        rng.standard_normal((Ng, nc), dtype=np.float32)))
    xr = jax.device_put(jnp.asarray(
        rng.standard_normal((Ni, nc), dtype=np.float32)))
    xi = jax.device_put(jnp.asarray(
        rng.standard_normal((Ni, nc), dtype=np.float32)))
    print(f"img={img} grid={grid} K={nc}", flush=True)

    @cplx.cjit
    def adj(op, s, ar, ai):
        r = op.apply(lax.complex(ar + s, ai), adjoint=True)
        return jnp.real(r)[0, 0]

    @cplx.cjit
    def fwd(op, s, ar, ai):
        r = op.apply(lax.complex(ar + s, ai), adjoint=False)
        return jnp.real(r)[0, 0]

    measure(lambda s, ar, ai: adj(op, s, ar, ai), (gr, gi),
            f"CenteredDFT^H {grid}->{img} K={nc}")
    measure(lambda s, ar, ai: fwd(op, s, ar, ai), (xr, xi),
            f"CenteredDFT   {img}->{grid} K={nc}")


if __name__ == "__main__":
    main()
