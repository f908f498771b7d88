"""Stage-timing for the SenseRecon rhs build (A^H W y) at serving scale.

Usage: python tools/rhs_profile.py [n] [nc]   (defaults 256 8)

Decomposes the gridded SENSE adjoint chain at the bench acquisition
(16n spokes x n readout, oversamp 1.25) and times each stage separately
with iteration differencing (scalar-carry scan defeats CSE; the tunnel's
fetch cost cancels). Also probes the batched inverse FFT with the coil
axis leading vs trailing — (vol..., K) puts K on the 128-lane minor dim
(16x padding at K=8), which is the layout the column-batched operator
algebra hands to jnp.fft.
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

from bench import kooshball_traj, build_problem  # noqa: E402
from indigo_tpu import cplx  # noqa: E402
from indigo_tpu.models.sense import sense_nufft_op  # noqa: E402


def _measure(fn, args, label, k1=1, k2=3):
    """fn(s, *args) -> scalar; iterate k times via scan."""

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
    t0 = time.time()
    traj, img_shape, maps, _ = build_problem(n=n, nspokes=16 * n, nread=n)
    maps = maps[:nc]   # build_problem always makes 8 coils
    A, plan = sense_nufft_op(traj, maps, oversamp=1.25, width=4)
    print(f"built A in {time.time()-t0:.1f}s grid={plan.grid_shape} "
          f"M={plan.n_samples} nc={nc}", flush=True)

    # tree structure: A = KronI(nc, core) * coils;  core = G * Fc * Z
    kron, coils = A.children()
    core = kron.child
    G = core
    facs = []
    while hasattr(G, "children") and type(G).__name__ == "Product":
        l, r = G.children()
        facs.append(r)
        G = l
    # G is now the interp leaf; facs reversed = [Z, ..., Fc parts]
    print("leaf:", type(G).__name__,
          "| factors:", [type(f).__name__ for f in facs], flush=True)

    Gd = cplx.device_put_tree(G)
    cored = cplx.device_put_tree(core)
    Ad = cplx.device_put_tree(A)
    cd = cplx.device_put_tree(coils)

    M = plan.n_samples
    gs = plan.grid_shape
    Ng = int(np.prod(gs))
    Ni = int(np.prod(img_shape))
    rng = np.random.default_rng(0)

    def c64(shape):
        a = (rng.standard_normal(shape, dtype=np.float32)
             + 1j * rng.standard_normal(shape, dtype=np.float32))
        return a.astype(np.complex64)

    y = c64((M, nc))       # samples, coils folded into columns
    g = c64((Ng, nc))      # oversampled grid, column-batched
    im = c64((Ni, nc))     # cropped image, per coil
    ys = c64((nc * M, 1))  # full stacked input

    # payloads go up once through the split-complex boundary
    put = lambda a: cplx.device_put_tree(a)
    y_d, g_d, im_d, ys_d = put(y), put(g), put(im), put(ys)

    @cplx.cjit
    def full(A, s, ys):
        r = A.apply(ys + s * (1 + 0j), adjoint=True)
        return jnp.real(r)[0, 0]

    @cplx.cjit
    def interp_adj(G, s, y):
        r = G.apply(y + s * (1 + 0j), adjoint=True)
        return jnp.real(r)[0, 0]

    @cplx.cjit
    def core_adj(core, s, y):
        r = core.apply(y + s * (1 + 0j), adjoint=True)
        return jnp.real(r)[0, 0]

    @cplx.cjit
    def coils_adj(C, s, im):
        r = C.apply(im.reshape(-1, 1) + s * (1 + 0j), adjoint=True)
        return jnp.real(r)[0, 0]

    # raw batched inverse FFT, K trailing (the algebra's column layout)
    @cplx.cjit
    def fft_ktrail(s, g):
        v = (g + s * (1 + 0j)).reshape(gs + (nc,))
        r = jnp.fft.ifftn(v, axes=tuple(range(len(gs))))
        return jnp.real(r)[(0,) * (len(gs) + 1)]

    # raw batched inverse FFT, K leading (coil-major volumes)
    @cplx.cjit
    def fft_klead(s, g):
        v = (g + s * (1 + 0j)).reshape(gs + (nc,))
        v = jnp.moveaxis(v, -1, 0)
        r = jnp.fft.ifftn(v, axes=tuple(range(1, len(gs) + 1)))
        return jnp.real(r)[(0,) * (len(gs) + 1)]

    # operator trees ride through _measure's args (jit ARGUMENTS): closed
    # over they would become traced constants (~0.5 GB of plan arrays at
    # 256^3), which hangs this sandbox's remote compile service — the same
    # footgun models/recon.py documents for the serving pipeline
    def safe(fn, args, label):
        # a stage that OOMs (e.g. the bad-layout coil probe at 256^3 pads
        # (N, 1) columns 128-wide) should not kill the remaining stages
        try:
            _measure(fn, args, label)
        except Exception as e:
            print(f"{label}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)

    safe(lambda s, G, y: interp_adj(G, s, y), (Gd, y_d),
         "G^H (tile adj)")
    if "--fft" in sys.argv:   # raw XLA FFT comparison lanes
        safe(fft_ktrail, (g_d,), "ifftn K-trailing")
        safe(fft_klead, (g_d,), "ifftn K-leading")
    safe(lambda s, C, im: coils_adj(C, s, im), (cd, im_d), "coils^H")
    safe(lambda s, c, y: core_adj(c, s, y), (cored, y_d),
         "core^H (G . PadDFT)")
    safe(lambda s, A, ys: full(A, s, ys), (Ad, ys_d), "full A^H")


if __name__ == "__main__":
    main()
