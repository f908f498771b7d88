"""Microbenchmark: XLA FFT / elementwise bandwidth on the real TPU.

Timing protocol for this sandbox (see BASELINE.md caveats): payloads are
uploaded once, runs are timed by a forced scalar fetch, and per-op time is
the difference between two scan lengths (cancels fetch/tunnel latency).

Usage: python tools/fft_micro.py [case ...]
Cases: copy fftmin fftmaj fft3 pad2x t128 t256 (default: all)
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cases = sys.argv[1:] or ["copy", "fftmin", "fftmaj", "fft3", "pad2x"]
    rng = np.random.default_rng(0)

    def timed_pair(make, k1=4, k2=8):
        f1, f2 = make(k1), make(k2)
        def run(f):
            t0 = time.time()
            np.asarray(f())
            return time.time() - t0
        run(f1); run(f2)          # compile + warm
        a = min(run(f1) for _ in range(3))
        b = min(run(f2) for _ in range(3))
        return max((b - a) / (k2 - k1), 1e-9)

    def report(name, sec, bytes_ideal):
        gbs = bytes_ideal / sec / 1e9
        print(f"{name:28s} {sec*1e3:8.2f} ms   {gbs:7.1f} GB/s-ideal")

    # shared payload: (8, 128,128,128) complex64 as split planes = 128 MiB
    xr = rng.standard_normal((8, 128, 128, 128), dtype=np.float32)
    xi = rng.standard_normal((8, 128, 128, 128), dtype=np.float32)
    xr_d = jax.device_put(jnp.asarray(xr))
    xi_d = jax.device_put(jnp.asarray(xi))
    V = xr.size * 8  # complex64 bytes of the volume batch

    def scanner(body):
        def make(k):
            def step(c, _):
                out = body(c)
                n = jnp.sqrt(jnp.sum(jnp.real(out * jnp.conj(out))))
                return out / jnp.maximum(n, 1e-30).astype(out.dtype), None

            @jax.jit
            def g(xr, xi):
                v, _ = lax.scan(step, lax.complex(xr, xi), None, length=k)
                return jnp.real(v).sum()

            return lambda: g(xr_d, xi_d)
        return make

    if "copy" in cases:
        sec = timed_pair(scanner(lambda x: x * jnp.float32(2.0)))
        report("elementwise x*2 (128MiB)", sec, 2 * V)

    if "fftmin" in cases:
        sec = timed_pair(scanner(lambda x: jnp.fft.fft(x, axis=-1)))
        report("fft minor axis (128)", sec, 2 * V)

    if "fftmaj" in cases:
        sec = timed_pair(scanner(lambda x: jnp.fft.fft(x, axis=1)))
        report("fft major axis (128)", sec, 2 * V)

    if "fft3" in cases:
        sec = timed_pair(scanner(
            lambda x: jnp.fft.fftn(x, axes=(1, 2, 3))))
        report("fftn 3 minor axes (128^3)", sec, 2 * V)

    if "fft2" in cases:
        sec = timed_pair(scanner(
            lambda x: jnp.fft.fftn(x, axes=(2, 3))))
        report("fftn 2 minor axes", sec, 2 * V)

    if "ifft3" in cases:
        sec = timed_pair(scanner(
            lambda x: jnp.fft.ifftn(x, axes=(1, 2, 3))))
        report("ifftn 3 minor axes", sec, 2 * V)

    if "pad2x" in cases:
        from indigo_tpu.ops.toeplitz_fft import fft_pad2x, ifft_crop2x
        Tf = jax.device_put(jnp.asarray(
            rng.standard_normal((256, 256, 256), dtype=np.float32)))

        def roundtrip(x):
            X = fft_pad2x(x, (1, 2, 3))
            X = Tf[None] * X
            return ifft_crop2x(X, (1, 2, 3))
        sec = timed_pair(scanner(roundtrip), k1=2, k2=4)
        # ideal zero-aware traffic: fwd (1+2)+(2+4)+(4+8), inv mirrored,
        # + Tf read (f32 = V/2 per 8-batch... count 8x f32 vol = 4*V)
        ideal = (21 + 21) * V + 4 * V
        report("toeplitz roundtrip (cur)", sec, ideal)

    if "dftmm" in cases or "dftmm_high" in cases:
        # matmul-DFT block-layout padded round trip: 6 transpose-free dots
        n = 128
        j = np.arange(n)
        F = np.exp(-2j * np.pi * np.outer(np.arange(n), j) / n)
        t = np.exp(-1j * np.pi * j / n)
        Mf = np.concatenate([F, F * t[None, :]], axis=0)  # (2n, n)
        Fi = np.exp(2j * np.pi * np.outer(j, np.arange(n)) / n) / n
        Mi = np.concatenate([0.5 * Fi,
                             0.5 * np.conj(t)[:, None] * Fi], axis=1)  # (n,2n)
        # complex matrices must NOT cross the host<->device boundary eagerly
        # (axon holds no complex buffers); close over numpy = HLO constants.
        Mf_d = Mf.astype(np.complex64)
        Mi_d = Mi.astype(np.complex64)
        perm = np.concatenate([2 * j, 2 * j + 1])
        Tf_np = rng.standard_normal((256, 256, 256), dtype=np.float32)
        Tfb = Tf_np[np.ix_(perm, perm, perm)]
        Tfb_d = jax.device_put(jnp.asarray(Tfb))  # real f32: fine
        prec = ("highest" if "dftmm" in cases else "high")

        def stage(x, M):
            # contract axis 1, result axis appended minor (natural dot order)
            d = x.ndim
            ls = "abcdefg"[:d]
            sub = ls[0] + "l" + ls[2:]
            out = ls[0] + ls[2:] + "m"
            return jnp.einsum(f"{sub},ml->{out}", x, jnp.asarray(M),
                              precision=prec)

        def roundtrip(x):
            for _ in range(3):
                x = stage(x, Mf_d)
            x = Tfb_d[None] * x
            for _ in range(3):
                x = stage(x, Mi_d)
            return x
        sec = timed_pair(scanner(roundtrip), k1=2, k2=4)
        ideal = (21 + 21) * V + 4 * V
        report(f"toeplitz roundtrip (dot,{prec})", sec, ideal)

    if {"stage1", "stage3", "tfonly", "dftmm_notf", "stage1r",
            "stage1prec", "stageminor", "stageint", "bigdot"} & set(cases):
        from indigo_tpu.ops.dft_fft import dft_pad2x_mats
        Mf, Mi = dft_pad2x_mats(128)
        perm = np.concatenate([np.arange(0, 256, 2), np.arange(1, 256, 2)])
        Tf_np = rng.standard_normal((256, 256, 256), dtype=np.float32)
        Tfb_d = jax.device_put(jnp.asarray(Tf_np[np.ix_(perm, perm, perm)]))

        def stage(x, M):
            d = x.ndim
            ls = "abcdefg"[:d]
            return jnp.einsum(
                f"{ls[0]}l{ls[2:]},ml->{ls[0]}{ls[2:]}m", x, jnp.asarray(M),
                precision="highest")

        if "stage1" in cases:
            # single fwd stage, V in -> 2V out, then crop back to V so the
            # scan carry shape is stable (crop read+write adds 4V)
            sec = timed_pair(scanner(
                lambda x: stage(x, Mf)[..., ::2]))
            report("fwd stage1 (3V dot + 4V crop)", sec, 7 * V)

        if "stage1prec" in cases:
            for prec in ("default", "high", "highest"):
                def st(x, p=prec):
                    y = jnp.einsum("albc,ml->abcm", x, jnp.asarray(Mf),
                                   precision=p)
                    return y[..., ::2]
                sec = timed_pair(scanner(st))
                report(f"fwd stage1 prec={prec}", sec, 7 * V)

        if "stageminor" in cases:
            # contraction on the MINOR axis: y = x2d @ Mf.T, same traffic
            for prec in ("default", "highest"):
                def st(x, p=prec):
                    x2 = x.reshape(8 * 128 * 128, 128)
                    y = jnp.einsum("rl,ml->rm", x2, jnp.asarray(Mf),
                                   precision=p)
                    return y[:, ::2].reshape(x.shape)
                sec = timed_pair(scanner(st))
                report(f"minor-contract dot p={prec}", sec, 7 * V)

        if "stageint" in cases:
            # complex as interleaved real: bitcast c64 -> (..., 2) f32,
            # complex algebra folded into the doubled constant matrix
            M2i = np.zeros((512, 256), np.float32)
            M2i[0::2, 0::2] = Mf.real
            M2i[0::2, 1::2] = -Mf.imag
            M2i[1::2, 0::2] = Mf.imag
            M2i[1::2, 1::2] = Mf.real

            def st(x):
                xr = x.view(jnp.float32)                # (..., 2*minor)
                x2 = xr.reshape(8, 128, 128, 128, 2)
                y2 = jnp.einsum("albcg,mlg->abcm",
                                x2, jnp.asarray(M2i.reshape(512, 128, 2)),
                                precision="highest")
                y = y2.reshape(8, 128, 128, 256, 2)[..., ::2, :]
                return y.reshape(8, 128, 128, 256).view(jnp.complex64)
            sec = timed_pair(scanner(st))
            report("stage1 interleaved-real", sec, 7 * V)

        if "bigdot" in cases:
            # best-case pure real dot, same bytes as stage1: (1M,256)@(256,512)
            M2 = rng.standard_normal((256, 512), dtype=np.float32)

            def st(x):
                xr = x.view(jnp.float32)
                x2 = xr.reshape(8 * 128 * 128, 256)
                y2 = jnp.dot(x2, jnp.asarray(M2), precision="highest")
                y = y2.reshape(8, 128, 128, 2, 256)[..., ::2]
                return y.reshape(8, 128, 128, 256).view(jnp.complex64)
            sec = timed_pair(scanner(st))
            report("plain real dot same bytes", sec, 7 * V)

        if "stage1r" in cases:
            # same stage as a K-doubled REAL dot (complex algebra in the
            # matrix): x2 (B, 2l, f) real; M2 (2m, 2l)
            M2 = np.block([[Mf.real, -Mf.imag],
                           [Mf.imag, Mf.real]]).astype(np.float32)

            def st_r(x):
                x2 = jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=1)
                y2 = jnp.einsum("albc,ml->abcm", x2, jnp.asarray(M2),
                                precision="highest")
                m = y2.shape[-1] // 2
                y = lax.complex(y2[..., :m], y2[..., m:])
                return y[..., ::2]
            sec = timed_pair(scanner(st_r))
            report("fwd stage1 REAL-K2 (+crop)", sec, 7 * V)

        if "stage3" in cases:
            # stage on a 4V operand (the big fwd stage): reshape x to
            # (8, 128, 4*128*128) stands in for (s, x, Z2*Y2)
            def st3(x):
                big = jnp.concatenate([x, x, x, x], axis=3)  # 4V build: 8V io
                y = stage(big.reshape(8, 128, 4 * 128 * 128), Mf)
                return y.reshape(8, 4 * 128, 128, 256)[:, :128, :, ::2]
            sec = timed_pair(scanner(st3), k1=2, k2=4)
            report("fwd stage3 (4V->8V dot +8V+9V)", sec, 29 * V)

        if "tfonly" in cases:
            def tf_mult(x):
                big = jnp.concatenate([x, x], axis=1)
                big = jnp.concatenate([big, big], axis=2)
                big = jnp.concatenate([big, big], axis=3)   # 8V (read V, write 8V)
                big = Tfb_d[None] * big                     # 8V+8V(+4V Tf)
                return big[:, :128, :128, :128]             # 8V + V
            sec = timed_pair(scanner(tf_mult), k1=2, k2=4)
            report("Tf multiply (8V io x2 +26V)", sec, 46 * V)

        if "dftmm_notf" in cases:
            def rt(x):
                for _ in range(3):
                    x = stage(x, Mf)
                for _ in range(3):
                    x = stage(x, Mi)
                return x
            sec = timed_pair(scanner(rt), k1=2, k2=4)
            report("roundtrip 6 dots, no Tf", sec, 42 * V)

    if "dftmm_check" in cases:
        # correctness vs current implementation on small shape
        from indigo_tpu.ops.toeplitz_fft import fft_pad2x, ifft_crop2x
        n = 16
        j = np.arange(n)
        F = np.exp(-2j * np.pi * np.outer(np.arange(n), j) / n)
        t = np.exp(-1j * np.pi * j / n)
        Mf = np.concatenate([F, F * t[None, :]], axis=0)
        Fi = np.exp(2j * np.pi * np.outer(j, np.arange(n)) / n) / n
        Mi = np.concatenate([0.5 * Fi,
                             0.5 * np.conj(t)[:, None] * Fi], axis=1)
        perm = np.concatenate([2 * j, 2 * j + 1])
        Tf_np = rng.standard_normal((2 * n, 2 * n, 2 * n),
                                    dtype=np.float32)
        Tfb = Tf_np[np.ix_(perm, perm, perm)]
        x = (rng.standard_normal((2, n, n, n))
             + 1j * rng.standard_normal((2, n, n, n))).astype(np.complex64)

        def stage(x, M):
            d = x.ndim
            ls = "abcdefg"[:d]
            return jnp.einsum(
                f"{ls[0]}l{ls[2:]},ml->{ls[0]}{ls[2:]}m", x, jnp.asarray(M),
                precision="highest")

        @jax.jit
        def rt_new(x):
            for _ in range(3):
                x = stage(x, Mf.astype(np.complex64))
            x = jnp.asarray(Tfb)[None] * x
            for _ in range(3):
                x = stage(x, Mi.astype(np.complex64))
            return x

        @jax.jit
        def rt_old(x):
            X = fft_pad2x(x, (1, 2, 3))
            X = jnp.asarray(Tf_np)[None] * X
            return ifft_crop2x(X, (1, 2, 3))

        a = np.asarray(rt_new(x))
        b = np.asarray(rt_old(x))
        err = np.linalg.norm(a - b) / np.linalg.norm(b)
        print(f"dftmm vs current roundtrip rel_err: {err:.2e}")

    if "fft256min" in cases:
        sec = timed_pair(scanner(
            lambda x: jnp.fft.fft(x.reshape(8, 128, 64, 256),
                                  axis=-1).reshape(x.shape)))
        report("fft minor axis (256)", sec, 2 * V)

    if "transpose" in cases:
        sec = timed_pair(scanner(
            lambda x: jnp.swapaxes(x, 1, 3)))
        report("transpose (1<->3)", sec, 2 * V)

    if "t256" in cases:
        # plain materialized doubled-grid fftn roundtrip for comparison
        Tf = jax.device_put(jnp.asarray(
            rng.standard_normal((256, 256, 256), dtype=np.float32)))

        def roundtrip(x):
            big = jnp.zeros((8, 256, 256, 256), x.dtype)
            big = lax.dynamic_update_slice(big, x, (0, 0, 0, 0))
            X = jnp.fft.fftn(big, axes=(1, 2, 3))
            X = Tf[None] * X
            v = jnp.fft.ifftn(X, axes=(1, 2, 3))
            return v[:, :128, :128, :128]
        sec = timed_pair(scanner(roundtrip), k1=2, k2=4)
        ideal = (21 + 21) * V + 4 * V
        report("toeplitz roundtrip (fftn256)", sec, ideal)


if __name__ == "__main__":
    main()
