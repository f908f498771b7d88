"""Pallas TPU kernels for the doubled-grid Toeplitz round trip.

Fuses the six matmul-DFT stages of ops/dft_fft.py into THREE kernels so the
big intermediates never round-trip HBM between stages:

  kernel A  (fwd z + fwd y)            per x-tile:    1V read, 4V written
  kernel B  (fwd x + Tf mult + inv Z)  per Y-tile:    4V read + Tf, 4V written
  kernel C  (inv Y + inv X)            per z-tile:    4V read, 1V written

versus 62V of HBM traffic for the unfused XLA pipeline (the 8V doubled-grid
cube is never materialized in HBM at all). Each kernel's OUTPUT layout is
chosen so the NEXT kernel's blocks are contiguous DMAs:

  u (B,x,z,y) --A--> (B, Y, x, Z) --B--> (B, z, Y, X) --C--> (B, z, y, x)

The spectrum is stored host-side in (Y, Z, X) block layout
(``pallas_spectrum``); its block index depends only on the Y grid dim, which
iterates slowest, so Mosaic's block-revisiting keeps it in VMEM across the
batch dim (read once, not once per coil).

Complex data is carried as separate re/im f32 refs (TPU Pallas has no
complex dtype). Each complex DFT stage is computed at ~f32 accuracy with
NINE bf16 MXU passes: Karatsuba (3 real products per complex product, the
matrix sums folded into host-built constants) x bf16x3 float32 emulation
(constants pre-split hi/lo on host, data tiles split on the VPU). Mosaic's
own f32 matmul (precision=HIGHEST) costs 24 equivalent passes — the manual
split is 2.4x less MXU work and measures 6.6 ms vs 16.6 ms per 128^3 8-coil
round trip (XLA matmul-DFT: 22.3 ms; XLA jnp.fft pipeline: 54.7 ms). In the
SENSE CG loop: 156.8 iters/s vs 18.1 at round 1 — 65% of the HBM roofline.

Reference parity: with ops/dft_fft.py this replaces the reference's
cuFFT/DFTI batched-FFT stage (SURVEY.md §2 native checklist row 3) — a
"custom kernel" component of this framework, alongside ops/ell_spmm.py.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft_fft import dft_pad2x_mats, block_spectrum

__all__ = ["pallas_spectrum", "toeplitz_apply_pallas",
           "sense_normal_pallas", "pallas_supported"]


def pallas_spectrum(Tf: np.ndarray) -> np.ndarray:
    """Host-side: raw doubled-grid spectrum (Z, Y, X) -> block layout
    transposed to (Y, Z, X), the layout kernel B consumes."""
    Tb = block_spectrum(np.asarray(Tf))
    return np.ascontiguousarray(np.transpose(Tb, (1, 0, 2)))


def _pack(M) -> np.ndarray:
    """Host-side: complex matrix -> (6, r, c) bf16 Karatsuba/split pack:
    [Re_hi, Re_lo, Im_hi, Im_lo, (Re+Im)_hi, (Re+Im)_lo]."""
    import ml_dtypes

    M = np.asarray(M)
    out = []
    for part in (M.real, M.imag, M.real + M.imag):
        x = np.asarray(part, np.float32)
        hi = x.astype(ml_dtypes.bfloat16)
        lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        out += [hi, lo]
    return np.ascontiguousarray(np.stack(out))


def _split(x):
    """f32 -> (hi, lo) bf16 pair on the VPU (bf16x3 operand split)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _d3(ah, al, bh, bl, dn):
    """f32-accurate product of split operands: 3 bf16 MXU passes
    (the lo*lo term is below f32 resolution)."""
    f = lambda a, b: lax.dot_general(a, b, dn,
                                     preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _cmm(xr, xi, pack, dn, const_lhs):
    """Complex matmul data x const-pack via Karatsuba: 9 bf16 passes.

    P1 = x_r * M_r, P2 = x_i * M_i, P3 = (x_r + x_i) * (M_r + M_i);
    returns (P1 - P2, P3 - P1 - P2). ``const_lhs`` puts the constant pack
    on the lhs of dot_general (for M @ x stages).
    """
    xrh, xrl = _split(xr)
    xih, xil = _split(xi)
    xsh, xsl = _split(xr + xi)
    if const_lhs:
        # dot_general(const, data): constant pack on the lhs
        f = lambda a, b: lax.dot_general(a, b, dn,
                                         preferred_element_type=jnp.float32)
        p1 = f(pack[0], xrh) + f(pack[1], xrh) + f(pack[0], xrl)
        p2 = f(pack[2], xih) + f(pack[3], xih) + f(pack[2], xil)
        p3 = f(pack[4], xsh) + f(pack[5], xsh) + f(pack[4], xsl)
    else:
        p1 = _d3(xrh, xrl, pack[0], pack[1], dn)
        p2 = _d3(xih, xil, pack[2], pack[3], dn)
        p3 = _d3(xsh, xsl, pack[4], pack[5], dn)
    return p1 - p2, p3 - p1 - p2


# dot_general dimension_numbers
_DN_T = (((0,), (0,)), ((), ()))   # contract dim0 of both (data lhs-T)
_DN = (((1,), (0,)), ((), ()))     # standard matmul


def _kernel_A(ur, ui, p1, p2, our, oui):
    """fwd stage z + fwd stage y for an x-tile.

    ur/ui: (1, xt, n1, n2) input slab (x-major layout)
    p1:    (6, n1, 2n1)    pack of Mf(n1).T — stage z, lhs-T contraction
    p2:    (6, 2n2, n2)    pack of Mf(n2)   — stage y
    our/oui: (1, 2n2, xt, 2n1) output (Y, x, Z)
    """
    xt = ur.shape[1]
    q1 = p1[...]
    q2 = p2[...]

    def body(j, _):
        # A1t[y, Z] = sum_z x[z, y] * MfT[z, Z]
        a1r, a1i = _cmm(ur[0, j], ui[0, j], q1, _DN_T, const_lhs=False)
        # A2t[Y, Z] = Mf2 @ A1t
        a2r, a2i = _cmm(a1r, a1i, q2, _DN, const_lhs=True)
        our[0, :, j, :] = a2r
        oui[0, :, j, :] = a2i
        return 0

    lax.fori_loop(0, xt, body, 0, unroll=True)


def _kernel_B(ur, ui, tf, p3, p4, our, oui):
    """fwd stage x + spectrum multiply + inv stage Z for a Y-tile.

    ur/ui: (1, yt, n3, 2n1) (Y, x, Z) slab
    tf:    (yt, 2n1, 2n3)   spectrum in (Y, Z, X) layout, f32
    p3:    (6, n3, 2n3)     pack of Mf(n3).T — stage x, lhs-T contraction
    p4:    (6, n1, 2n1)     pack of Mi(n1)   — inv stage Z
    our/oui: (1, n1, yt, 2n3) output (z, Y, X)
    """
    yt = ur.shape[1]
    q3 = p3[...]
    q4 = p4[...]

    def body(j, _):
        # A3[Z, X] = sum_x in[x, Z] * Mf3T[x, X]
        a3r, a3i = _cmm(ur[0, j], ui[0, j], q3, _DN_T, const_lhs=False)
        t = tf[j]                          # (2n1, 2n3) real
        a3r = t * a3r
        a3i = t * a3i
        # out[z, X] = Mi1 @ A3
        br, bi = _cmm(a3r, a3i, q4, _DN, const_lhs=True)
        our[0, :, j, :] = br
        oui[0, :, j, :] = bi
        return 0

    lax.fori_loop(0, yt, body, 0, unroll=True)


def _kernel_C(ur, ui, p5, p6, our, oui):
    """inv stage Y + inv stage X for a z-tile.

    ur/ui: (1, zt, 2n2, 2n3) (z, Y, X) slab
    p5:    (6, n2, 2n2)      pack of Mi(n2)   — inv stage Y
    p6:    (6, 2n3, n3)      pack of Mi(n3).T — inv stage X
    our/oui: (1, zt, n2, n3) output (z, y, x)
    """
    zt = ur.shape[1]
    q5 = p5[...]
    q6 = p6[...]

    def body(j, _):
        # T[y, X] = Mi2 @ in
        t1r, t1i = _cmm(ur[0, j], ui[0, j], q5, _DN, const_lhs=True)
        # out[y, x] = T @ Mi3T
        cr, ci = _cmm(t1r, t1i, q6, _DN, const_lhs=False)
        our[0, j, :, :] = cr
        oui[0, j, :, :] = ci
        return 0

    lax.fori_loop(0, zt, body, 0, unroll=True)


def _kernel_A_fused(vr, vi, mr, mi, p1, p2, our, oui):
    """coil-map multiply + fwd stage z + fwd stage y for an x-tile.

    Same as _kernel_A but the input slab is the IMAGE (revisited across the
    coil grid dim — read once per x-tile, not once per coil) and the coil
    map multiply happens in VMEM, so the (S*nc)-volume u = m*v intermediate
    never exists in HBM.
    """
    xt = vr.shape[1]
    q1 = p1[...]
    q2 = p2[...]

    def body(j, _):
        ur = vr[0, j] * mr[0, j] - vi[0, j] * mi[0, j]
        ui = vr[0, j] * mi[0, j] + vi[0, j] * mr[0, j]
        a1r, a1i = _cmm(ur, ui, q1, _DN_T, const_lhs=False)
        a2r, a2i = _cmm(a1r, a1i, q2, _DN, const_lhs=True)
        our[0, :, j, :] = a2r
        oui[0, :, j, :] = a2i
        return 0

    lax.fori_loop(0, xt, body, 0, unroll=True)


def _kernel_C_fused(ur, ui, mr, mi, p5, p6, our, oui):
    """inv stage Y + inv stage X + conj(map) multiply-accumulate.

    The coil grid dim iterates fastest; the output block (indexed by slice
    and z-tile only) stays VMEM-resident across coils, zeroed on the first
    coil — the coil-combine sum never materializes per-coil volumes in HBM.
    """
    c = pl.program_id(2)
    zt = ur.shape[1]
    q5 = p5[...]
    q6 = p6[...]

    @pl.when(c == 0)
    def _():
        our[...] = jnp.zeros_like(our)
        oui[...] = jnp.zeros_like(oui)

    def body(j, _):
        t1r, t1i = _cmm(ur[0, j], ui[0, j], q5, _DN, const_lhs=True)
        cr, ci = _cmm(t1r, t1i, q6, _DN, const_lhs=False)
        our[0, j] += mr[0, j] * cr + mi[0, j] * ci    # conj(m) * res
        oui[0, j] += mr[0, j] * ci - mi[0, j] * cr
        return 0

    lax.fori_loop(0, zt, body, 0, unroll=True)


_TILE = 8  # Mosaic: a block's second-to-last dim must be divisible by 8


def pallas_supported(shape) -> bool:
    """True when the fused-kernel tiling fits this volume: every image dim
    a multiple of 8 and <= 256. VMEM check at 256^3 (v5e budget 100MB set
    below): kernel A holds 2 in-blocks (8,256,256), 2 out-blocks
    (512,8,512) and the packs — ~45MB double-buffered; kernels B/C are
    similar. Larger volumes take the jnp matmul-DFT path (or the
    volume-sharded multi-chip recon)."""
    if len(shape) != 3:
        return False
    return all(s % 8 == 0 and 8 <= s <= 256 for s in shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sense_normal_pallas(Tfp, maps, v, interpret=False):
    """Full SENSE Toeplitz normal op, coil handling fused into the kernels:

        out_s = sum_c conj(m_c) * crop(IFFT(Tf * FFT(pad_2x(m_c * v_s))))

    v:    (S, n1, n2, n3) complex64 slice images
    maps: (nc, n1, n2, n3) complex64 coil maps
    Tfp:  (2n2, 2n1, 2n3) float32 — ``pallas_spectrum`` layout.
    Returns (S, n1, n2, n3) complex64.

    vs the unfused path (XLA multiply -> toeplitz_apply_pallas -> XLA
    conj-combine): the (S*nc)-volume u intermediate, its entry transpose
    and the per-coil combine read never touch HBM — ~25% less traffic per
    CG iteration. The map transposes depend only on loop constants, so XLA
    hoists them out of solver loops.
    """
    S, n1, n2, n3 = v.shape
    nc = maps.shape[0]
    assert maps.shape[1:] == (n1, n2, n3), (maps.shape, v.shape)
    assert pallas_supported((n1, n2, n3)), (n1, n2, n3)
    xt = yt = zt = _TILE
    B = S * nc

    Mf1, Mi1 = dft_pad2x_mats(n1)
    Mf2, Mi2 = dft_pad2x_mats(n2)
    Mf3, Mi3 = dft_pad2x_mats(n3)
    p1 = _pack(Mf1.T)
    p2 = _pack(Mf2)
    p3 = _pack(Mf3.T)
    p4 = _pack(Mi1)
    p5 = _pack(Mi2)
    p6 = _pack(Mi3.T)

    # entry transposes to x-major (image per-call; maps hoisted by XLA LICM)
    vt = jnp.transpose(v, (0, 3, 1, 2))
    vr, vi = jnp.real(vt), jnp.imag(vt)
    mt = jnp.transpose(maps, (0, 3, 1, 2))
    mxr, mxi = jnp.real(mt), jnp.imag(mt)
    mnr, mni = jnp.real(maps), jnp.imag(maps)

    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- kernel A (fused): image x-tile revisited across coils ----------
    a_out = [jax.ShapeDtypeStruct((B, 2 * n2, n3, 2 * n1), jnp.float32)] * 2
    ar, ai = pl.pallas_call(
        _kernel_A_fused,
        grid=(S, n3 // xt, nc),
        in_specs=[
            pl.BlockSpec((1, xt, n1, n2), lambda s, t, c: (s, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt, n1, n2), lambda s, t, c: (s, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt, n1, n2), lambda s, t, c: (c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt, n1, n2), lambda s, t, c: (c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p1), full(p2),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * n2, xt, 2 * n1),
                         lambda s, t, c: (s * nc + c, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=a_out,
        compiler_params=cparams,
        interpret=interpret,
    )(vr, vi, mxr, mxi, p1, p2)

    # ---- kernel B: unchanged (per-coil-volume independent) --------------
    b_out = [jax.ShapeDtypeStruct((B, n1, 2 * n2, 2 * n3), jnp.float32)] * 2
    br, bi = pl.pallas_call(
        _kernel_B,
        grid=(2 * n2 // yt, B),
        in_specs=[
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yt, 2 * n1, 2 * n3), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p3), full(p4),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, yt, 2 * n3), lambda t, b: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=b_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ar, ai, Tfp, p3, p4)

    # ---- kernel C (fused): coil fastest; output accumulates in VMEM -----
    c_out = [jax.ShapeDtypeStruct((S, n1, n2, n3), jnp.float32)] * 2
    cr, ci = pl.pallas_call(
        _kernel_C_fused,
        grid=(S, n1 // zt, nc),
        in_specs=[
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda s, t, c: (s * nc + c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda s, t, c: (s * nc + c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zt, n2, n3), lambda s, t, c: (c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zt, n2, n3), lambda s, t, c: (c, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p5), full(p6),
        ],
        out_specs=[
            pl.BlockSpec((1, zt, n2, n3), lambda s, t, c: (s, t, 0, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=c_out,
        compiler_params=cparams,
        interpret=interpret,
    )(br, bi, mnr, mni, p5, p6)

    return lax.complex(cr, ci)


@functools.partial(jax.jit, static_argnames=("interpret",))
def toeplitz_apply_pallas(Tfp, u, interpret=False):
    """crop(IFFT(Tf * FFT(pad_2x(u)))) via three fused Pallas kernels.

    u:   (B, n1, n2, n3) complex64
    Tfp: (2n2, 2n1, 2n3) float32 — ``pallas_spectrum(Tf)`` layout.
    Returns (B, n1, n2, n3) complex64.
    """
    B, n1, n2, n3 = u.shape
    assert pallas_supported((n1, n2, n3)), (n1, n2, n3)
    xt = yt = zt = _TILE

    Mf1, Mi1 = dft_pad2x_mats(n1)
    Mf2, Mi2 = dft_pad2x_mats(n2)
    Mf3, Mi3 = dft_pad2x_mats(n3)
    p1 = _pack(Mf1.T)          # (6, n1, 2n1)
    p2 = _pack(Mf2)            # (6, 2n2, n2)
    p3 = _pack(Mf3.T)          # (6, n3, 2n3)
    p4 = _pack(Mi1)            # (6, n1, 2n1)
    p5 = _pack(Mi2)            # (6, n2, 2n2)
    p6 = _pack(Mi3.T)          # (6, 2n3, n3)

    # entry transpose to x-major (fused with the re/im split by XLA)
    ut = jnp.transpose(u, (0, 3, 1, 2))
    ur, ui = jnp.real(ut), jnp.imag(ut)

    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    # v5e has 128MB VMEM; the default 16MB scoped limit is too tight for
    # the 8-deep tiles + double buffering
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- kernel A: (B, x, z, y) -> (B, Y, x, Z) -------------------------
    a_out = [jax.ShapeDtypeStruct((B, 2 * n2, n3, 2 * n1), jnp.float32)] * 2
    ar, ai = pl.pallas_call(
        _kernel_A,
        grid=(B, n3 // xt),
        in_specs=[
            pl.BlockSpec((1, xt, n1, n2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt, n1, n2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p1), full(p2),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * n2, xt, 2 * n1),
                         lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=a_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ur, ui, p1, p2)

    # ---- kernel B: (B, Y, x, Z) -> (B, z, Y, X) -------------------------
    # grid: Y-tiles slowest so the Tf block is revisited across B
    b_out = [jax.ShapeDtypeStruct((B, n1, 2 * n2, 2 * n3), jnp.float32)] * 2
    br, bi = pl.pallas_call(
        _kernel_B,
        grid=(2 * n2 // yt, B),
        in_specs=[
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yt, 2 * n1, 2 * n3), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p3), full(p4),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, yt, 2 * n3), lambda t, b: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=b_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ar, ai, Tfp, p3, p4)

    # ---- kernel C: (B, z, Y, X) -> (B, z, y, x) -------------------------
    c_out = [jax.ShapeDtypeStruct((B, n1, n2, n3), jnp.float32)] * 2
    cr, ci = pl.pallas_call(
        _kernel_C,
        grid=(B, n1 // zt),
        in_specs=[
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(p5), full(p6),
        ],
        out_specs=[
            pl.BlockSpec((1, zt, n2, n3), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=c_out,
        compiler_params=cparams,
        interpret=interpret,
    )(br, bi, p5, p6)

    return lax.complex(cr, ci)
