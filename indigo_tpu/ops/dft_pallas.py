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
split is 2.4x less MXU work and measures 6.1 ms vs 16.6 ms per 128^3 8-coil
round trip (XLA matmul-DFT: 22.3 ms; XLA jnp.fft pipeline: 54.7 ms). In the
SENSE CG loop: ~155 iters/s vs 18.1 at round 1 (long-span median timing;
the 183 recorded mid-round was a short-span min-estimator artifact).

Axes longer than 128 use a radix-2 stage factorization (see _Stage): four
half-size matmuls at full 128-deep MXU utilization plus a VPU butterfly —
2x fewer MXU FLOPs where the matmul-DFT's O(n)-per-element work would
otherwise dominate (256^3 measured MXU-bound). Every twiddle diagonal
(|tw| = 1) is folded into the bf16 constant packs on the host, so kernel
bodies do no twiddle arithmetic — butterfly adds and matmuls only
(256^3 nc=4 apply: 30.4 -> 28.4 ms). fwd_M additionally merges its two
constant matrices per input half ([Fm ; tw*Fm]) so each half is one
9-pass matmul with its operand split hi/lo exactly once. Radix bodies
run their per-tile stage loop ROLLED (~9% faster at 256^3 — unrolling
the ~3x-bigger radix bodies defeats Mosaic's scheduling), plain <=128
bodies unrolled (~13% faster at 128^3); see _stage_unroll. Probed dead
ends (tools/dot_probe.py, tools/kern_micro.py at
256^3): merging the four inverse half-products into one wide matmul is
slower (VMEM concat copies exceed the split savings; see _Stage.apply),
rank-3 dot_general forms lower but run ~2x slower than per-row dots, and
radix-4/split-radix cannot cut executed MACs further because the MXU
pads every contraction to depth 128 (see profiling.toeplitz_cg_iter_macs
for the executed-FLOP floor argument). Radix stages speak the
per-axis sigma (even|odd block) image basis — contiguous VMEM splits and
concats only, because Mosaic lowers neither strided sublane slices nor
lane interleaves (and in-VMEM sublane relayouts measured SLOWER than the
HBM reorders they replaced). Solvers keep the whole CG state in the sigma
basis (``sigma=True``; CG is permutation-invariant) so the basis costs one
HBM reorder per SOLVE; other callers pay one reorder pass per side per
apply (wrappers handle it; external semantics stay natural-order).

Reference parity: with ops/dft_fft.py this replaces the reference's
cuFFT/DFTI batched-FFT stage (SURVEY.md §2 native checklist row 3) — a
"custom kernel" component of this framework, alongside ops/ell_spmm.py.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft_fft import dft_pad2x_mats, block_spectrum

__all__ = ["pallas_spectrum", "toeplitz_apply_pallas",
           "sense_normal_pallas", "pallas_supported", "uses_sigma_basis",
           "to_sigma_basis", "from_sigma_basis", "solver_sigma_axes"]


# Stage-loop unrolling inside the kernels ("auto" | "always" | "never").
# Mosaic schedules the rolled loop with less code bloat; measured on v5e the
# better mode depends on transform length (see _stage_unroll).
_UNROLL_MODE = os.environ.get("INDIGO_DFT_UNROLL", "auto")


def _stage_unroll(img_shape, interpret) -> bool:
    """Whether the kernels unroll their per-tile stage loop."""
    if interpret:
        return False
    if _UNROLL_MODE == "always":
        return True
    if _UNROLL_MODE == "never":
        return False
    # measured on v5e (full sense_normal_pallas apply): radix-factorized
    # sizes run ~9% faster ROLLED (256^3 nc=4: 30.4 vs 33.3 ms — the
    # radix bodies are ~3x the code; unrolling defeats Mosaic's scheduling)
    # while plain <=128 sizes run ~13% faster UNROLLED (128^3 nc=8:
    # 6.33 vs 7.16 ms).
    return max(img_shape) <= 128


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


def _csplit(xr, xi):
    """VPU: split a complex operand's three Karatsuba parts hi/lo once.
    Returns (xrh, xrl, xih, xil, xsh, xsl) for reuse across several
    ``_cmm_pre`` calls — re-splitting per matmul was ~half the radix
    stages' VPU work."""
    xrh, xrl = _split(xr)
    xih, xil = _split(xi)
    xsh, xsl = _split(xr + xi)
    return xrh, xrl, xih, xil, xsh, xsl


def _cmm_pre(sp, pack, dn, const_lhs):
    """Complex matmul of a PRE-SPLIT operand (``_csplit``) with a const
    pack via Karatsuba: 9 bf16 passes. Returns (P1 - P2, P3 - P1 - P2)."""
    xrh, xrl, xih, xil, xsh, xsl = sp
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


def _cmm(xr, xi, pack, dn, const_lhs):
    """Complex matmul data x const-pack via Karatsuba: 9 bf16 passes.

    P1 = x_r * M_r, P2 = x_i * M_i, P3 = (x_r + x_i) * (M_r + M_i);
    returns (P1 - P2, P3 - P1 - P2). ``const_lhs`` puts the constant pack
    on the lhs of dot_general (for M @ x stages).
    """
    return _cmm_pre(_csplit(xr, xi), pack, dn, const_lhs)


# dot_general dimension_numbers
_DN_T = (((0,), (0,)), ((), ()))   # contract dim0 of both (data lhs-T)
_DN = (((1,), (0,)), ((), ()))     # standard matmul


@functools.lru_cache(maxsize=None)
def _get_stage(n, role):
    return _Stage(n, role)


def uses_sigma_basis(shape) -> bool:
    """True when any image axis of this volume is radix (> 128) — i.e. the
    Pallas pipeline's image basis is sigma on those axes. Solvers use this
    to keep the whole CG state in the sigma basis (one reorder per solve);
    other callers let the wrappers reorder per apply."""
    return len(shape) == 3 and any(int(s) > 128 for s in shape)


def _sigma_axes(shape):
    return tuple(i for i, s in enumerate(shape) if int(s) > 128)


def solver_sigma_axes(img_shape, lead=1):
    """Sigma (radix) axes of a batched (lead, *img_shape) array — the axes
    solvers must reorder when holding CG state in the sigma basis. Single
    source of truth for the radix threshold (see _sigma_axes)."""
    return tuple(lead + ax for ax in _sigma_axes(img_shape))


def to_sigma_basis(a, img_axes):
    """HBM: reorder ``img_axes`` of a natural -> sigma (even|odd blocks)."""
    for ax in img_axes:
        ev = lax.slice_in_dim(a, 0, a.shape[ax], stride=2, axis=ax)
        od = lax.slice_in_dim(a, 1, a.shape[ax], stride=2, axis=ax)
        a = jnp.concatenate([ev, od], axis=ax)
    return a


def from_sigma_basis(a, img_axes):
    """HBM: reorder ``img_axes`` of a sigma -> natural (interleave)."""
    for ax in img_axes:
        n = a.shape[ax]
        lo = lax.slice_in_dim(a, 0, n // 2, axis=ax)
        hi = lax.slice_in_dim(a, n // 2, n, axis=ax)
        a = jnp.stack([lo, hi], axis=ax + 1).reshape(
            a.shape[:ax] + (n,) + a.shape[ax + 1:])
    return a


def _make_kernel_A(st1, st2, unroll=True):
    """fwd stage z + fwd stage y for an x-tile.

    ur/ui: (1, xt, n1, n2) input slab (x-major layout)
    packs: st1 = fwd_T(n1) (stage z), st2 = fwd_M(n2) (stage y)
    our/oui: (1, 2n2, xt, 2n1) output (Y, x, Z)
    """
    k1 = len(st1.packs)
    k2 = len(st2.packs)

    def kernel(ur, ui, *rest):
        q = [r[...] for r in rest[:k1 + k2]]
        our, oui = rest[k1 + k2:]
        xt = ur.shape[1]

        def body(j, _):
            # A1t[y, Z] = sum_z x[z, y] * MfT[z, Z]
            a1r, a1i = st1.apply(ur[0, j], ui[0, j], q[:k1])
            # A2t[Y, Z] = Mf2 @ A1t
            a2r, a2i = st2.apply(a1r, a1i, q[k1:])
            our[0, :, j, :] = a2r
            oui[0, :, j, :] = a2i
            return 0

        lax.fori_loop(0, xt, body, 0, unroll=unroll)

    return kernel


def _make_kernel_B(st3, st4, unroll=True):
    """fwd stage x + spectrum multiply + inv stage Z for a Y-tile.

    ur/ui: (1, yt, n3, 2n1) (Y, x, Z) slab
    tf:    (yt, 2n1, 2n3)   spectrum in (Y, Z, X) layout, f32
    packs: st3 = fwd_T(n3) (stage x), st4 = inv_M(n1) (inv Z)
    our/oui: (1, n1, yt, 2n3) output (z, Y, X)
    """
    k3 = len(st3.packs)
    k4 = len(st4.packs)

    def kernel(ur, ui, tf, *rest):
        q = [r[...] for r in rest[:k3 + k4]]
        our, oui = rest[k3 + k4:]
        yt = ur.shape[1]

        def body(j, _):
            # A3[Z, X] = sum_x in[x, Z] * Mf3T[x, X]
            a3r, a3i = st3.apply(ur[0, j], ui[0, j], q[:k3])
            t = tf[j]                          # (2n1, 2n3) real
            # out[z, X] = Mi1 @ (t * A3)
            br, bi = st4.apply(t * a3r, t * a3i, q[k3:])
            our[0, :, j, :] = br
            oui[0, :, j, :] = bi
            return 0

        lax.fori_loop(0, yt, body, 0, unroll=unroll)

    return kernel


def _make_kernel_C(st5, st6, unroll=True):
    """inv stage Y + inv stage X for a z-tile.

    ur/ui: (1, zt, 2n2, 2n3) (z, Y, X) slab
    packs: st5 = inv_M(n2) (inv Y), st6 = inv_T(n3) (inv X)
    our/oui: (1, zt, n2, n3) output (z, y, x)
    """
    k5 = len(st5.packs)
    k6 = len(st6.packs)

    def kernel(ur, ui, *rest):
        q = [r[...] for r in rest[:k5 + k6]]
        our, oui = rest[k5 + k6:]
        zt = ur.shape[1]

        def body(j, _):
            # T[y, X] = Mi2 @ in
            t1r, t1i = st5.apply(ur[0, j], ui[0, j], q[:k5])
            # out[y, x] = T @ Mi3T
            cr, ci = st6.apply(t1r, t1i, q[k5:])
            our[0, j, :, :] = cr
            oui[0, j, :, :] = ci
            return 0

        lax.fori_loop(0, zt, body, 0, unroll=unroll)

    return kernel


# --------------------------------------------------------------------------
# Radix-2 stage factorization for transform lengths 128 < n <= 256.
#
# The matmul-DFT contracts (n, 2n) matrices — O(n) MXU work per element,
# which makes 256-class volumes MXU-bound (measured ~86 ms of bf16 passes
# per 256^3 8-coil CG iteration vs ~23 ms of HBM). A radix-2 split turns
# each padded 2x transform into four half-size (m=n/2 <= 128) matmuls plus
# a VPU butterfly: 2x fewer MXU FLOPs at full 128-deep MXU utilization.
#
# Layout convention: radix stages speak the per-axis sigma (even|odd
# block) IMAGE basis — contiguous VMEM splits/concats only. Measured dead
# ends, kept for the record: (a) reordering the volume in HBM per apply
# costs ~30 ms at 256^3 (12 fwd + 18 inv); (b) in-VMEM alternatives —
# Mosaic lowers neither strided sublane slices nor ANY lane reorder, and
# the lowerable sublane reshape-split/stack-interleave relayouts measured
# SLOWER end-to-end (117.9 vs 82.6 ms/apply) than the HBM passes they
# replaced. So the basis is hoisted instead: solvers keep the whole CG
# state in the sigma basis (``sigma=True``; CG is permutation-invariant)
# paying one reorder per SOLVE, while default callers pay one pass per
# side per apply (wrappers handle it; external semantics stay natural).
# The spectrum block layout is exactly what block_spectrum/pallas_spectrum
# already store (the butterfly emits natural-ordered F_n outputs inside
# each even/odd block).
# --------------------------------------------------------------------------


class _Stage:
    """One per-axis transform stage: host pack arrays + a kernel-side fn.

    role: 'fwd_T'  — contract data dim0, new axis on lanes   (A-z, B-x)
          'fwd_M'  — M @ x, new axis on sublanes             (A-y)
          'inv_M'  — Mi @ X, outputs on sublanes             (B-invZ, C-invY)
          'inv_T'  — X @ Mi^T, outputs on lanes              (C-invX)

    Radix stages speak the sigma basis: the image side of every transform
    is in per-axis sigma (even|odd block) order, both in and out.
    """

    def __init__(self, n, role):
        self.n = int(n)
        self.role = role
        self.radix = self.n > 128
        Mf, Mi = dft_pad2x_mats(self.n)
        if not self.radix:
            mat = {"fwd_T": Mf.T, "fwd_M": Mf,
                   "inv_M": Mi, "inv_T": Mi.T}[role]
            self.packs = [_pack(mat)]
            return
        m = self.n // 2
        j = np.arange(self.n)
        jm = np.arange(m)
        t = np.exp(-1j * np.pi * j / self.n)
        te, to = t[0::2], t[1::2]
        w = np.exp(-2j * np.pi * jm / self.n)
        # ALL twiddle diagonals are folded into the constant packs on the
        # host (|tw|=1, so the bf16 pack magnitudes are unchanged): the
        # kernels do zero twiddle arithmetic — only butterflies (adds) and
        # the half-size matmuls. The folded side follows from operand
        # orientation: out = P@x folds diag(w) into P's rows, out = x@P
        # into P's columns, etc.
        lanes = role in ("fwd_T", "inv_T")
        if role.startswith("fwd"):
            Fm = np.exp(-2j * np.pi * np.outer(jm, jm) / m)
            # fwd_M merges its packs: the even-input half multiplies
            # [Fm ; Fm*te] and the odd half [w*Fm ; w*Fm*to] in ONE 9-pass
            # complex matmul each (outputs stacked on sublanes) — same
            # MACs as four separate m-wide matmuls, half the MXU
            # instructions and half the operand-split VPU work (kernel A
            # 14.4 -> 14.1 ms at 256^3). The equivalent lane-side merge
            # for fwd_T measured SLOWER (kernel B 43.6 -> 45.4 ms), so
            # fwd_T keeps four narrow matmuls with shared operand splits.
            self.merged = role == "fwd_M"
            if self.merged:
                mats = [np.concatenate([Fm, Fm * te[None, :]], axis=0),
                        np.concatenate([Fm * w[:, None],
                                        Fm * to[None, :] * w[:, None]],
                                       axis=0)]
            else:
                mats = [M.T for M in
                        (Fm, Fm * te[None, :],
                         Fm * w[:, None],
                         Fm * to[None, :] * w[:, None])]
            self.packs = [_pack(M.astype(np.complex64)) for M in mats]
        else:
            Fim = 0.25 * np.exp(2j * np.pi * np.outer(jm, jm) / m) / m
            vw, vte, vto = np.conj(w), np.conj(te), np.conj(to)
            if role == "inv_M":             # out = P @ x
                mats = [Fim,                        # A_e
                        Fim * vte[:, None],         # te ∘ B_e
                        Fim * vw[None, :],          # A_o (input fold)
                        Fim * vw[None, :] * vto[:, None]]   # to ∘ B_o
            else:                            # inv_T: out = x @ P (P = Fim.T)
                mats = [Fim.T,
                        Fim.T * vte[None, :],
                        Fim.T * vw[:, None],
                        Fim.T * vw[:, None] * vto[None, :]]
            self.packs = [_pack(M.astype(np.complex64)) for M in mats]

    def apply(self, xr, xi, refs):
        """Kernel-side: refs are the VMEM pack refs (len == len(self.packs));
        returns (out_r, out_i)."""
        role = self.role
        if not self.radix:
            dn = _DN_T if role in ("fwd_T",) else _DN
            lhs = role in ("fwd_M", "inv_M")
            return _cmm(xr, xi, refs[0][...], dn, const_lhs=lhs)
        m = self.n // 2
        if role in ("fwd_T", "fwd_M"):
            lanes = role == "fwd_T"
            dn = _DN_T if lanes else _DN
            lhs = not lanes
            # contiguous even/odd split: the image axis arrives in sigma
            # (even|odd block) order — the all-sigma basis contract
            lor, loi = xr[:m], xi[:m]
            hir, hii = xr[m:], xi[m:]
            sp_lo = _csplit(lor, loi)
            sp_hi = _csplit(hir, hii)
            if self.merged:
                # one merged 9-pass matmul per input half: lo -> [E ; Ep],
                # hi -> [TO ; TP] (w pre-folded); each operand split hi/lo
                # exactly once
                qlo, qhi = refs[0][...], refs[1][...]
                Lr, Li = _cmm_pre(sp_lo, qlo, dn, const_lhs=lhs)
                Hr, Hi = _cmm_pre(sp_hi, qhi, dn, const_lhs=lhs)
                blk = lambda a, i: a[i * m:(i + 1) * m]
                Er, Epr = blk(Lr, 0), blk(Lr, 1)
                Ei, Epi = blk(Li, 0), blk(Li, 1)
                TOr, TPr = blk(Hr, 0), blk(Hr, 1)
                TOi, TPi = blk(Hi, 0), blk(Hi, 1)
            else:
                # four narrow matmuls (shared splits): the fwd_T lane-side
                # merge measured slower — see __init__
                q0, q1, q2, q3 = (refs[i][...] for i in range(4))
                Er, Ei = _cmm_pre(sp_lo, q0, dn, const_lhs=lhs)
                Epr, Epi = _cmm_pre(sp_lo, q1, dn, const_lhs=lhs)
                TOr, TOi = _cmm_pre(sp_hi, q2, dn, const_lhs=lhs)
                TPr, TPi = _cmm_pre(sp_hi, q3, dn, const_lhs=lhs)
            cat = functools.partial(jnp.concatenate,
                                    axis=1 if lanes else 0)
            return (cat([Er + TOr, Er - TOr, Epr + TPr, Epr - TPr]),
                    cat([Ei + TOi, Ei - TOi, Epi + TPi, Epi - TPi]))
        # inverse roles: fold + 4 half matmuls; every conj-twiddle diagonal
        # is pre-folded into the four constant packs, so the combine is
        # pure adds. (Measured dead end, kept for the record: concatenating
        # the four data blocks into ONE wide matmul — they share the
        # constant — is SLOWER (kernel B 43.6 -> 46.5 ms at 256^3): the
        # VMEM concat copies cost more than the saved operand splits, and
        # narrow back-to-back dots already stream the MXU at ~91 T MAC/s.)
        lanes = role == "inv_T"
        dn = _DN
        lhs = not lanes
        q, q_te, q_w, q_wto = (refs[i][...] for i in range(4))

        def seg(a, i):
            s = slice(i * m, (i + 1) * m)
            return a[:, s] if lanes else a[s]

        def half(Xr, Xi, i0):
            sr, si = (seg(Xr, i0) + seg(Xr, i0 + 1),
                      seg(Xi, i0) + seg(Xi, i0 + 1))
            dr, di = (seg(Xr, i0) - seg(Xr, i0 + 1),
                      seg(Xi, i0) - seg(Xi, i0 + 1))
            return _csplit(sr, si), _csplit(dr, di)

        spA_s, spA_d = half(xr, xi, 0)
        spB_s, spB_d = half(xr, xi, 2)
        Aer, Aei = _cmm_pre(spA_s, q, dn, const_lhs=lhs)      # A_e
        Ber, Bei = _cmm_pre(spB_s, q_te, dn, const_lhs=lhs)   # te ∘ B_e
        Aor, Aoi = _cmm_pre(spA_d, q_w, dn, const_lhs=lhs)    # A_o
        Bor, Boi = _cmm_pre(spB_d, q_wto, dn, const_lhs=lhs)  # to ∘ B_o
        lo_r = Aer + Ber                      # even output positions
        lo_i = Aei + Bei
        hi_r = Aor + Bor                      # odd output positions
        hi_i = Aoi + Boi

        # emit the contiguous even|odd block concat (sigma order): in-VMEM
        # interleaves measured SLOWER than keeping the whole solve in the
        # sigma basis (Mosaic relayouts), and the lane dim cannot be
        # interleaved at all
        cat = functools.partial(jnp.concatenate, axis=1 if lanes else 0)
        return cat([lo_r, hi_r]), cat([lo_i, hi_i])


def _make_kernel_A_fused(st1, st2, unroll=True):
    """coil-map multiply + fwd stage z + fwd stage y for an x-tile.

    Same as _make_kernel_A but the input slab is the IMAGE (revisited
    across the coil grid dim — read once per x-tile, not once per coil) and
    the coil map multiply happens in VMEM, so the (S*nc)-volume u = m*v
    intermediate never exists in HBM.
    """
    k1 = len(st1.packs)
    k2 = len(st2.packs)

    def kernel(vr, vi, mr, mi, *rest):
        q = [r[...] for r in rest[:k1 + k2]]
        our, oui = rest[k1 + k2:]
        xt = vr.shape[1]

        def body(j, _):
            ur = vr[0, j] * mr[0, j] - vi[0, j] * mi[0, j]
            ui = vr[0, j] * mi[0, j] + vi[0, j] * mr[0, j]
            a1r, a1i = st1.apply(ur, ui, q[:k1])
            a2r, a2i = st2.apply(a1r, a1i, q[k1:])
            our[0, :, j, :] = a2r
            oui[0, :, j, :] = a2i
            return 0

        lax.fori_loop(0, xt, body, 0, unroll=unroll)

    return kernel


def _make_kernel_C_fused(st5, st6, unroll=True):
    """inv stage Y + inv stage X + conj(map) multiply-accumulate.

    The coil grid dim iterates fastest; the output block (indexed by slice
    and z-tile only) stays VMEM-resident across coils, zeroed on the first
    coil — the coil-combine sum never materializes per-coil volumes in HBM.
    """
    k5 = len(st5.packs)
    k6 = len(st6.packs)

    def kernel(ur, ui, mr, mi, *rest):
        q = [r[...] for r in rest[:k5 + k6]]
        our, oui = rest[k5 + k6:]
        c = pl.program_id(2)
        zt = ur.shape[1]

        @pl.when(c == 0)
        def _():
            our[...] = jnp.zeros_like(our)
            oui[...] = jnp.zeros_like(oui)

        def body(j, _):
            t1r, t1i = st5.apply(ur[0, j], ui[0, j], q[:k5])
            cr, ci = st6.apply(t1r, t1i, q[k5:])
            our[0, j] += mr[0, j] * cr + mi[0, j] * ci    # conj(m) * res
            oui[0, j] += mr[0, j] * ci - mi[0, j] * cr
            return 0

        lax.fori_loop(0, zt, body, 0, unroll=unroll)

    return kernel


_TILE = 8  # Mosaic: a block's second-to-last dim must be divisible by 8.
# (16-deep tiles were measured at 128^3: identical apply time, much longer
# Mosaic compiles — the kernels are DMA/MXU-balance bound, not
# grid-step bound.)


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


@functools.partial(jax.jit, static_argnames=("interpret", "sigma"))
def sense_normal_pallas(Tfp, maps, v, interpret=False, sigma=False):
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

    sigma: when any image axis is radix (> 128), True means v is ALREADY
    in the per-radix-axis sigma basis and the output is left in it — the
    solver-loop contract (see module layout convention; one reorder per
    solve instead of per iteration). False adds one HBM reorder pass per
    side. No-op for volumes with all axes <= 128.
    """
    S, n1, n2, n3 = v.shape
    nc = maps.shape[0]
    assert maps.shape[1:] == (n1, n2, n3), (maps.shape, v.shape)
    assert pallas_supported((n1, n2, n3)), (n1, n2, n3)
    xt = yt = zt = _TILE
    unroll = _stage_unroll((n1, n2, n3), interpret)
    B = S * nc
    sig_ax = tuple(1 + ax for ax in _sigma_axes((n1, n2, n3)))

    st1 = _get_stage(n1, "fwd_T")
    st2 = _get_stage(n2, "fwd_M")
    st3 = _get_stage(n3, "fwd_T")
    st4 = _get_stage(n1, "inv_M")
    st5 = _get_stage(n2, "inv_M")
    st6 = _get_stage(n3, "inv_T")

    # the kernels' image basis is sigma on every radix axis; maps always
    # ride that basis (trace-time constants — XLA hoists the reorder), the
    # image only when the caller isn't already holding sigma-basis state
    maps = to_sigma_basis(maps, sig_ax)
    if sig_ax and not sigma:
        v = to_sigma_basis(v, sig_ax)

    # entry transposes to x-major (image per-call; maps hoisted by XLA LICM)
    vt = jnp.transpose(v, (0, 3, 1, 2))
    mt = jnp.transpose(maps, (0, 3, 1, 2))
    vr, vi = jnp.real(vt), jnp.imag(vt)
    mxr, mxi = jnp.real(mt), jnp.imag(mt)
    mnr, mni = jnp.real(maps), jnp.imag(maps)

    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- kernel A (fused): image x-tile revisited across coils ----------
    pA = st1.packs + st2.packs
    a_out = [jax.ShapeDtypeStruct((B, 2 * n2, n3, 2 * n1), jnp.float32)] * 2
    ar, ai = pl.pallas_call(
        _make_kernel_A_fused(st1, st2, unroll=unroll),
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
        ] + [full(p) for p in pA],
        out_specs=[
            pl.BlockSpec((1, 2 * n2, xt, 2 * n1),
                         lambda s, t, c: (s * nc + c, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=a_out,
        compiler_params=cparams,
        interpret=interpret,
    )(vr, vi, mxr, mxi, *pA)

    # ---- kernel B: unchanged (per-coil-volume independent) --------------
    pB = st3.packs + st4.packs
    b_out = [jax.ShapeDtypeStruct((B, n1, 2 * n2, 2 * n3), jnp.float32)] * 2
    br, bi = pl.pallas_call(
        _make_kernel_B(st3, st4, unroll=unroll),
        grid=(2 * n2 // yt, B),
        in_specs=[
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yt, 2 * n1, 2 * n3), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(p) for p in pB],
        out_specs=[
            pl.BlockSpec((1, n1, yt, 2 * n3), lambda t, b: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=b_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ar, ai, Tfp, *pB)

    # ---- kernel C (fused): coil fastest; output accumulates in VMEM -----
    pC = st5.packs + st6.packs
    c_out = [jax.ShapeDtypeStruct((S, n1, n2, n3), jnp.float32)] * 2
    cr, ci = pl.pallas_call(
        _make_kernel_C_fused(st5, st6, unroll=unroll),
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
        ] + [full(p) for p in pC],
        out_specs=[
            pl.BlockSpec((1, zt, n2, n3), lambda s, t, c: (s, t, 0, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=c_out,
        compiler_params=cparams,
        interpret=interpret,
    )(br, bi, mnr, mni, *pC)

    out = lax.complex(cr, ci)
    if sig_ax and not sigma:
        out = from_sigma_basis(out, sig_ax)
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "sigma"))
def toeplitz_apply_pallas(Tfp, u, interpret=False, sigma=False):
    """crop(IFFT(Tf * FFT(pad_2x(u)))) via three fused Pallas kernels.

    u:   (B, n1, n2, n3) complex64
    Tfp: (2n2, 2n1, 2n3) float32 — ``pallas_spectrum(Tf)`` layout.
    Returns (B, n1, n2, n3) complex64.

    sigma: sigma-basis contract for radix (> 128) axes — see
    ``sense_normal_pallas``.
    """
    B, n1, n2, n3 = u.shape
    assert pallas_supported((n1, n2, n3)), (n1, n2, n3)
    xt = yt = zt = _TILE
    unroll = _stage_unroll((n1, n2, n3), interpret)
    sig_ax = tuple(1 + ax for ax in _sigma_axes((n1, n2, n3)))

    st1 = _get_stage(n1, "fwd_T")
    st2 = _get_stage(n2, "fwd_M")
    st3 = _get_stage(n3, "fwd_T")
    st4 = _get_stage(n1, "inv_M")
    st5 = _get_stage(n2, "inv_M")
    st6 = _get_stage(n3, "inv_T")

    if sig_ax and not sigma:
        u = to_sigma_basis(u, sig_ax)

    # entry transpose to x-major (fused with the re/im split by XLA)
    ut = jnp.transpose(u, (0, 3, 1, 2))
    ur, ui = jnp.real(ut), jnp.imag(ut)

    full = lambda a: pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    # v5e has 128MB VMEM; the default 16MB scoped limit is too tight for
    # the 8-deep tiles + double buffering
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- kernel A: (B, x, z, y) -> (B, Y, x, Z) -------------------------
    pA = st1.packs + st2.packs
    a_out = [jax.ShapeDtypeStruct((B, 2 * n2, n3, 2 * n1), jnp.float32)] * 2
    ar, ai = pl.pallas_call(
        _make_kernel_A(st1, st2, unroll=unroll),
        grid=(B, n3 // xt),
        in_specs=[
            pl.BlockSpec((1, xt, n1, n2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt, n1, n2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(p) for p in pA],
        out_specs=[
            pl.BlockSpec((1, 2 * n2, xt, 2 * n1),
                         lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=a_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ur, ui, *pA)

    # ---- kernel B: (B, Y, x, Z) -> (B, z, Y, X) -------------------------
    # grid: Y-tiles slowest so the Tf block is revisited across B
    pB = st3.packs + st4.packs
    b_out = [jax.ShapeDtypeStruct((B, n1, 2 * n2, 2 * n3), jnp.float32)] * 2
    br, bi = pl.pallas_call(
        _make_kernel_B(st3, st4, unroll=unroll),
        grid=(2 * n2 // yt, B),
        in_specs=[
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yt, n3, 2 * n1), lambda t, b: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yt, 2 * n1, 2 * n3), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(p) for p in pB],
        out_specs=[
            pl.BlockSpec((1, n1, yt, 2 * n3), lambda t, b: (b, 0, t, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=b_out,
        compiler_params=cparams,
        interpret=interpret,
    )(ar, ai, Tfp, *pB)

    # ---- kernel C: (B, z, Y, X) -> (B, z, y, x) -------------------------
    pC = st5.packs + st6.packs
    c_out = [jax.ShapeDtypeStruct((B, n1, n2, n3), jnp.float32)] * 2
    cr, ci = pl.pallas_call(
        _make_kernel_C(st5, st6, unroll=unroll),
        grid=(B, n1 // zt),
        in_specs=[
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zt, 2 * n2, 2 * n3),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(p) for p in pC],
        out_specs=[
            pl.BlockSpec((1, zt, n2, n3), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)] * 2,
        out_shape=c_out,
        compiler_params=cparams,
        interpret=interpret,
    )(br, bi, *pC)

    out = lax.complex(cr, ci)
    if sig_ax and not sigma:
        out = from_sigma_basis(out, sig_ax)
    return out
