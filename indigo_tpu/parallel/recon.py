"""Sharded many-slice batched SENSE reconstruction (BASELINE config 5).

The compute is written once in plain jnp over a (slice, coil, *image) batch;
scale-out is pure sharding annotation: slices ride the 'slice' mesh axis
(data parallel), coils ride the 'coil' axis (the coil-combination sum
becomes an XLA psum over ICI). The CG loop uses per-slice inner products so
every slice converges at its own rate inside one compiled loop.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import cplx

__all__ = [
    "sense_normal_batched", "batched_cg", "sense_batch_recon",
    "sense_normal_volsharded", "sense_vol_recon",
    "sense_normal_volsharded2", "sense_vol_recon2",
]


def sense_normal_batched(Tf, maps, xs, coil_chunk=None, layout="raw",
                         sigma=False):
    """Batched Toeplitz SENSE normal op.

    Tf:   (*2N)      real   — Toeplitz spectrum (replicated)
    maps: (nc, *N)   complex — coil maps ('coil'-sharded)
    xs:   (S, n)     complex — S slice images, flattened ('slice'-sharded)
    returns (S, n).

    ``coil_chunk``: process coils in chunks of this size with a lax.scan
    accumulator — bounds the doubled-grid working set to
    S*coil_chunk*(2N)^d so 256^3 volumes fit one chip's HBM.

    ``layout``: how Tf is stored. "raw" (natural frequency order) permutes
    it on device once per trace (hoisted out of solver loops by XLA);
    "block" means the caller already applied ``ops.dft_fft.block_spectrum``
    host-side. Both run the MXU matmul-DFT pipeline (ops/dft_fft.py).
    "pallas" means the caller applied ``ops.dft_pallas.pallas_spectrum``
    and the fused Pallas kernels run (3D TPU fast path — bench.py,
    SenseRecon). "fft" keeps the per-axis jnp.fft path
    (ops/toeplitz_fft.py) for cross-checks.

    ``sigma`` (pallas layout, radix volumes only): xs' image axes > 128
    are in sigma (even|odd block) order and the result is returned in the
    same basis — lets CG loops skip the per-iteration HBM reorders the
    radix-2 kernels otherwise need (see ops/dft_pallas.py layout notes).
    """
    import jax as _jax
    from ..ops.dft_fft import toeplitz_apply_block, block_perm
    from ..ops.dft_pallas import sense_normal_pallas
    from ..ops.toeplitz_fft import fft_pad2x, ifft_crop2x

    img_shape = maps.shape[1:]
    nd = len(img_shape)
    nc = maps.shape[0]
    S = xs.shape[0]
    v = xs.reshape((S,) + img_shape)
    axes = tuple(range(2, 2 + nd))
    assert not (sigma and layout != "pallas"), \
        "sigma basis is a pallas-path contract"

    if layout == "raw":
        Tf = Tf[np.ix_(*(block_perm(int(s)) for s in Tf.shape))]
        layout = "block"

    def chunk_contrib(m):
        # m: (cc, *img) -> sum_c conj(m_c) * Toep(m_c * v) : (S, *img)
        if layout == "pallas":
            # coil multiply + combine fused INTO kernels A/C: the u = m*v
            # intermediate and the per-coil combine never touch HBM
            return sense_normal_pallas(
                Tf, m, v.astype(jnp.complex64),
                interpret=_jax.default_backend() == "cpu",
                sigma=sigma)
        u = m[None] * v[:, None]
        cc = m.shape[0]
        if layout == "block":
            u = toeplitz_apply_block(
                Tf, u.reshape((S * cc,) + img_shape)
            ).reshape((S, cc) + img_shape)
        else:
            U = fft_pad2x(u, axes)
            U = Tf[None, None] * U
            u = ifft_crop2x(U, axes)
        return jnp.sum(jnp.conj(m)[None] * u, axis=1)

    if coil_chunk is not None:
        # inside shard_map nc is the SHARD-LOCAL coil count; snap the chunk
        # to a divisor of it so a globally-valid setting never traps
        import math
        coil_chunk = math.gcd(int(coil_chunk), nc)
    if coil_chunk is None or coil_chunk >= nc:
        out = chunk_contrib(maps)
    else:
        mchunks = maps.reshape((nc // coil_chunk, coil_chunk) + img_shape)

        def body(acc, m):
            return acc + chunk_contrib(m), None

        # seed the carry with the first chunk's contribution so its
        # varying-axes type matches the body output under shard_map
        # (coil_chunk < nc here, so there are always >= 2 chunks)
        out, _ = lax.scan(body, chunk_contrib(mchunks[0]), mchunks[1:])
    return out.reshape(S, -1).astype(xs.dtype)


def batched_cg(matvec, rhs, lamda=0.0, iters=20, psum_axis=None, tol=0.0,
               precond=None, return_iters=False):
    """Per-slice CG with (leading-axis) inner products, optional tol stop
    and preconditioning.

    rhs (S, n): solves (M + lamda I) x_s = rhs_s for every slice jointly in
    one lax.scan — the whole multi-slice solve is a single XLA program.
    Returns (xs, resids) with resids (iters, S); with ``return_iters=True``
    additionally the per-slice iteration counts (S,) int32.

    ``tol`` > 0 adds the on-device freeze-after-converge pattern (the same
    one as :func:`indigo_tpu.solvers.cg`'s history path): once a slice's
    relative residual drops below tol its state is frozen for the remaining
    scan steps, so the solve costs maxiter trips through the scan but each
    converged slice stops changing (and ``iters`` reports the count
    actually taken). tol == 0 (default) traces no convergence machinery.

    ``precond``: callable z = M^{-1}(r) applied per iteration (Jacobi et
    al.); must be positive definite. ``psum_axis``: when the feature
    dimension itself is sharded (volume/tensor parallelism inside
    shard_map), inner products must reduce across shards — pass the mesh
    axis name (the done mask is then identical on every shard, keeping the
    frozen state consistent).
    """
    def mv(v):
        out = matvec(v)
        if not (isinstance(lamda, (int, float)) and lamda == 0):
            out = out + lamda * v
        return out

    applyM = precond if precond is not None else (lambda r: r)

    def pdot(a, b):  # per-slice real inner product -> (S, 1)
        d = jnp.sum(jnp.real(jnp.conj(a) * b), axis=-1, keepdims=True)
        if psum_axis is not None:
            d = jax.lax.psum(d, psum_axis)
        return d

    track = tol > 0  # static
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = applyM(r0)
    rz0 = pdot(r0, z0)
    rs0 = pdot(r0, r0)
    bnorm = jnp.sqrt(rs0)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    def step(x, r, p, rz):
        Ap = mv(p)
        denom = pdot(p, Ap)
        alpha = rz / jnp.maximum(denom, 1e-30)
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * Ap
        z = applyM(r)
        rz_n = pdot(r, z)
        beta = rz_n / jnp.maximum(rz, 1e-30)
        p = z + beta.astype(p.dtype) * p
        return x, r, p, rz_n, pdot(r, r)

    def body(carry, _):
        x, r, p, rz, rs, k, done = carry
        if track:
            xn, rn, pn, rzn, rsn = step(x, r, p, rz)
            new_done = done | (jnp.sqrt(rsn) <= tol * bnorm)
            x, r, p, rz, rs = jax.tree.map(
                lambda new, old: jnp.where(done, old, new),
                (xn, rn, pn, rzn, rsn), (x, r, p, rz, rs))
            k = jnp.where(done[:, 0], k, k + 1)
        else:
            x, r, p, rz, rs = step(x, r, p, rz)
            new_done = done
            k = k + 1
        return (x, r, p, rz, rs, k, new_done), jnp.sqrt(rs[:, 0])

    S = rhs.shape[0]
    done0 = (jnp.sqrt(rs0) <= tol * bnorm) if track \
        else jnp.zeros((S, 1), bool)
    (x, r, p, rz, rs, k, _), resids = lax.scan(
        body, (x0, r0, z0, rz0, rs0, jnp.zeros((S,), jnp.int32), done0),
        None, length=iters)
    if return_iters:
        return x, resids, k
    return x, resids


@functools.lru_cache(maxsize=32)
def _batch_recon_fn(mesh, lamda, iters, coil_chunk):
    """Compiled solver cache: one executable per (mesh, solver config) —
    repeated sense_batch_recon calls with the same config reuse it instead
    of re-tracing the whole CG program every call."""

    def run(Tf, maps, rhs):
        xs, resids = batched_cg(
            lambda v: sense_normal_batched(Tf, maps, v,
                                           coil_chunk=coil_chunk),
            rhs, lamda=lamda, iters=iters)
        return xs, resids

    if mesh is None:
        return cplx.cjit(run)

    # shard_map SPMD: the whole CG loop runs per-device on its (slice, coil)
    # shard; the only collective is the psum coil-combine inside the matvec.
    # (GSPMD auto-partitioning also works on TPU, but the CPU test backend's
    # FFT thunk rejects partition-induced layouts, and explicit SPMD keeps
    # the collective schedule predictable.)
    from jax import shard_map

    def block(Tf, maps_l, rhs_l):
        def mv(v):
            return jax.lax.psum(
                sense_normal_batched(Tf, maps_l, v,
                                     coil_chunk=coil_chunk), "coil")
        return batched_cg(mv, rhs_l, lamda=lamda, iters=iters)

    def run_sharded(Tf, maps, rhs):
        return shard_map(
            block, mesh=mesh,
            in_specs=(P(), P("coil"), P("slice")),
            out_specs=(P("slice"), P(None, "slice")),
        )(Tf, maps, rhs)

    return cplx.cjit(run_sharded)


def sense_batch_recon(Tf, maps, rhs, mesh=None, lamda=0.0, iters=20,
                      coil_chunk=None):
    """Many-slice SENSE recon: jit + shard the batched CG over a mesh.

    Tf (*2N) real, maps (nc, *N) complex-or-CPair, rhs (S, n) complex.
    With ``mesh`` (axes 'slice' and 'coil'), the whole solve runs as one
    shard_map SPMD program. Complex inputs may be numpy; outputs come back
    host-side complex. Compiled executables are cached per (mesh, lamda,
    iters, coil_chunk).
    """
    fn = _batch_recon_fn(mesh, float(lamda), int(iters),
                         None if coil_chunk is None else int(coil_chunk))
    if mesh is None:
        return fn(Tf, maps, rhs)
    # to_numpy reassembles CPair inputs (and passes plain arrays through) so
    # the mesh path accepts the same complex-or-CPair inputs as mesh=None
    return fn(np.asarray(Tf), cplx.to_numpy(maps), cplx.to_numpy(rhs))


def sense_normal_volsharded(Tf_l, maps_l, v_l, axis_name="vol"):
    """Toeplitz SENSE normal op for ONE volume sharded over its z-axis
    (tensor/model parallelism for volumes too large for one chip's HBM).

    Call INSIDE shard_map with specs (3D volumes):
      Tf_l   (2Nz, 2Ny/p, 2Nx)  <- P(None, axis, None)
      maps_l (nc, Nz/p, Ny, Nx) <- P(None, axis, None, None)
      v_l    (Nz/p, Ny, Nx)     <- P(axis, None, None)

    Algorithm per coil: multiply map; zero-aware padded FFT over the LOCAL
    axes (y, x); all_to_all so z becomes local (splitting the now-doubled y
    axis); zero-aware padded FFT over z; multiply the matching Tf shard;
    inverse transforms mirrored. Communication = two all_to_all transposes
    over ICI per direction — the distributed-NUFFT decomposition
    (PAPERS.md) specialized to the Toeplitz round trip.
    """
    from ..ops.toeplitz_fft import fft_pad2x, ifft_crop2x

    nc = maps_l.shape[0]

    def per_coil(acc, m):
        u = m * v_l                                   # (Nz/p, Ny, Nx)
        u = fft_pad2x(u, (1, 2))                      # (Nz/p, 2Ny, 2Nx)
        u = jax.lax.all_to_all(u, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)            # (Nz, 2Ny/p, 2Nx)
        u = fft_pad2x(u, (0,))                        # (2Nz, 2Ny/p, 2Nx)
        u = Tf_l * u
        u = ifft_crop2x(u, (0,))                      # (Nz, 2Ny/p, 2Nx)
        u = jax.lax.all_to_all(u, axis_name, split_axis=0, concat_axis=1,
                               tiled=True)            # (Nz/p, 2Ny, 2Nx)
        u = ifft_crop2x(u, (1, 2))                    # (Nz/p, Ny, Nx)
        return acc + jnp.conj(m) * u, None

    out0, _ = per_coil(jnp.zeros_like(v_l), maps_l[0])
    if nc > 1:
        out, _ = lax.scan(per_coil, out0, maps_l[1:])
    else:
        out = out0
    return out


def sense_normal_volsharded2(Tf_l, maps_l, v_l, axes=("vz", "vy")):
    """Toeplitz SENSE normal op for ONE volume PENCIL-sharded over two mesh
    axes — scales a single volume past p <= Nz chips (the slab form's
    limit; SURVEY.md §5 long-context row).

    Call INSIDE shard_map over mesh axes (a, b) = ``axes`` with specs:
      Tf_l   (2Nz, 2Ny/p, 2Nx/q)   <- P(None, a, b)
      maps_l (nc, Nz/p, Ny/q, Nx)  <- P(None, a, b, None)
      v_l    (Nz/p, Ny/q, Nx)      <- P(a, b, None)

    Per coil: multiply map; zero-aware padded FFT over the LOCAL x axis;
    all_to_all over ``b`` (2Nx splits, Y gathers); padded FFT over y;
    all_to_all over ``a`` (2Ny splits, Z gathers); padded FFT over z;
    multiply the Tf pencil; mirrored inverse. Communication = four
    all_to_alls per direction per coil, all riding ICI — the pencil
    decomposition of the distributed-NUFFT pattern (PAPERS.md)
    specialized to the Toeplitz round trip.
    """
    from ..ops.toeplitz_fft import fft_pad2x, ifft_crop2x

    a, b = axes
    nc = maps_l.shape[0]

    def per_coil(acc, m):
        u = m * v_l                                   # (Nz/p, Ny/q, Nx)
        u = fft_pad2x(u, (2,))                        # (Nz/p, Ny/q, 2Nx)
        u = jax.lax.all_to_all(u, b, split_axis=2, concat_axis=1,
                               tiled=True)            # (Nz/p, Ny, 2Nx/q)
        u = fft_pad2x(u, (1,))                        # (Nz/p, 2Ny, 2Nx/q)
        u = jax.lax.all_to_all(u, a, split_axis=1, concat_axis=0,
                               tiled=True)            # (Nz, 2Ny/p, 2Nx/q)
        u = fft_pad2x(u, (0,))                        # (2Nz, 2Ny/p, 2Nx/q)
        u = Tf_l * u
        u = ifft_crop2x(u, (0,))                      # (Nz, 2Ny/p, 2Nx/q)
        u = jax.lax.all_to_all(u, a, split_axis=0, concat_axis=1,
                               tiled=True)            # (Nz/p, 2Ny, 2Nx/q)
        u = ifft_crop2x(u, (1,))                      # (Nz/p, Ny, 2Nx/q)
        u = jax.lax.all_to_all(u, b, split_axis=1, concat_axis=2,
                               tiled=True)            # (Nz/p, Ny/q, 2Nx)
        u = ifft_crop2x(u, (2,))                      # (Nz/p, Ny/q, Nx)
        return acc + jnp.conj(m) * u, None

    out0, _ = per_coil(jnp.zeros_like(v_l), maps_l[0])
    if nc > 1:
        out, _ = lax.scan(per_coil, out0, maps_l[1:])
    else:
        out = out0
    return out


@functools.lru_cache(maxsize=32)
def _vol_recon2_fn(mesh, axes, lamda, iters):
    from jax import shard_map

    a, b = axes

    def block(Tf_l, maps_l, rhs_l):
        def mv(v):
            out = sense_normal_volsharded2(
                Tf_l, maps_l, v.reshape(maps_l.shape[1:]), axes)
            return out.reshape(1, -1)

        xs, resids = batched_cg(mv, rhs_l.reshape(1, -1), lamda=lamda,
                                iters=iters, psum_axis=(a, b))
        return xs.reshape(maps_l.shape[1:]), resids[:, 0]

    def run(Tf, maps, rhs):
        return shard_map(
            block, mesh=mesh,
            in_specs=(P(None, a, b),          # Tf: pencil on (y, x)
                      P(None, a, b, None),    # maps: pencil on (z, y)
                      P(a, b, None)),         # volume: pencil on (z, y)
            out_specs=(P(a, b, None), P()),
        )(Tf, maps, rhs)

    return cplx.cjit(run)


def sense_vol_recon2(Tf, maps, rhs, mesh, axes=("vz", "vy"), lamda=0.0,
                     iters=20):
    """CG-SENSE for ONE 3D volume pencil-sharded over TWO mesh axes.

    Same contract as :func:`sense_vol_recon` but the volume is sharded
    (z over ``axes[0]`` size p, y over ``axes[1]`` size q) so a single
    volume scales over p*q chips. Inner products psum over both axes.
    Requires Nz % p == 2Ny % p == Ny % q == 2Nx % q == 0.
    """
    img_shape = maps.shape[1:]
    if len(img_shape) != 3:
        raise ValueError("sense_vol_recon2 supports 3D volumes")
    a, b = axes
    p, q = mesh.shape[a], mesh.shape[b]
    Nz, Ny, Nx = img_shape
    if Nz % p or (2 * Ny) % p or Ny % q or (2 * Nx) % q:
        raise ValueError(
            f"volume {img_shape} not compatible with mesh axes {a}={p}, "
            f"{b}={q}: need Nz%p == 2Ny%p == Ny%q == 2Nx%q == 0")
    fn = _vol_recon2_fn(mesh, tuple(axes), float(lamda), int(iters))
    return fn(np.asarray(Tf), cplx.to_numpy(maps), cplx.to_numpy(rhs))


@functools.lru_cache(maxsize=32)
def _vol_recon_fn(mesh, axis_name, lamda, iters):
    from jax import shard_map

    def block(Tf_l, maps_l, rhs_l):
        def mv(v):
            out = sense_normal_volsharded(
                Tf_l, maps_l, v.reshape(maps_l.shape[1:]), axis_name)
            return out.reshape(1, -1)

        xs, resids = batched_cg(mv, rhs_l.reshape(1, -1), lamda=lamda,
                                iters=iters, psum_axis=axis_name)
        return xs.reshape(maps_l.shape[1:]), resids[:, 0]

    def run(Tf, maps, rhs):
        return shard_map(
            block, mesh=mesh,
            in_specs=(P(None, axis_name, None),   # Tf: shard dim 1 (y)
                      P(None, axis_name, None, None),  # maps: shard z
                      P(axis_name, None, None)),       # volume: shard z
            out_specs=(P(axis_name, None, None), P()),
        )(Tf, maps, rhs)

    return cplx.cjit(run)


def sense_vol_recon(Tf, maps, rhs, mesh, axis_name="vol", lamda=0.0,
                    iters=20):
    """CG-SENSE for ONE 3D volume sharded over ``axis_name`` of ``mesh``.

    Tf (*2N) real, maps (nc, *N), rhs (*N) complex/numpy. The whole CG runs
    inside one shard_map program; inner products psum over the volume axis.
    Returns (x (*N) host-complex, resids (iters,)). Compiled executables
    are cached per (mesh, axis, lamda, iters).
    """
    img_shape = maps.shape[1:]
    if len(img_shape) != 3:
        raise ValueError(
            f"sense_vol_recon supports 3D volumes, got {img_shape}; use "
            "sense_batch_recon for 2D problems")
    p = mesh.shape[axis_name]
    if img_shape[0] % p or (2 * img_shape[1]) % p:
        raise ValueError(
            f"z ({img_shape[0]}) must be divisible by the mesh axis size "
            f"{p}, and 2*Ny ({2 * img_shape[1]}) by {p} for the all_to_all "
            "transpose")

    fn = _vol_recon_fn(mesh, axis_name, float(lamda), int(iters))
    return fn(np.asarray(Tf), cplx.to_numpy(maps), cplx.to_numpy(rhs))
