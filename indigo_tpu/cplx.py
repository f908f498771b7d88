"""Split-complex support: complex data as (re, im) float32 pairs.

TPU hardware has no native complex type; XLA lowers complex arithmetic to
real pairs *inside* a compiled computation, but on the TPU runtime used here
complex buffers cannot exist at the host<->device boundary at all (eager
complex ops and complex jit inputs/outputs fail with UNIMPLEMENTED).

This module makes that invisible to users:

  * :class:`CPair` — a registered pytree holding the re/im float planes.
    Every operator stores complex payloads (diagonals, dense blocks, ELL
    tiles, scalars) as CPair, so an operator pytree contains only real
    leaves and can cross the jit/sharding boundary on any backend.
  * :func:`pack` / :func:`unpack` — convert complex arrays to/from CPair.
    ``unpack`` is called inside traced code (lax.complex), never eagerly on
    TPU.
  * :func:`cjit` — jit wrapper whose public boundary is complex-friendly:
    complex args are split on the host before transfer, complex outputs are
    returned as host numpy arrays. Inside, your function sees ordinary
    complex jnp arrays.

There is no reference-repo counterpart: the reference's CUDA/MKL backends
had native complex BLAS. This module is the TPU-native answer to the same
requirement (SURVEY.md §7 hard part: "matching numpy in complex64 on TPU").
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_pytree_node_class

__all__ = [
    "CPair", "pack", "unpack", "as_payload", "iscpair", "conj", "to_numpy",
    "cjit", "device_put_tree", "supports_complex_buffers", "eager_call",
]


@register_pytree_node_class
class CPair:
    """Split-complex array: two same-shaped real planes (re, im)."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def size(self):
        return self.re.size

    @property
    def dtype(self):
        return jnp.dtype(jnp.complex64 if self.re.dtype == jnp.float32
                         else jnp.complex128)

    @property
    def nbytes(self):
        return self.re.nbytes + self.im.nbytes

    def ravel(self):
        return CPair(self.re.ravel(), self.im.ravel())

    def reshape(self, *shape):
        return CPair(self.re.reshape(*shape), self.im.reshape(*shape))

    def conj(self):
        return CPair(self.re, -self.im)

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"CPair(shape={self.shape}, dtype={self.dtype})"


def iscpair(x):
    return isinstance(x, CPair)


def _is_complex(x):
    try:
        return jnp.issubdtype(jnp.asarray(x).dtype if isinstance(x, (int, float, complex)) else x.dtype,
                              jnp.complexfloating)
    except Exception:
        return isinstance(x, complex)


def pack(x):
    """complex array/scalar -> CPair of f32 planes; real/CPair pass through.

    Host numpy complex input never touches the device as a complex buffer:
    the planes are extracted in numpy first.
    """
    if iscpair(x):
        return x
    if isinstance(x, complex) or (np.isscalar(x) and _is_complex(x)):
        return CPair(jnp.float32(np.real(x)), jnp.float32(np.imag(x)))
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return CPair(jnp.asarray(np.ascontiguousarray(x.real), jnp.float32),
                     jnp.asarray(np.ascontiguousarray(x.imag), jnp.float32))
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        return CPair(jnp.real(x).astype(jnp.float32),
                     jnp.imag(x).astype(jnp.float32))
    if isinstance(x, jax.core.Tracer) and jnp.iscomplexobj(x):
        return CPair(jnp.real(x), jnp.imag(x))
    return x


def as_payload(x):
    """Store-form of an array payload: CPair if complex, else a jnp array."""
    if iscpair(x):
        return x
    if _leaf_complex(x) or isinstance(x, complex):
        return pack(x)
    return jnp.asarray(x)


def unpack(x):
    """CPair -> complex array (trace-safe); everything else passes through."""
    if iscpair(x):
        return lax.complex(x.re, x.im)
    return x


def conj(x):
    """Conjugate a payload without creating eager complex buffers."""
    if iscpair(x):
        return CPair(x.re, -x.im)
    if _is_complex(x):
        return jnp.conj(x) if isinstance(x, (jax.Array, jax.core.Tracer)) else np.conj(x)
    return x


def to_numpy(x):
    """Payload -> host numpy (complex for CPair), with no device complex."""
    if iscpair(x):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x)


@functools.cache
def supports_complex_buffers():
    """Can this backend hold complex arrays at the host<->device boundary?

    Decided from the platform name, NOT by probing: on the TPU runtime a
    single failed complex-buffer allocation poisons the process (every
    subsequent transfer then fails UNIMPLEMENTED), so probing is destructive.
    """
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return True
    return plat in ("cpu", "gpu", "cuda", "rocm", "METAL")


def _encode(tree):
    """Split every complex leaf into a CPair (host-side, pre-transfer)."""
    return jax.tree_util.tree_map(
        lambda l: pack(l) if _leaf_complex(l) else l, tree,
        is_leaf=iscpair)


def device_put_tree(tree):
    """Upload a pytree (e.g. an operator) ONCE, complex-safely.

    Complex leaves become device-resident CPairs; pass the result as a
    ``cjit`` argument so large payloads are jit INPUTS rather than traced
    constants (500MB of embedded constants breaks this sandbox's remote
    compile service) and are never re-uploaded per call.
    """
    return jax.device_put(_encode(tree))


def _leaf_complex(l):
    if iscpair(l):
        return False
    if isinstance(l, (np.ndarray, jax.Array, jax.core.Tracer)):
        return jnp.issubdtype(l.dtype, jnp.complexfloating)
    return isinstance(l, complex)


def _decode_traced(tree):
    """Inside jit: CPair leaves -> complex tracers."""
    return jax.tree_util.tree_map(unpack, tree, is_leaf=iscpair)


def _decode_host(tree):
    """Outside jit: CPair leaves -> host numpy complex arrays."""
    return jax.tree_util.tree_map(
        lambda l: to_numpy(l) if iscpair(l) else l, tree, is_leaf=iscpair)


def cjit(fun):
    """jit with a complex-safe public boundary.

    Complex args are split to f32 pairs on the host before device transfer;
    complex outputs come back as host numpy complex arrays. Real args/outputs
    are untouched (and stay on device). ``fun`` itself sees ordinary complex
    jnp arrays — write it as if complex were natively supported. Python
    scalars/bools in kwargs are traced; bind static flags with
    ``functools.partial`` before wrapping.
    """

    @jax.jit
    def inner(args, kwargs):
        args, kwargs = _decode_traced((args, kwargs))
        out = fun(*args, **kwargs)
        return _encode(out)

    @functools.wraps(fun)
    def caller(*args, **kwargs):
        out = inner(*_encode((args, kwargs)))
        return _decode_host(out)

    return caller


def eager_call(fun, *args, **kwargs):
    """Call ``fun`` now: directly if inside a trace or complex is supported,
    otherwise through a one-shot complex-safe jit."""
    leaves = jax.tree_util.tree_leaves((args, kwargs))
    traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
    if traced or supports_complex_buffers():
        return fun(*args, **kwargs)
    return cjit(fun)(*args, **kwargs)
