"""indigo_tpu — a TPU-native structured linear-operator framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of
``mbdriscoll/indigo`` (structured linear operators for iterative MRI image
reconstruction). See SURVEY.md at the repo root for the reference analysis
and the TPU-first design translation.

Quick start::

    import indigo_tpu as it
    F = it.UnscaledFFT((128, 128))
    P = it.SpMatrix(mask_csr)          # k-space sampling
    A = P * F
    AHA = A.H * A
    x, info = it.solvers.cg(AHA, A.H * y, maxiter=50)
"""
from . import (
    operators, transforms, analyses, solvers, sparse, utils, cplx,
    noncart, oracle, models, wavelet, toeplitz, parallel, backends, native,
    profiling, checkpoint,
)
from .backends import get_backend, available_backends
from .operators import (
    Operator, SpMatrix, KBInterp, DenseMatrix, Diag, UnscaledFFT,
    CenteredDFT, GridDFT, Eye, One, Mask,
    CropPad, Perm, Product, Adjoint, KronI, BlockDiag, VStack, HStack, Scale,
)
from .solvers import cg, apgd, fista, max_eigen, soft_thresh
from .wavelet import DWT
from .sparse import BlockedELL, csr_to_bell, bell_spmm

__version__ = "0.1.0"
