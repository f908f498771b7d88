"""Native C++ gridding builder vs the numpy reference implementation."""
import numpy as np
import pytest

from indigo_tpu import native, noncart
from indigo_tpu.utils import rel_err

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


@pytest.mark.parametrize("ndim,grid", [(1, (64,)), (2, (32, 48)),
                                       (3, (16, 16, 16))])
@pytest.mark.parametrize("width", [3, 4, 6])
def test_native_matches_numpy(ndim, grid, width, rng):
    traj = (rng.random((200, ndim)) - 0.5)
    beta = noncart.beatty_beta(width, 1.5)
    A_nat = noncart.interp_mat(traj, grid, width=width, beta=beta,
                               impl="native")
    A_np = noncart.interp_mat(traj, grid, width=width, beta=beta,
                              impl="numpy")
    d = abs(A_nat - A_np)
    # A&S polynomial i0 vs numpy i0: agree to ~1e-6 relative
    assert d.max() < 1e-5
    assert A_nat.nnz == A_np.nnz


def test_native_threads():
    assert native._load().native_num_threads() >= 1


def test_native_wraparound(rng):
    """Samples at the edge of k-space wrap periodically, same as numpy."""
    traj = np.array([[-0.4999], [0.4999], [0.0]])
    A_nat = noncart.interp_mat(traj, (32,), width=4, impl="native")
    A_np = noncart.interp_mat(traj, (32,), width=4, impl="numpy")
    assert abs(A_nat - A_np).max() < 1e-5
