"""Tile-gather KB interpolation vs the CSR/scipy oracle (SURVEY.md §4).

The tile path (ops/tile_interp.py, KBInterp leaf) must agree with the
interp_mat CSR — same geometry, same weights — to f32 rounding, in both
directions, for every rank, including wraparound samples and the chunked
execution path.
"""
import numpy as np
import pytest

from indigo_tpu import noncart, oracle
from indigo_tpu.models import nufft_op
from indigo_tpu.operators import KBInterp, SpMatrix
from indigo_tpu.ops.tile_interp import plan_tile_interp, tile_interp_apply
from indigo_tpu.utils import rand64c, rel_err


def traj_with_wrap(m, d, rng):
    """Random trajectory forcing samples whose KB patch wraps the grid."""
    traj = (rng.random((m, d)) - 0.5).astype(np.float64)
    k = m // 8
    traj[:k] = -0.5 + 0.01 * rng.random((k, d))
    traj[k:2 * k] = 0.4999 - 0.01 * rng.random((k, d))
    return traj


@pytest.mark.parametrize("grid,width", [
    ((12, 16, 24), 4), ((24, 32), 4), ((256,), 4),
    ((16, 16, 16), 6), ((20, 48), 6),
    # 1D grids below ~1.5 tiles: halo extent exceeds 2G, exercising the
    # multi-wrap modular fold in untile_grid (regression: adjoint crashed)
    ((128,), 4), ((160,), 4),
])
def test_tile_interp_matches_csr(grid, width, rng):
    d = len(grid)
    traj = traj_with_wrap(300, d, rng)
    beta = noncart.beatty_beta(width, 1.5)
    A = noncart.interp_mat(traj, grid, width=width, beta=beta, impl="numpy")
    plan = plan_tile_interp(traj, grid, width=width, beta=beta)
    N = int(np.prod(grid))
    x = rand64c(N, 3, rng=rng)
    y = rand64c(300, 3, rng=rng)
    fwd = np.asarray(tile_interp_apply(plan, x))
    assert rel_err(fwd, A @ x) < 1e-5
    adj = np.asarray(tile_interp_apply(plan, y, adjoint=True))
    assert rel_err(adj, A.conj().T @ y) < 1e-5
    # chunked path takes the lax.scan/map branch
    fwd_c = np.asarray(tile_interp_apply(plan, x, chunk=64))
    adj_c = np.asarray(tile_interp_apply(plan, y, adjoint=True, chunk=64))
    assert rel_err(fwd_c, fwd) < 1e-6
    assert rel_err(adj_c, adj) < 1e-6


def test_tile_interp_reorder_matches_csr(rng):
    """reorder=True permutes the plan's sample order to group-major;
    composing plan.sample_perm restores the caller's row mapping exactly
    (the nufft_op tile path relies on this)."""
    grid = (12, 16, 24)
    traj = traj_with_wrap(300, 3, rng)
    beta = noncart.beatty_beta(4, 1.5)
    A = noncart.interp_mat(traj, grid, width=4, beta=beta, impl="numpy")
    plan = plan_tile_interp(traj, grid, width=4, beta=beta, reorder=True)
    sp = plan.sample_perm
    assert sp is not None and plan.fgroups.ginv is None
    N = int(np.prod(grid))
    x = rand64c(N, 3, rng=rng)
    y = rand64c(300, 3, rng=rng)
    fwd = np.asarray(tile_interp_apply(plan, x))      # rows in plan order
    assert rel_err(fwd, (A @ x)[sp]) < 1e-5
    adj = np.asarray(tile_interp_apply(plan, y[sp], adjoint=True))
    assert rel_err(adj, A.conj().T @ y) < 1e-5


def test_plan_sample_perm_survives_pytree_roundtrip(rng):
    """sample_perm is static aux data: device_put / flatten-unflatten must
    preserve it (round-3 advisory: it was silently reset to None)."""
    import jax

    grid = (12, 16, 24)
    traj = traj_with_wrap(300, 3, rng)
    plan = plan_tile_interp(traj, grid, width=4, reorder=True)
    assert plan.sample_perm is not None
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.array_equal(plan2.sample_perm, plan.sample_perm)
    plan3 = jax.device_put(plan)
    assert np.array_equal(plan3.sample_perm, plan.sample_perm)
    # explicit chunk on the binned adjoint still matches the CSR oracle
    beta = noncart.beatty_beta(4, 1.5)
    A = noncart.interp_mat(traj, grid, width=4, beta=beta, impl="numpy")
    planb = plan_tile_interp(traj, grid, width=4, beta=beta)
    y = rand64c(300, 2, rng=rng)
    small = np.asarray(tile_interp_apply(planb, y, adjoint=True, chunk=16))
    assert rel_err(small, A.conj().T @ y) < 1e-5


def test_tile_interp_partial_coverage(rng):
    """Trajectory confined to the lower half of one axis: the halo-extended
    extent must still cover grid + low halo (regression: negative wrap-pad
    width crashed the forward apply)."""
    grid = (12, 16, 24)
    traj = traj_with_wrap(200, 3, rng)
    traj[:, 2] = -0.5 + 0.45 * rng.random(200)   # z stays in lower half
    beta = noncart.beatty_beta(4, 1.5)
    A = noncart.interp_mat(traj, grid, width=4, beta=beta, impl="numpy")
    plan = plan_tile_interp(traj, grid, width=4, beta=beta)
    N = int(np.prod(grid))
    x = rand64c(N, 2, rng=rng)
    y = rand64c(200, 2, rng=rng)
    assert rel_err(np.asarray(tile_interp_apply(plan, x)), A @ x) < 1e-5
    assert rel_err(np.asarray(tile_interp_apply(plan, y, adjoint=True)),
                   A.conj().T @ y) < 1e-5


def test_kbinterp_operator_adjoint_identity(rng):
    grid = (10, 12, 16)
    traj = traj_with_wrap(200, 3, rng)
    G = KBInterp(plan_tile_interp(traj, grid, width=4), name="G")
    M, N = G.shape
    assert (M, N) == (200, int(np.prod(grid)))
    x = rand64c(N, 2, rng=rng)
    y = rand64c(M, 2, rng=rng)
    lhs = np.vdot(np.asarray(G * x), y)
    rhs = np.vdot(x, np.asarray(G.H * y))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_kbinterp_real_payload(rng):
    """Real (non-complex) columns take the pure-f32 path."""
    grid = (16, 16)
    traj = traj_with_wrap(100, 2, rng)
    beta = noncart.beatty_beta(4, 1.5)
    A = noncart.interp_mat(traj, grid, width=4, beta=beta, impl="numpy")
    plan = plan_tile_interp(traj, grid, width=4, beta=beta)
    x = rng.standard_normal((256, 5)).astype(np.float32)
    out = np.asarray(tile_interp_apply(plan, x))
    assert rel_err(out, A @ x) < 1e-5


def test_nufft_op_tile_matches_sparse(rng):
    """nufft_op(interp='tile') == nufft_op(interp='sparse') end to end."""
    img_shape = (8, 10, 6)
    traj = traj_with_wrap(60, 3, rng)
    A_t, plan_t = nufft_op(traj, img_shape, oversamp=2.0, width=4,
                           interp="tile")
    A_s, plan_s = nufft_op(traj, img_shape, oversamp=2.0, width=4,
                           interp="sparse")
    # the tile path composes the plan's group-major reorder into perm, so
    # the two perms differ as sequences but map the same trajectory; all
    # comparisons happen in ORIGINAL sample order via the inverses
    assert np.array_equal(np.sort(plan_t.perm), np.sort(plan_s.perm))
    inv_t = np.argsort(plan_t.perm)
    inv_s = np.argsort(plan_s.perm)
    x = rand64c(int(np.prod(img_shape)), 2, rng=rng)
    assert rel_err(np.asarray(A_t * x)[inv_t],
                   np.asarray(A_s * x)[inv_s]) < 1e-5
    y = rand64c(A_t.shape[0], 2, rng=rng)
    assert rel_err(np.asarray(A_t.H * y[plan_t.perm]),
                   np.asarray(A_s.H * y[plan_s.perm])) < 1e-5
    # and the tile chain still matches the direct-DFT oracle (width-4
    # gridding accuracy is ~1e-3)
    s_ref = oracle.nufft_forward(x, plan_t.traj, img_shape)
    assert rel_err(np.asarray(A_t * x), s_ref) < 3e-3


def test_big_volume_two_step_transpose_branch(rng):
    """Shrinking _TILE_SLAB_ELEMS forces the rank-3 two-step (un)retile
    (the big-volume layout-safe path used at 256^3+ serving scale); it
    must agree exactly with the monolithic transpose path."""
    from indigo_tpu.ops import tile_interp as ti

    grid = (12, 16, 24)
    traj = traj_with_wrap(200, 3, rng)
    beta = noncart.beatty_beta(4, 1.5)
    plan = plan_tile_interp(traj, grid, width=4, beta=beta)
    x = rand64c(int(np.prod(grid)), 2, rng=rng)
    y = rand64c(200, 2, rng=rng)
    fwd = np.asarray(tile_interp_apply(plan, x))
    adj = np.asarray(tile_interp_apply(plan, y, adjoint=True))
    old = ti._TILE_SLAB_ELEMS
    try:
        ti._TILE_SLAB_ELEMS = 1 << 10
        fwd2 = np.asarray(tile_interp_apply(plan, x))
        adj2 = np.asarray(tile_interp_apply(plan, y, adjoint=True))
    finally:
        ti._TILE_SLAB_ELEMS = old
    assert rel_err(fwd2, fwd) < 1e-7
    assert rel_err(adj2, adj) < 1e-7


def test_nufft_op_auto_picks_sparse_for_1d(rng):
    """1D problems keep the SpMatrix leaf under interp='auto' (dense
    enough to tile well); 2D+ goes tile-gather (measured faster at every
    benchmarked scale — see nufft_op)."""
    traj = traj_with_wrap(50, 1, rng)
    A, _ = nufft_op(traj, (64,), oversamp=2.0, width=4)
    leaves = [A]
    found = []
    while leaves:
        op = leaves.pop()
        found.append(type(op).__name__)
        leaves.extend(op.children())
    assert "SpMatrix" in found and "KBInterp" not in found


def test_binned_adjoint_matches_scatter(rng):
    """The scatter-free (binned) adjoint == the row-scatter formulation,
    including clustered trajectories (multi-row count classes) and the
    chunked per-class execution branch."""
    from indigo_tpu.ops import tile_interp as ti

    grid = (14, 18, 22)
    traj = traj_with_wrap(400, 3, rng)
    traj[100:300] = traj[0] + 0.003 * rng.random((200, 3))  # dense cluster
    beta = noncart.beatty_beta(4, 1.5)
    p_b = plan_tile_interp(traj, grid, width=4, beta=beta)
    p_s = plan_tile_interp(traj, grid, width=4, beta=beta,
                           adjoint="scatter")
    assert p_b.bins is not None and p_s.bins is None
    y = rand64c(400, 5, rng=rng)
    a_b = np.asarray(tile_interp_apply(p_b, y, adjoint=True))
    a_s = np.asarray(tile_interp_apply(p_s, y, adjoint=True))
    assert rel_err(a_b, a_s) < 1e-6
    # chunked branch: shrink the scratch bound so every class splits
    old = ti._BIN_SCRATCH_ELEMS
    try:
        ti._BIN_SCRATCH_ELEMS = 1 << 12
        p_c = plan_tile_interp(traj, (15, 19, 23), width=4, beta=beta)
        y2 = rand64c(400, 2, rng=rng)
        a_c = np.asarray(tile_interp_apply(p_c, y2, adjoint=True))
        p_c2 = plan_tile_interp(traj, (15, 19, 23), width=4, beta=beta,
                                adjoint="scatter")
        a_c2 = np.asarray(tile_interp_apply(p_c2, y2, adjoint=True))
        assert rel_err(a_c, a_c2) < 1e-6
    finally:
        ti._BIN_SCRATCH_ELEMS = old


def test_nufft_op_auto_choice_at_bench_scales():
    """Pin interp='auto' at the representative benchmark scales: both the
    2D radial workload (bench.py run_gridded_2d geometry) and 3D must land
    on the KBInterp tile-gather leaf (measured faster than the jag SpMM at
    every 2D/3D bench scale) — a silent flip would change the perf class
    without failing any exactness test."""
    def leaf_names(A):
        out, stack = [], [A]
        while stack:
            op = stack.pop()
            out.append(type(op).__name__)
            stack.extend(op.children())
        return out

    n = 128
    nspokes = int(1.5 * n)
    ang = np.pi * np.arange(nspokes) / nspokes
    r = (np.arange(2 * n) - n) / (2 * n)
    traj2 = np.stack([np.outer(np.cos(ang), r).ravel(),
                      np.outer(np.sin(ang), r).ravel()], axis=1)
    tile_leaves = {"KBInterp", "GridDFT"}  # the tile-gather class (GridDFT
    # = KBInterp fused with the padded DFT on periodic tilings)
    A2, _ = nufft_op(traj2, (n, n), oversamp=1.5, width=4)
    names2 = leaf_names(A2)
    assert tile_leaves & set(names2) and "SpMatrix" not in names2

    rng3 = np.random.default_rng(3)
    traj3 = (rng3.random((4096, 3)) - 0.5).astype(np.float64)
    A3, _ = nufft_op(traj3, (32, 32, 32), oversamp=1.25, width=4)
    names3 = leaf_names(A3)
    assert tile_leaves & set(names3) and "SpMatrix" not in names3


def test_tiled_order_is_permutation():
    for grid in [(8, 16), (8, 8, 16), (256,)]:
        p = noncart.tiled_order(grid)
        n = int(np.prod(grid))
        assert sorted(p.tolist()) == list(range(n))


def test_nufft_op_col_tiling_matches_plain(rng):
    """Morton column re-tiling (Perm + permuted CSR) is exact: the sparse
    chain with col_tiling=True equals the plain one."""
    img_shape = (8, 8, 16)   # oversamp 2.0 -> grid (16,16,32), tileable
    traj = traj_with_wrap(80, 3, rng)
    A_p, plan_p = nufft_op(traj, img_shape, oversamp=2.0, width=4,
                           interp="sparse", col_tiling=False)
    A_t, plan_t = nufft_op(traj, img_shape, oversamp=2.0, width=4,
                           interp="sparse", col_tiling=True)
    # Morton tiling also sorts samples differently: compare in USER order
    x = rand64c(int(np.prod(img_shape)), 2, rng=rng)
    f_p = plan_p.unsort_samples(np.asarray(A_p * x))
    f_t = plan_t.unsort_samples(np.asarray(A_t * x))
    assert rel_err(f_t, f_p) < 1e-5
    y = rand64c(A_t.shape[0], 2, rng=rng)
    a_p = np.asarray(A_p.H * plan_p.sort_samples(y))
    a_t = np.asarray(A_t.H * plan_t.sort_samples(y))
    assert rel_err(a_t, a_p) < 1e-5


def test_plan_memusage_smaller_than_element(rng):
    """The separable payload beats element storage by ~3x at 3D scale."""
    grid = (20, 20, 24)
    traj = traj_with_wrap(500, 3, rng)
    plan = plan_tile_interp(traj, grid, width=4)
    # element: nnz * (4B weight + 4B index); separable: S*4B + 3*(n*t)*4B
    element_bytes = 500 * 64 * 8
    assert plan.memusage() < element_bytes


def test_bin_layout_padding_is_neutral(rng):
    """A plan built with an inflated bin layout (every class padded, extra
    classes, forced cap segments) applies identically to the unpadded one —
    the precondition for stacking per-device plans in parallel/e2e.py."""
    from indigo_tpu.ops.tile_interp import (
        bin_layout_of, merge_bin_layouts, _BIN_WIDTHS)
    grid = (16, 16, 16)
    traj = traj_with_wrap(400, 3, rng)
    plan = plan_tile_interp(traj, grid, width=4)
    counts = {w: int(i.shape[0]) for i, w in zip(plan.bins.idx,
                                                 plan.bins.widths)}
    # inflate: +7 rows per present class, one absent ladder class, and a
    # cap class with segment reduction
    absent = next(w for w in _BIN_WIDTHS if w not in counts)
    inflated = ({**{w: n + 7 for w, n in counts.items()}, absent: 3,
                 _BIN_WIDTHS[-1]: counts.get(_BIN_WIDTHS[-1], 0) + 5}, 4)
    layout = merge_bin_layouts([inflated,
                                (counts, plan.bins.cap_ntiles)])
    plan_p = plan_tile_interp(traj, grid, width=4, bin_layout=layout)
    assert plan_p.bins.cap_seg is not None
    assert plan_p.bins.cap_ntiles == 4

    y = rand64c(len(traj), 2, rng=rng)
    out = np.asarray(tile_interp_apply(plan, y, adjoint=True))
    out_p = np.asarray(tile_interp_apply(plan_p, y, adjoint=True))
    np.testing.assert_array_equal(out, out_p)

    # layout extraction matches what the builder actually produced
    lay = plan_tile_interp(traj, grid, width=4, adjoint="layout")
    assert lay == (counts, plan.bins.cap_ntiles)
    assert merge_bin_layouts([lay, lay]) == lay


@pytest.mark.parametrize("img,grid", [
    ((12, 12, 10), (16, 16, 16)),     # 3D tile (4,4,8) divides grid
    ((20, 26), (24, 32)),             # 2D tile (8,16) divides grid
])
def test_fused_tiled_adjoint_idft(img, grid, rng):
    """tile_adjoint_tiled + tiled_idft_apply == untile + CenteredDFT
    adjoint (the fused rhs path skips the untile transpose + fold)."""
    from indigo_tpu.operators import CenteredDFT
    from indigo_tpu.ops.dft_fft import tiled_idft_mats, tiled_idft_apply
    from indigo_tpu.ops.tile_interp import tile_adjoint_tiled

    d = len(grid)
    traj = traj_with_wrap(300, d, rng)
    beta = noncart.beatty_beta(4, 1.5)
    plan = plan_tile_interp(traj, grid, width=4, beta=beta)
    assert plan.ext == tuple(grid)  # periodic no-halo tiling
    Kc = 3
    y = rand64c(300, Kc, rng=rng)

    # unfused reference chain
    xg = tile_interp_apply(plan, y, adjoint=True)          # (N, Kc)
    F = CenteredDFT(img, grid)
    ref = np.asarray(F.apply(np.asarray(xg), adjoint=True))  # (n, Kc)

    xt, folded = tile_adjoint_tiled(plan, y)
    assert folded
    mats = [(m.real.copy(), m.imag.copy())
            for m in tiled_idft_mats(img, grid, plan.tile)]
    ar, ai = tiled_idft_apply(xt, plan.nt, plan.tile, mats)
    got = (np.asarray(ar) + 1j * np.asarray(ai)).reshape(Kc, -1).T
    assert rel_err(got, ref) < 2e-5

    # real input: folded=False path
    yr = np.asarray(y.real, np.float32)
    xt_r, folded_r = tile_adjoint_tiled(plan, yr)
    assert not folded_r
    ar2, ai2 = tiled_idft_apply(xt_r, plan.nt, plan.tile, mats,
                                folded=False)
    got_r = (np.asarray(ar2) + 1j * np.asarray(ai2)).reshape(Kc, -1).T
    ref_r = np.asarray(F.apply(np.asarray(
        tile_interp_apply(plan, yr, adjoint=True)).astype(np.complex64),
        adjoint=True))
    assert rel_err(got_r, ref_r) < 2e-5
