"""Tile-gather NUFFT interpolation: the TPU-native gridded apply.

Reference parity: applying the KB gridding matrix (indigo csrmm on the CSR
from indigo/noncart.py — unverified, mount empty; SURVEY.md §2/§3.1). The
reference's CSR SpMM is a per-nonzero gather; on TPU, per-element gathers
serialize (~4 ns per gathered ROW regardless of width — measured), so the
TPU-native formulation makes every gathered row a full 128-lane grid tile:

  * the oversampled grid is stored tiled: 128-node boxes (e.g. 4x4x8 for 3D),
    plus a periodic halo so no patch ever wraps (``tile_grid``/``untile_grid``);
  * each sample's Kaiser-Bessel patch lies inside a fixed super-tile of
    neighboring boxes (2x2x2 for width<=5) whose tile ids are precomputed
    host-side (``TileInterpPlan``);
  * the KB weights are kept FACTORED per axis (width values scattered into
    the super-tile extent by the patch offset) — the separable structure the
    reference's CSR representation throws away. One apply is then:
    gather super-tile rows -> three tiny batched contractions (forward), or
    the mirrored broadcast + one scatter-add of tile rows (adjoint).

Everything is jnp, so the same code runs on CPU (tests) and TPU; the gather
and scatter stream at memcpy-class rates because rows are 128 wide.
Measured on v5e at 128^3/8-coil scale: forward 104 -> ~9 ms, adjoint
1563 -> ~18 ms (K=2) vs the element-format gather/segment paths.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["TileInterpPlan", "plan_tile_interp", "tile_interp_apply",
           "DEFAULT_TILE"]

# 128-node tile shapes per rank (f32 lane width is 128) — shared with the
# trajectory sort / Morton column tiling so plan geometry and sample order
# can never desynchronize.
from ..noncart import DEFAULT_TILES as DEFAULT_TILE


class TileAdjBins:
    """Host-built tile-binned layout for the SCATTER-FREE adjoint.

    The adjoint's natural form is a scatter (every sample adds S super-tile
    rows); TPU scatter-add costs ~200 ns per row, so at serving scale the
    M*S row stream dominates the whole rhs build. This structure turns it
    into gathers + batched matmuls + ONE sorted-unique row write per count
    class: samples are corner-sorted host-side, so the entries feeding any
    output tile form <= S contiguous runs; tiles are bucketed into padded
    entry-count classes, and per class the contraction over a tile's
    entries is a single dot_general (batch=tile, contract=entries).

    Per class c: idx[c] (n_c, w_c) int32 ORIGINAL sample ids (M =
    zero-sentinel pad); slot[c] (n_c, w_c) int8 super-tile member of each
    entry; rows within a class are tile-ascending.

    The COMMIT is a pure gather: after the cap class's multi-row tiles are
    pre-reduced (``cap_seg``: sorted segment ids over its rows; None when
    every tile fits one row), each nonempty tile owns exactly one row of
    the class-concatenated results, and ``gidx`` (NT,) int32 maps every
    output tile to that row — or to the zero sentinel row R. The tiled
    grid is then ``rows[gidx]``: no zeros-init, no scatter pass at all
    (the per-class scatter-adds each re-streamed the whole (NT, K*128)
    grid — measured ~9 ms of the 42 ms 128^3/K=16 adjoint — and a merged
    sorted scatter needed a permuted row copy that OOMed 256^3 serving).
    """

    def __init__(self, idx, slot, widths, gidx, cap_seg=None, cap_ntiles=0):
        self.idx = tuple(idx)
        self.slot = tuple(slot)
        self.widths = tuple(int(w) for w in widths)
        self.gidx = gidx
        self.cap_seg = cap_seg
        self.cap_ntiles = int(cap_ntiles)

    def memusage(self):
        extra = sum(int(a.nbytes) for a in (self.gidx, self.cap_seg)
                    if a is not None)
        return int(sum(a.nbytes for t in (self.idx, self.slot)
                       for a in t)) + extra

    def tree_flatten(self):
        return ((self.idx, self.slot, self.gidx, self.cap_seg),
                (self.widths, self.cap_ntiles))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        idx, slot, obj.gidx, obj.cap_seg = children
        obj.idx, obj.slot = tuple(idx), tuple(slot)
        obj.widths, obj.cap_ntiles = aux
        return obj


jax.tree_util.register_pytree_node(
    TileAdjBins,
    lambda b: b.tree_flatten(),
    TileAdjBins.tree_unflatten)


class FwdGroups:
    """Span-grouped forward layout.

    A sample's patch covers a PREFIX of super-tile members along each axis
    (member 0 always, member j iff the patch crosses j tile boundaries), so
    samples partition into prod(nsup) groups by their per-axis span counts;
    within a group every kept (sample, slot) pair carries live weight. The
    forward then gathers ~4.2 of S=8 rows per sample instead of all 8 —
    the op is row-gather-bound, so that is a direct ~1.9x.

    Per group g: tids[g] (m_g, S_g) int32, wfacs[g] list of nd arrays
    (m_g, c_d, t_d). ginv (M,) int32 restores plan sample order from the
    group-concatenated output: y = concat(group outputs)[ginv].
    """

    def __init__(self, tids, wfacs, ginv):
        self.tids = tuple(tids)
        self.wfacs = tuple(tuple(w) for w in wfacs)
        self.ginv = ginv

    def memusage(self):
        return int(sum(t.nbytes for t in self.tids)
                   + sum(w.nbytes for ws in self.wfacs for w in ws)
                   + (self.ginv.nbytes if self.ginv is not None else 0))

    def tree_flatten(self):
        return ((self.tids, self.wfacs, self.ginv), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        tids, wfacs, obj.ginv = children
        obj.tids = tuple(tids)
        obj.wfacs = tuple(tuple(w) for w in wfacs)
        return obj


jax.tree_util.register_pytree_node(
    FwdGroups,
    lambda g: g.tree_flatten(),
    FwdGroups.tree_unflatten)


class _HostPerm:
    """Hashable aux-data wrapper for a host-side permutation array.

    TileInterpPlan aux data must hash/compare cheaply (it keys every jit
    cache lookup of a traced plan), so equality takes an identity fast
    path — tree_unflatten reuses the same aux objects, making repeated
    calls O(1) — and falls back to array comparison only across
    independently-built plans.
    """

    __slots__ = ("perm",)

    def __init__(self, perm):
        self.perm = np.asarray(perm)

    def __eq__(self, other):
        return isinstance(other, _HostPerm) and (
            self.perm is other.perm
            or np.array_equal(self.perm, other.perm))

    def __hash__(self):
        p = self.perm
        return hash((p.shape[0], int(p[0]), int(p[-1]))) if p.size else 0


class TileInterpPlan:
    """Host-built geometry for the tile-gather interpolation.

    Arrays (all device-ready):
      tid:  (M, S) int32 — tile ids of each sample's super-tile, S = prod(n_d)
      wfac: list of d arrays (M, n_d, t_d) f32 — per-axis KB weights scattered
            into super-tile-extent position (zero outside the patch)
      bins: optional :class:`TileAdjBins` for the scatter-free adjoint
      fgroups: optional :class:`FwdGroups` for the span-grouped forward
    Static geometry: grid_shape, tile, ext (halo-extended dims), nt (tiles
    per axis), pad_lo (halo below), width. ``sample_perm`` (host numpy or
    None) is carried as static aux data, so it survives pytree round-trips
    (device_put, jit argument passing).
    """

    def __init__(self, tid, wfac, grid_shape, tile, ext, nt, pad_lo, width,
                 bins=None, fgroups=None, sample_perm=None):
        self.tid = tid
        self.wfac = tuple(wfac)
        self.bins = bins
        self.fgroups = fgroups
        # the sample permutation applied by plan_tile_interp(reorder=True);
        # callers compose it into their own sample mapping at build time
        self.sample_perm = sample_perm
        self.grid_shape = tuple(int(g) for g in grid_shape)
        self.tile = tuple(int(t) for t in tile)
        self.ext = tuple(int(e) for e in ext)
        self.nt = tuple(int(n) for n in nt)
        self.pad_lo = tuple(int(p) for p in pad_lo)
        self.width = int(width)

    @property
    def n_samples(self):
        return self.tid.shape[0]

    @property
    def S(self):
        return self.tid.shape[1]

    def memusage(self):
        return (self.tid.nbytes
                + sum(int(w.nbytes) for w in self.wfac)
                + (self.bins.memusage() if self.bins is not None else 0)
                + (self.fgroups.memusage() if self.fgroups is not None
                   else 0))

    def tree_flatten(self):
        sp = (None if self.sample_perm is None
              else _HostPerm(self.sample_perm))
        return ((self.tid, self.wfac, self.bins, self.fgroups),
                (self.grid_shape, self.tile, self.ext, self.nt,
                 self.pad_lo, self.width, sp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tid, wfac, obj.bins, obj.fgroups = children
        obj.wfac = tuple(wfac)
        (obj.grid_shape, obj.tile, obj.ext, obj.nt, obj.pad_lo,
         obj.width, sp) = aux
        obj.sample_perm = None if sp is None else sp.perm
        return obj


jax.tree_util.register_pytree_node(
    TileInterpPlan,
    lambda p: p.tree_flatten(),
    TileInterpPlan.tree_unflatten)


# expanded-weight scratch bound for the binned adjoint's class chunking.
# Counter-intuitively SMALL (8 MB of f32): the per-class work runs as a
# lax.map over row chunks, and v5e prefers many small steps (the gather,
# weight-expand and matmul of successive steps pipeline; big chunks
# serialize through memory). Measured on v5e (round 4): 128^3 radial
# adjoint 28.7 -> 15.3 ms (K=2) / 30.6 -> 17.3 ms (K=16), 256^3/1M-sample
# K=16 185 -> 87 ms vs the old 1<<26; the optimum is flat in [2^20, 2^23]
# at both scales and degrades monotonically above 2^24.
_BIN_SCRATCH_ELEMS = 1 << 21

# padded entry-count classes for the binned adjoint: power-of-2 ladder + a
# cap, tiles denser than the cap span several rows. Every per-entry cost
# (the packed row gather, the batched matmul, the row write) scales with
# PADDED entries, so the ladder is kept fine: the old (8,32,128,512,2048)
# ladder padded 2.1M true entries to 4.2M at 128^3 radial scale (measured);
# the power-of-2 ladder bounds the waste at 2x worst-case, ~1.3x typical.
_BIN_WIDTHS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bin_entries(tid, M, touch=None):
    """Shared host pre-pass of :func:`build_tile_adj_bins` /
    :func:`bin_layout`: covered (sample, slot) entries sorted by tile."""
    S = tid.shape[1]
    if touch is None:
        samp_e = np.repeat(np.arange(M, dtype=np.int64), S)
        slot_e = np.tile(np.arange(S, dtype=np.int64), M)
    else:
        samp_e, slot_e = np.nonzero(touch)
    tile_e = tid[samp_e, slot_e]
    o = np.argsort(tile_e, kind="stable")   # within a tile: ascending sample
    tile_e, sample_id, slot_e = (tile_e[o], samp_e[o].astype(np.int32),
                                 slot_e[o].astype(np.int8))
    tiles, tstart, e_T = np.unique(tile_e, return_index=True,
                                   return_counts=True)
    cap = _BIN_WIDTHS[-1]
    cls = np.searchsorted(np.asarray(_BIN_WIDTHS), e_T)   # ladder index
    cls = np.minimum(cls, len(_BIN_WIDTHS) - 1)
    nrows_t = np.where(e_T > cap, -(-e_T // cap), 1)
    return tiles, tstart, e_T, cls, nrows_t, sample_id, slot_e


def bin_layout_of(tid, M, touch=None):
    """Per-class row layout :func:`build_tile_adj_bins` would produce.

    Returns ``(counts, cap_ntiles)``: ``counts`` maps ladder width ->
    row count, ``cap_ntiles`` is the cap class's reduced (per-tile) row
    count when any tile overflows one cap row (else 0). Merge layouts of
    several sample partitions with :func:`merge_bin_layouts` and pass the
    result back as ``build_tile_adj_bins(..., layout=...)`` to get
    identically-shaped (stackable) bin pytrees — the shard_map rhs build
    (parallel/e2e.py) stacks one plan per device.
    """
    _, _, _, cls, nrows_t, _, _ = _bin_entries(tid, M, touch)
    counts = {}
    cap_ntiles = 0
    for c, w in enumerate(_BIN_WIDTHS):
        m_t = cls == c
        if not m_t.any():
            continue
        nr = nrows_t[m_t]
        counts[w] = int(nr.sum())
        if (nr > 1).any():
            cap_ntiles = int(m_t.sum())
    return counts, cap_ntiles


def merge_bin_layouts(layouts):
    """Elementwise max of :func:`bin_layout_of` results (a common superset)."""
    counts = {}
    cap_ntiles = 0
    for cnt, cap in layouts:
        for w, n in cnt.items():
            counts[w] = max(counts.get(w, 0), n)
        cap_ntiles = max(cap_ntiles, cap)
    return counts, cap_ntiles


def build_tile_adj_bins(tid, M, NT, touch=None, layout=None):
    """Host-side: member tile ids (M, S) -> :class:`TileAdjBins` (see its
    docstring for the execution model). ``NT`` = total output tiles (sizes
    the gather map ``gidx``).

    ``touch`` (M, S) bool marks the super-tile members a sample's patch
    actually covers; untouched (sample, slot) pairs carry identically-zero
    KB weights, so dropping them here shrinks every per-entry cost (the
    packed row gather, the batched matmul) with no effect on the result.
    A width-4 patch spans 2 tiles along a 4-wide axis only when it crosses
    a boundary, so the average live slot count is ~4.2 of S=8 (measured) —
    filtering is a ~1.9x entry reduction. None keeps all M*S entries.

    ``layout`` (from :func:`bin_layout_of`/:func:`merge_bin_layouts`) pads
    every class to the given row counts (extra rows carry the zero
    sentinel sample id M, contributing nothing) so bins built for
    different sample partitions of one grid share identical array shapes
    and static aux — the precondition for stacking plans into the leading
    device axis of a shard_map program.
    """
    (tiles, tstart, e_T, cls, nrows_t,
     sample_id, slot_e) = _bin_entries(tid, M, touch)
    tgt_counts, tgt_capnt = layout if layout is not None else ({}, 0)

    tile_idx_e = np.repeat(np.arange(len(tiles)), e_T)
    eo = np.arange(int(e_T.sum())) - np.repeat(tstart, e_T)  # offset in tile

    idx, slot, widths = [], [], []
    cap_seg, cap_ntiles = None, 0
    gidx = np.full(NT, 0, dtype=np.int64)   # filled below; sentinel last
    row_base = 0                             # in REDUCED (per-tile) rows
    covered = np.zeros(NT, dtype=bool)
    for c, w in enumerate(_BIN_WIDTHS):
        m_t = cls == c
        tgt = tgt_counts.get(w, 0)
        if not m_t.any() and tgt == 0:
            continue
        t_sel = np.flatnonzero(m_t)
        nr = nrows_t[t_sel]
        n_raw = int(nr.sum())
        if layout is not None and n_raw > tgt:
            raise ValueError(
                f"bin layout class {w} holds {tgt} rows < {n_raw} needed")
        n_c = max(n_raw, tgt)
        rowbase_t = np.full(len(tiles), -1, dtype=np.int64)
        rowbase_t[t_sel] = np.cumsum(nr) - nr
        m_e = m_t[tile_idx_e]
        re = rowbase_t[tile_idx_e[m_e]] + eo[m_e] // w
        ce = eo[m_e] % w
        idx_c = np.full((n_c, w), M, dtype=np.int32)
        slot_c = np.zeros((n_c, w), dtype=np.int8)
        idx_c.ravel()[re * w + ce] = sample_id[m_e]
        slot_c.ravel()[re * w + ce] = slot_e[m_e]
        idx.append(jnp.asarray(idx_c))
        slot.append(jnp.asarray(slot_c))
        widths.append(w)
        is_cap = w == _BIN_WIDTHS[-1] and ((nr > 1).any() or tgt_capnt)
        if is_cap:
            # only the cap class can exceed one row per tile; its rows are
            # pre-reduced at execution time to one row per tile. Padded
            # rows fold (zeros) into the last segment, keeping ids sorted.
            if (nr > 1).any():
                assert w == _BIN_WIDTHS[-1], (w, nr.max())
            cap_ntiles = max(len(t_sel), tgt_capnt)
            seg = np.repeat(np.arange(len(t_sel)), nr)
            seg = np.concatenate(
                [seg, np.full(n_c - len(seg), max(cap_ntiles - 1, 0))])
            cap_seg = jnp.asarray(seg.astype(np.int32))
        gidx[tiles[t_sel]] = row_base + np.arange(len(t_sel))
        covered[tiles[t_sel]] = True
        row_base += cap_ntiles if is_cap else n_c
    gidx[~covered] = row_base                # zero sentinel row
    return TileAdjBins(idx, slot, widths,
                       gidx=jnp.asarray(gidx.astype(np.int32)),
                       cap_seg=cap_seg, cap_ntiles=cap_ntiles)


def plan_tile_interp(traj, grid_shape, width=4, beta=None, tile=None,
                     adjoint="binned", forward="grouped", reorder=False,
                     bin_layout=None):
    """Build a :class:`TileInterpPlan` (host-side, vectorized numpy).

    Same geometry/weight conventions as :func:`indigo_tpu.noncart.interp_mat`
    (centered oversampled grid, periodic wraparound, KB weights at offsets
    ``c - (base+j)``) — the two agree to f32 rounding; tests check exactness
    against the CSR on the same trajectory.

    ``adjoint='binned'`` (default) additionally builds the
    :class:`TileAdjBins` layout so the adjoint runs scatter-free (gathers +
    per-class batched matmuls; ~10x the TPU scatter path at serving scale);
    ``'scatter'`` keeps only the row-scatter formulation.
    ``forward='grouped'`` (default) additionally builds :class:`FwdGroups`
    so the forward gathers only covered super-tile rows (~1.9x fewer);
    ``'dense'`` keeps only the fixed-S formulation.
    ``reorder=True`` permutes the plan's sample order to group-major so
    the grouped forward needs no output reorder gather (a measured ~4 ms
    at 262k samples); the applied permutation is exposed as
    ``plan.sample_perm`` (host-only, None when identity) and the caller
    must compose it into its own sample mapping — y rows then correspond
    to ``traj[plan.sample_perm]``.
    ``bin_layout`` (a :func:`merge_bin_layouts` result) pads the binned
    adjoint's classes to a fixed shape so plans over different sample
    partitions of one grid stack into a shard_map device axis.
    """
    from ..noncart import kaiser_bessel, beatty_beta

    traj = np.atleast_2d(np.asarray(traj, dtype=np.float64))
    M, nd = traj.shape
    G = tuple(int(g) for g in grid_shape)
    assert len(G) == nd, (G, nd)
    if beta is None:
        beta = beatty_beta(width, 2.0)
    if tile is None:
        tile = DEFAULT_TILE[nd]
    tile = tuple(int(t) for t in tile)
    assert int(np.prod(tile)) == 128, tile

    pad_lo, ext, nt, nsup = [], [], [], []
    tblk, wfac, touch_d, wrap_d = [], [], [], []
    for d in range(nd):
        t = tile[d]
        c = (traj[:, d] + 0.5) * G[d]
        base = np.ceil(c - width / 2.0).astype(np.int64)
        offs = np.arange(width)
        w_d = kaiser_bessel(c[:, None] - (base[:, None] + offs[None, :]),
                            width, beta).astype(np.float32)
        n_d = (t - 1 + width - 1) // t + 1   # super-tile tiles along axis
        if G[d] % t == 0:
            # tile divides the grid: make the TILE GRID itself periodic
            # (member tile ids wrap mod nt below) — no halo extension, so
            # tile_grid needs no wrap-pad and untile_grid no overlap-add
            # fold (the fold measured 21 of 33 ms at 128^3 K=16: every
            # axis pass pays lane-shifted slice+pad+add relayouts).
            lo = 0
            ntd = G[d] // t
            e = G[d]
            tb = np.floor_divide(base, t)    # may be <0 or >=ntd: wrapped
            off_in = base - tb * t           # in [0, t) regardless
            wrap = True
        else:
            lo = int(max(0, -base.min()))
            basep = base + lo
            hi_need = int(basep.max()) + width   # one past last touched
            ntd = -(-hi_need // t)
            ntd = max(ntd, (int(basep.max()) // t) + n_d)  # in range
            # trajectories that never reach the top of an axis would
            # otherwise yield ext < G + lo, making tile_grid's wrap-pad
            # width negative
            ntd = max(ntd, -(-(G[d] + lo) // t))
            e = ntd * t
            tb = basep // t                  # first tile of super-tile
            off_in = basep - tb * t          # patch offset inside it
            wrap = False
        # scatter the width weights into the super-tile extent n_d*t
        wf = np.zeros((M, n_d * t), dtype=np.float32)
        np.put_along_axis(
            wf, off_in[:, None] + offs[None, :], w_d, axis=1)
        pad_lo.append(lo)
        ext.append(e)
        nt.append(ntd)
        nsup.append(n_d)
        tblk.append(tb)
        wfac.append(wf.reshape(M, n_d, t))
        wrap_d.append(wrap)
        # which super-tile members the patch actually covers along this
        # axis: member j spans extent [j*t, (j+1)*t), the patch
        # [off_in, off_in + width)
        j = np.arange(n_d)
        touch_d.append((off_in[:, None] < (j[None, :] + 1) * t)
                       & (off_in[:, None] + width > j[None, :] * t))

    sample_perm = None
    if forward == "grouped" and reorder:
        code = np.zeros(M, dtype=np.int64)
        for d in range(nd):
            code = code * nsup[d] + (touch_d[d].sum(axis=1) - 1)
        order = np.argsort(code, kind="stable")
        if not np.array_equal(order, np.arange(M)):
            sample_perm = order
            wfac = [w[order] for w in wfac]
            tblk = [t[order] for t in tblk]
            touch_d = [t[order] for t in touch_d]

    # linear tile ids of the S = prod(nsup) super-tile members; on wrapped
    # (periodic-tile) axes the member index folds mod nt
    grids = np.indices(tuple(nsup)).reshape(nd, -1)       # (d, S)
    step = np.ones(nd, dtype=np.int64)
    for d in range(nd - 2, -1, -1):
        step[d] = step[d + 1] * nt[d + 1]
    tid = np.zeros((M, grids.shape[1]), dtype=np.int64)   # (M, S)
    for d in range(nd):
        md = tblk[d][:, None] + grids[d][None, :]
        if wrap_d[d]:
            md %= nt[d]
        tid += md * step[d]

    if adjoint in ("binned", "layout"):
        touch = touch_d[0][:, grids[0]]                   # (M, S)
        for d in range(1, nd):
            touch = touch & touch_d[d][:, grids[d]]
        if adjoint == "layout":
            # cheap pre-pass for the sharded builder: just the class-row
            # layout this partition needs (see bin_layout)
            return bin_layout_of(tid, M, touch)
        bins = build_tile_adj_bins(tid, M, int(np.prod(nt)), touch=touch,
                                   layout=bin_layout)
    else:
        bins = None

    fgroups = None
    if forward == "grouped":
        # coverage is a prefix of members along each axis, so the span
        # counts (c_0..c_{nd-1}) partition samples into at most prod(nsup)
        # fixed-shape groups (see FwdGroups)
        code = np.zeros(M, dtype=np.int64)
        for d in range(nd):
            code = code * nsup[d] + (touch_d[d].sum(axis=1) - 1)
        order = np.argsort(code, kind="stable")
        oc = code[order]
        ustart = np.concatenate([[0], np.flatnonzero(np.diff(oc)) + 1])
        uend = np.concatenate([ustart[1:], [M]])
        tids_g, wfacs_g = [], []
        for cstart, cend in zip(ustart, uend):
            sel = order[cstart:cend]
            cds, rem = [], int(oc[cstart])
            for d in range(nd - 1, -1, -1):
                cds.append(rem % nsup[d] + 1)
                rem //= nsup[d]
            cds = np.array(cds[::-1])
            # kept slots in ascending-s order = row-major order of the
            # prefix box, matching _lane_weights' member enumeration
            keep = np.flatnonzero(np.all(grids < cds[:, None], axis=0))
            tids_g.append(jnp.asarray(tid[sel][:, keep].astype(np.int32)))
            wfacs_g.append([jnp.asarray(wfac[d][sel][:, :cds[d], :])
                            for d in range(nd)])
        if np.array_equal(order, np.arange(M)):
            ginv = None            # already group-major: concat IS the order
        else:
            pos = np.empty(M, dtype=np.int64)
            pos[order] = np.arange(M)
            ginv = jnp.asarray(pos.astype(np.int32))
        fgroups = FwdGroups(tids_g, wfacs_g, ginv)

    return TileInterpPlan(
        tid=jnp.asarray(tid.astype(np.int32)),
        wfac=[jnp.asarray(w) for w in wfac],
        grid_shape=G, tile=tile, ext=tuple(ext), nt=tuple(nt),
        pad_lo=tuple(pad_lo), width=width, bins=bins, fgroups=fgroups,
        sample_perm=sample_perm)


# above this many elements, run the (un)tiling transpose in z-slab chunks:
# XLA can materialize the 6D transpose with sub-128 minor dims (16x layout
# padding), which at 640^3-class grids would exceed HBM outright
# The two-stage (re)tile transposes are faster than the monolithic 7D
# form at EVERY 3D size, not just past a memory threshold: at 128^3/K=2
# the 7D _retile measured 3.52 ms vs 1.67 ms for _retile2 against a
# ~0.2 ms copy floor (tools/retile_micro.py) — XLA's monolithic
# transpose picks a poor layout well below the sizes where it OOMs.
# 3D always takes the two-stage path; the threshold survives only as
# documentation of where the 7D form additionally starts 8x-padding.
_TILE_SLAB_ELEMS = 1 << 27


def _unretile2(xt, nt, T, K, E):
    """(NT, K*128) -> (K, *E) for rank 3, as TWO transposes neither of
    which XLA materializes with a catastrophic layout: first the
    z-interleave with the full merged E2 as the minor dim, then a pure
    row permutation (minor untouched). The monolithic 7D transpose picks
    a sub-128-minor layout at big volumes (8x padding — OOMed outright at
    320^3 K=16), and the old nt0-slab lax.map materialized (nt0, K, ...)
    with the K=16 dim as minor (8x padding, same OOM)."""
    nt0, nt1, nt2 = nt
    T0, T1, T2 = T
    x = xt.reshape(nt0 * nt1, nt2, K, T0 * T1, T2)
    x = x.transpose(0, 2, 3, 1, 4)            # (nt01, K, T0T1, nt2, T2)
    x = x.reshape(nt0, nt1, K, T0, T1, E[2])
    x = x.transpose(2, 0, 3, 1, 4, 5)         # (K, nt0, T0, nt1, T1, E2)
    return x.reshape((K,) + tuple(E))


def _retile2(xk, nt, T, K, E):
    """(K, *E) -> (NT, K*128) for rank 3: mirror of :func:`_unretile2`."""
    nt0, nt1, nt2 = nt
    T0, T1, T2 = T
    x = xk.reshape(K, nt0, T0, nt1, T1, E[2])
    x = x.transpose(1, 3, 0, 2, 4, 5)         # (nt0, nt1, K, T0, T1, E2)
    x = x.reshape(nt0 * nt1, K, T0 * T1, nt2, T2)
    x = x.transpose(0, 3, 1, 2, 4)            # (nt01, nt2, K, T0T1, T2)
    return x.reshape(-1, K * 128)


def _retile(xk, nt, T, K, nd):
    """(K, E...) -> (NT, K*128): split axes, withins last, flatten.

    K LEADING on the input side for the same reason as :func:`_unretile`:
    a trailing small K would make TPU pad the lane dim to 128 (up to 64x
    memory for K=2) wherever the extended grid is materialized.
    """
    split = [K]
    for d in range(nd):
        split.extend([nt[d], T[d]])
    xk = xk.reshape(split)
    perm = ([1 + 2 * d for d in range(nd)] + [0]
            + [2 + 2 * d for d in range(nd)])
    return xk.transpose(perm).reshape(-1, K * 128)


def tile_grid(plan, x):
    """(N, K) grid vector -> (NT, K*128) tiled layout with periodic halo.

    Lane-major within-tile order (lane = within-tile node, K above it) keeps
    every downstream array's minor dim at 128 — TPU pads the minor dim to
    128 lanes, so small trailing dims would blow memory 16-64x.
    """
    G, E, T, lo = plan.grid_shape, plan.ext, plan.tile, plan.pad_lo
    nd = len(G)
    K = x.shape[1]
    xk = x.T.reshape((K,) + G)
    pads = [(0, 0)] + [(lo[d], E[d] - G[d] - lo[d]) for d in range(nd)]
    xk = jnp.pad(xk, pads, mode="wrap")
    if nd == 3:
        return _retile2(xk, plan.nt, T, K, E)
    return _retile(xk, plan.nt, T, K, nd)


def _unretile(xt, nt, T, K, nd, E):
    """(NT, K*128) -> (K, E...): inverse of :func:`_retile`, K LEADING.

    K rides ahead of the spatial dims through the whole untiling so the
    minor dim stays a full (>=128) spatial axis: a trailing small K would
    make TPU pad the lane dim to 128 (8x memory for K=16 — measured OOM
    at 320^3 serving scale).
    """
    split = list(nt) + [K] + list(T)
    xe = xt.reshape(*split)
    perm = [nd]
    for d in range(nd):
        perm.extend([d, nd + 1 + d])
    return xe.transpose(perm).reshape((K,) + tuple(E))


def untile_grid(plan, xt, K):
    """Adjoint of :func:`tile_grid`: (NT, K*128) -> (N, K), halo folded back
    periodically (the transpose of pad-wrap is overlap-add)."""
    G, E, T, lo = plan.grid_shape, plan.ext, plan.tile, plan.pad_lo
    nd = len(G)
    if nd == 3:
        xe = _unretile2(xt, plan.nt, T, K, E)           # (K, *E)
    else:
        xe = _unretile(xt, plan.nt, T, K, nd, E)        # (K, *E)
    # fold halos: index e maps to (e - lo) mod G (K leads, spatial axis d
    # lives at d+1)
    for d in range(nd):
        g, l = G[d], lo[d]
        ax = d + 1
        hi = E[d] - g - l
        if l < g and 0 <= hi <= g:
            # common case: at most one wrap on each side — touch only the
            # halo rows
            core = jax.lax.slice_in_dim(xe, l, l + g, axis=ax)
            if l:
                head = jax.lax.slice_in_dim(xe, 0, l, axis=ax)
                pad = [(0, 0)] * core.ndim
                pad[ax] = (g - l, 0)
                core = core + jnp.pad(head, pad)
            if hi:
                tail = jax.lax.slice_in_dim(xe, l + g, E[d], axis=ax)
                pad = [(0, 0)] * core.ndim
                pad[ax] = (0, g - hi)
                core = core + jnp.pad(tail, pad)
            xe = core
        else:
            # small grids (ext can exceed 2G, e.g. 1D grids below ~1.5
            # tiles): exact modular fold — zero-pad to a g-aligned length
            # with index 0 on a period boundary, then sum the periods
            p = (g - (l % g)) % g
            q = (-(E[d] + p)) % g
            pads = [(0, 0)] * xe.ndim
            pads[ax] = (p, q)
            xe2 = jnp.pad(xe, pads)
            sh = xe2.shape
            k = sh[ax] // g
            xe = xe2.reshape(sh[:ax] + (k, g) + sh[ax + 1:]).sum(axis=ax)
    N = int(np.prod(G))
    return xe.reshape(K, N).T


def _lane_weights(plan, wfac):
    """Combine per-axis factors into W (m, S, 128) — all ops 128-lane-wide.

    wfac[d] is (m, n_d, t_d); each factor is expanded to the within-tile
    lane order (repeat over trailing axes' extents, tile over leading) and
    the product is broadcast over the super-tile axes.
    """
    nd = len(plan.tile)
    T = plan.tile
    m = wfac[0].shape[0]
    nsup = [w.shape[1] for w in wfac]
    W = None
    for d in range(nd):
        after = int(np.prod(T[d + 1:])) if d + 1 < nd else 1
        before = int(np.prod(T[:d])) if d else 1
        wL = wfac[d]
        if after > 1:
            wL = jnp.repeat(wL, after, axis=-1)
        if before > 1:
            wL = jnp.tile(wL, (1, 1, before))
        shape = (m,) + (1,) * d + (nsup[d],) + (1,) * (nd - 1 - d) + (128,)
        wL = wL.reshape(shape)
        W = wL if W is None else W * wL
    return W.reshape(m, int(np.prod(nsup)), 128)


@functools.partial(jax.jit, static_argnames=("K", "chunk"))
def _forward(plan, xt, K, chunk):
    """y (M, K) from tiled grid xt (NT, K*128)."""
    S = plan.S

    def one_chunk(args):
        tid, wfac = args
        m = tid.shape[0]
        g = xt[tid.reshape(-1)].reshape(m, S, K, 128)
        W = _lane_weights(plan, wfac)              # (m, S, 128)
        # contract (S, lanes) in ONE einsum instead of a broadcast
        # multiply + two staged reductions: the staged form materializes
        # the (m, S, K, 128) product before reducing (an extra HBM
        # round-trip over the gathered rows — +2.5 ms of the forward's
        # 7.5 ms reduce stage at 128^3; tools/fwd_contract_probe.py).
        # HIGHEST costs nothing here (memory-bound) and keeps the
        # contraction f32-exact against the CSR oracle.
        return jnp.einsum("mskl,msl->mk", g, W,
                          precision=jax.lax.Precision.HIGHEST)

    return _map_chunks(one_chunk, plan, K, chunk)


@functools.partial(jax.jit, static_argnames=("K", "chunk"))
def _forward_grouped(plan, xt, K, chunk):
    """Span-grouped forward (see :class:`FwdGroups`): apply each
    fixed-shape group as a dense sub-problem over its covered members
    only, then restore plan sample order with one row gather."""
    g = plan.fgroups
    outs = []
    for tid, wfac in zip(g.tids, g.wfacs):
        sub = TileInterpPlan(tid, wfac, plan.grid_shape, plan.tile,
                             plan.ext, plan.nt, plan.pad_lo, plan.width)
        outs.append(_forward(sub, xt, K, chunk))
    out = jnp.concatenate(outs, axis=0)
    return out if g.ginv is None else out[g.ginv]


def _expand_lanes(wd, d, T, nd):
    """(..., t_d) axis-d factor -> (..., 128) within-tile lane order
    (repeat over trailing extents, tile over leading) — the per-entry
    analogue of :func:`_lane_weights`."""
    after = int(np.prod(T[d + 1:])) if d + 1 < nd else 1
    before = int(np.prod(T[:d])) if d else 1
    if after > 1:
        wd = jnp.repeat(wd, after, axis=-1)
    if before > 1:
        wd = jnp.tile(wd, (1,) * (wd.ndim - 1) + (before,))
    return wd


@functools.partial(jax.jit, static_argnames=("K", "NT", "scratch"))
def _adjoint_binned(plan, y, K, NT, scratch=_BIN_SCRATCH_ELEMS):
    """Scatter-free tiled-grid adjoint via :class:`TileAdjBins`.

    Per count class: gather sample columns + per-axis factors for each
    output tile's (padded) entry list, expand the factored KB weights to
    lanes, and contract ALL of a tile's entries in one batched matmul
    (batch=tile row, contract=entries) — the MXU does the reduction the
    scatter formulation paid ~200 ns/row for. One ascending-row add per
    class writes the results.
    """
    bins = plan.bins
    M = plan.n_samples
    nd = len(plan.tile)
    T = plan.tile
    nsup = [w.shape[1] for w in plan.wfac]
    # ONE packed gather table: row m = [y_m | wfac_0[m].flat | ... |
    # wfac_{nd-1}[m].flat], plus a zero sentinel row at M. The per-entry
    # gather cost on TPU is per ROW, near-independent of width (measured
    # ~20 ns/row at these widths), so fetching y and all nd factor rows in
    # one gather instead of nd+1 separate ones cuts the dominant stage ~4x
    # (83 ms y-gather + 195 ms factor-gathers -> one ~90 ms gather at
    # 128^3/K=16). The slot's factor sub-row is then picked with selects
    # (nsup_d is 2-3), not another gather.
    segs = [y.astype(jnp.float32)] + [
        w.reshape(w.shape[0], -1) for w in plan.wfac]
    offs = np.concatenate([[K], K + np.cumsum(
        [n * t for n, t in zip(nsup, T)])]).astype(int)
    P = jnp.concatenate(segs, axis=1)
    P = jnp.concatenate([P, jnp.zeros((1, P.shape[1]), jnp.float32)])
    # Row-gather widths in [25, 63] hit a pathological XLA lowering on
    # large tables (measured on v5e at 2^20 rows: 51-76 ns/row vs 6-11
    # ns/row at widths <=24 or >=64 — a 7x cliff); zero-pad the packed
    # row to the next multiple of 64 to stay in the fast regime.
    if P.shape[1] > 24 and P.shape[1] % 64:
        P = jnp.pad(P, ((0, 0), (0, 64 - P.shape[1] % 64)))

    # one preallocated reduced-rows buffer (+1 zero sentinel row), filled
    # class by class with static-offset dynamic_update_slice (aliased
    # in-place by XLA — a concat would hold every class buffer live at
    # once: +2.3 GB peak at 256^3/K=16, which OOMed the 15.75 GB chip)
    nred = [i.shape[0] for i in bins.idx]
    if bins.cap_seg is not None:
        nred[-1] = bins.cap_ntiles
    rows_buf = jnp.zeros((sum(nred) + 1, K * 128), jnp.float32)
    base = 0
    for ci, (idx, slot, w) in enumerate(zip(bins.idx, bins.slot,
                                            bins.widths)):
        def rows_of(args, w=w):
            idx_c, slot_c = args                     # (r, w) int32/int8
            idx_c = idx_c.astype(jnp.int32)
            sl = slot_c.astype(jnp.int32)
            g = P[idx_c]                             # (r, w, K+sum n_d*t_d)
            yg = g[..., :K]
            W = None
            div = 1
            for d in range(nd - 1, -1, -1):
                sd = (sl // div) % nsup[d]
                div *= nsup[d]
                seg = g[..., offs[d]:offs[d] + nsup[d] * T[d]]
                seg = seg.reshape(seg.shape[:2] + (nsup[d], T[d]))
                wd = seg[:, :, 0, :]                 # (r, w, t_d)
                for j in range(1, nsup[d]):
                    wd = jnp.where((sd == j)[..., None],
                                   seg[:, :, j, :], wd)
                wd = _expand_lanes(wd, d, T, nd)     # (r, w, 128)
                W = wd if W is None else W * wd
            # full-f32 contraction: the MXU's default bf16 rounding costs
            # ~2e-3 rel-err here; the op is gather-bound so the extra
            # passes are free
            rows = jax.lax.dot_general(
                yg, W, (((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)  # (r, K, 128)
            return rows.reshape(-1, K * 128)

        n_c = idx.shape[0]
        # bound the per-class scratch (f32 elements, default ~256MB at
        # 128 lanes): each padded entry materializes an expanded-weight
        # lane row (128) AND its packed-table gather row (P width) —
        # counting both keeps an explicit tile_interp_apply(chunk=...)
        # honest on tight-HBM callers. (The packed table P itself,
        # M x ~64 f32, is per-call and not chunkable.)
        rchunk = max(1, scratch // (w * (128 + P.shape[1])))
        if n_c <= rchunk:
            rows = rows_of((idx, slot))
        else:
            nch = -(-n_c // rchunk)
            pad = nch * rchunk - n_c
            idx_p = jnp.pad(idx, ((0, pad), (0, 0)),
                            constant_values=M)
            slot_p = jnp.pad(slot, ((0, pad), (0, 0)))
            rows = jax.lax.map(
                rows_of, (idx_p.reshape(nch, rchunk, w),
                          slot_p.reshape(nch, rchunk, w)))
            rows = rows.reshape(-1, K * 128)[:n_c]
        if bins.cap_seg is not None and ci == len(bins.widths) - 1:
            # cap class: fold a tile's multiple rows into one so every
            # nonempty tile owns exactly one reduced row
            rows = jax.ops.segment_sum(
                rows, bins.cap_seg, num_segments=bins.cap_ntiles,
                indices_are_sorted=True)
        rows_buf = jax.lax.dynamic_update_slice(rows_buf, rows, (base, 0))
        base += nred[ci]
    # COMMIT AS A GATHER (see TileAdjBins): the tiled grid is
    # rows_buf[gidx] — no zeros-init and no scatter pass over the
    # (NT, K*128) grid.
    return rows_buf[bins.gidx]


@functools.partial(jax.jit, static_argnames=("K", "NT", "chunk"))
def _adjoint(plan, y, K, NT, chunk):
    """Tiled grid (NT, K*128) from samples y (M, K) (conj weights are the
    weights: KB factors are real)."""
    S = plan.S

    def one_chunk(carry, args):
        tid, wfac, yc = args
        m = yc.shape[0]
        W = _lane_weights(plan, wfac)              # (m, S, 128)
        contrib = yc[:, None, :, None] * W[:, :, None, :]
        contrib = contrib.reshape(m * S, K * 128)
        return carry.at[tid.reshape(-1)].add(contrib), None

    zero = jnp.zeros((NT, K * 128), jnp.float32)
    return _scan_chunks(one_chunk, zero, plan, y, chunk)


def _chunked(plan, chunk, y=None):
    M = plan.n_samples
    chunk = min(chunk, M)
    nchunk = -(-M // chunk)
    Mp = nchunk * chunk

    def padm(a):
        if a.shape[0] == Mp:
            return a
        pad = [(0, Mp - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)

    tid = padm(plan.tid).reshape(nchunk, chunk, plan.S)
    wfac = [padm(w).reshape(nchunk, chunk, *w.shape[1:]) for w in plan.wfac]
    if y is None:
        return nchunk, (tid, wfac)
    return nchunk, (tid, wfac, padm(y).reshape(nchunk, chunk, -1))


def _map_chunks(fn, plan, K, chunk):
    M = plan.n_samples
    nchunk, args = _chunked(plan, chunk)
    if nchunk == 1:
        return fn(jax.tree_util.tree_map(lambda a: a[0], args))[:M]
    out = jax.lax.map(fn, args)
    return out.reshape(-1, K)[:M]


def _scan_chunks(fn, init, plan, y, chunk):
    nchunk, args = _chunked(plan, chunk, y=y)
    if nchunk == 1:
        out, _ = fn(init, jax.tree_util.tree_map(lambda a: a[0], args))
        return out
    out, _ = jax.lax.scan(fn, init, args)
    return out


def tile_interp_apply(plan, x, adjoint=False, chunk=None):
    """Apply the gridding interpolation G (or its adjoint) via tile gathers.

    Forward: x (N, K) grid -> (M, K) samples. Adjoint: x (M, K) samples ->
    (N, K) grid. Complex inputs fold re/im into the K axis (the KB matrix is
    real), exactly like ops.spmm. ``chunk`` bounds the materialized gather
    scratch to ~chunk*S*K*128 floats on every path (default: ~256 MB); on
    the binned adjoint the same budget caps each class's expanded-weight +
    packed-gather scratch (its per-call packed table, M x ~64 f32, is not
    chunkable).
    """
    N = int(np.prod(plan.grid_shape))
    M = plan.n_samples
    if jnp.iscomplexobj(x):
        K = x.shape[1]
        xr = jnp.concatenate([x.real, x.imag], axis=1).astype(jnp.float32)
        yr = tile_interp_apply(plan, xr, adjoint=adjoint, chunk=chunk)
        return jax.lax.complex(yr[:, :K], yr[:, K:])
    x = x.astype(jnp.float32)
    K = x.shape[1]
    explicit_chunk = chunk is not None
    if chunk is None:
        # measured sweet spots (128^3 radial, v5e): the forward gather
        # prefers ~256MB of scratch; the wide-K adjoint scatter amortizes
        # better with ~1GB
        target = (1 << 30) if (adjoint and K > 4) else (1 << 28)
        chunk = max(1024, target // (plan.S * K * 512))
    if adjoint:
        return untile_grid(plan, _adjoint_tiled_real(plan, x, chunk,
                                                     explicit_chunk), K)
    assert x.shape[0] == N, (x.shape, N)
    xt = tile_grid(plan, x)
    if plan.fgroups is not None:
        return _forward_grouped(plan, xt, K, chunk)
    return _forward(plan, xt, K, chunk)


def _adjoint_tiled_real(plan, x, chunk, explicit_chunk):
    """Adjoint gridding of real (M, K) samples to the TILED grid layout."""
    K = x.shape[1]
    assert x.shape[0] == plan.n_samples, (x.shape, plan.n_samples)
    NT = int(np.prod(plan.nt))
    if plan.bins is not None:
        scratch = (chunk * plan.S * K * 128 if explicit_chunk
                   else _BIN_SCRATCH_ELEMS)
        return _adjoint_binned(plan, x, K, NT, scratch=scratch)
    return _adjoint(plan, x, K, NT, chunk)


def tile_forward_tiled(plan, xt, chunk=None):
    """Forward interpolation G from the TILED grid layout (NT, K*128).

    Dual of :func:`tile_adjoint_tiled`: callers producing the tiled layout
    directly (the transposed tiled DFT — see operators.GridDFT) skip
    tile_grid's pad+transpose. Returns (M, K) real f32 samples; complex
    folding (if any) is the caller's convention on the K axis.
    """
    K = xt.shape[1] // 128
    if chunk is None:
        target = (1 << 28)
        chunk = max(1024, target // (plan.S * K * 512))
    if plan.fgroups is not None:
        return _forward_grouped(plan, xt, K, chunk)
    return _forward(plan, xt, K, chunk)


def tile_adjoint_tiled(plan, x, chunk=None):
    """Adjoint gridding G^H to the tiled layout, skipping the untile.

    x: (M, K) samples, complex or real. Complex inputs fold re/im into the
    K axis exactly like :func:`tile_interp_apply`. Returns ``(xt, folded)``
    with xt the (NT, Kf*128) f32 tiled grid (Kf = 2K when ``folded``) —
    the layout :func:`indigo_tpu.ops.dft_fft.tiled_idft_apply` consumes
    directly, fusing away the untile transpose + periodic fold.
    """
    folded = bool(jnp.iscomplexobj(x))
    if folded:
        K = x.shape[1]
        x = jnp.concatenate([x.real, x.imag], axis=1)
    x = x.astype(jnp.float32)
    K = x.shape[1]
    explicit_chunk = chunk is not None
    if chunk is None:
        target = (1 << 30) if K > 4 else (1 << 28)
        chunk = max(1024, target // (plan.S * K * 512))
    return _adjoint_tiled_real(plan, x, chunk, explicit_chunk), folded
