"""Host-side matrix/vector partitioning for the sharded solver.

The reference's root process carves the COO matrix into a 2D process grid
and re-sends vector slices EVERY iteration (reference:
mpi/lanczos_modp.c:623-964, 967-1051).  Here the partition happens once at
load time, each device keeps its block resident in HBM, and nothing is ever
re-scattered.

Grid partition over a ("rows", "cols") mesh of shape (R, C): device (r, c)
owns the nnz whose kernel-dimension index (N-index) falls in row-band r AND
whose other-dimension index (M-index) falls in col-band c.  The two SpMV
directions per device (both in the hybrid ELL+spill layout, see ops.spmm):

  first  (tmp partial): in = local N-band of v, out = local M-band
         -> exact psum over "rows" gives tmp sharded by cols
  second (Av partial): in = local M-band of tmp, out = local N-band
         -> exact psum over "cols" gives Av sharded by rows (no-op if C==1)

Per-shard operators are stacked on leading (R, C) axes and device_put with
a NamedSharding, so each device materializes only its own block.  shard_map
requires identical per-shard shapes, so the ELL width is the max of the
per-shard cost-model choices and the spill COO is padded to the max shard
spill.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from block_lanczos_tpu.ops import spmm
from block_lanczos_tpu.ops.gfp import GFp
from block_lanczos_tpu.ops.spmm import HybridOp, SparseOp
from block_lanczos_tpu.utils.mmio import COOMatrix
from block_lanczos_tpu.parallel.mesh import COLS_AXIS, ROWS_AXIS


@dataclasses.dataclass
class _StackedDir:
    """One SpMV direction: stacked (R, C, ...) hybrid arrays + static meta.

    Column slabs use the same two encodings as ops.spmm.HybridOp: absolute
    (`cols`, col0/dcols None) or u16-delta (`cols` None).  The mode is
    uniform across shards — shard_map needs identical per-shard pytrees.
    """
    ell: int
    seg_safe: bool
    cols: jax.Array | None   # (R, C, out_band, L) int32 (absolute mode)
    vals: jax.Array          # (R, C, out_band, L) uint32
    spill_out: jax.Array     # (R, C, spill_pad) int32
    spill_in: jax.Array      # (R, C, spill_pad) int32
    spill_val: jax.Array     # (R, C, spill_pad) uint32
    spill_rowptr: jax.Array  # (R, C, out_band + 1) int32
    col0: jax.Array | None = None   # (R, C, out_band) int32 (delta mode)
    dcols: jax.Array | None = None  # (R, C, out_band, L-1) uint16

    def leaves(self):
        slab = ((self.col0, self.dcols) if self.cols is None
                else (self.cols,))
        return (*slab, self.vals, self.spill_out, self.spill_in,
                self.spill_val, self.spill_rowptr)


@dataclasses.dataclass
class ShardedOps:
    """Stacked per-shard operators + dimensions (leading axes = mesh grid)."""
    grid: tuple[int, int]  # (R, C)
    band: int          # N-rows per row-shard
    mband: int         # M-rows per col-shard
    np_rows: int       # padded kernel dimension  (= band * R)
    mp_rows: int       # padded other dimension   (= mband * C)
    n_eff: int
    m_eff: int
    first: _StackedDir
    second: _StackedDir
    chunk: int

    @property
    def n_shards(self) -> int:
        return self.grid[0] * self.grid[1]

    def _local(self, d, out_dim: int, in_dim: int, leaves):
        if isinstance(d, _BandedStackedDir):
            return d.local(out_dim, self.chunk, leaves)
        return _local_hybrid(d, out_dim, in_dim, self.chunk, leaves)

    def local_first(self, leaves):
        return self._local(self.first, self.mband, self.band, leaves)

    def local_second(self, leaves):
        return self._local(self.second, self.band, self.mband, leaves)


def _local_hybrid(d: _StackedDir, out_dim: int, in_dim: int, chunk: int,
                  leaves) -> HybridOp:
    """Slice this device's (0,0) shard out of the stacked leaves (inside
    shard_map every device sees its own block at index (0,0))."""
    sl = [leaf[0, 0] for leaf in leaves]
    if d.cols is None:
        col0, dcols, vals = sl[0], sl[1], sl[2]
        cols, rest = None, sl[3:]
    else:
        cols, vals = sl[0], sl[1]
        col0 = dcols = None
        rest = sl[2:]
    s_o, s_i, s_v, s_rp = rest
    spill = SparseOp(out_dim=out_dim, in_dim=in_dim, nnz=-1,
                     chunk=chunk, seg_safe=d.seg_safe,
                     out_idx=s_o, in_idx=s_i, val_mont=s_v, rowptr=s_rp)
    return HybridOp(out_dim=out_dim, in_dim=in_dim, nnz=-1, ell=d.ell,
                    cols=cols, vals=vals, spill=spill,
                    col0=col0, dcols=dcols)


@dataclasses.dataclass
class _BandedStackedDir:
    """Input-banded variant of _StackedDir: one sub-dir per in-band, same
    bands on every shard (shard_map uniformity).  The local op becomes a
    spmm.BandedOp so per-shard gather tables stay under the staging budget
    (same measured policy as the single-device path — spmm.band_count)."""
    bounds: tuple                 # ((lo, hi), ...) in-band bounds
    dirs: tuple                   # tuple[_StackedDir, ...]

    def leaves(self):
        return tuple(leaf for d in self.dirs for leaf in d.leaves())

    def local(self, out_dim: int, chunk: int, leaves) -> spmm.BandedOp:
        parts, used = [], 0
        for (lo, hi), d in zip(self.bounds, self.dirs):
            k = len(d.leaves())
            parts.append(_local_hybrid(d, out_dim, hi - lo, chunk,
                                       leaves[used:used + k]))
            used += k
        return spmm.BandedOp(out_dim=out_dim, in_dim=self.bounds[-1][1],
                             nnz=-1, bounds=self.bounds, parts=tuple(parts))


def _band_size(dim: int, parts: int, multiple: int) -> int:
    return ((dim + parts * multiple - 1) // (parts * multiple)) * multiple


def _build_dir(f: GFp, parts, out_dim: int, R: int, C: int,
               nnz_sharding, chunk: int, delta: bool = True) -> _StackedDir:
    """Build one stacked SpMV direction over the (R, C) part list."""
    # uniform slab width: max of per-shard cost-model choices
    ell = 1
    for (oi, _ii, _xv) in parts:
        counts = (np.bincount(oi, minlength=out_dim) if len(oi)
                  else np.zeros(out_dim, np.int64))
        ell = max(ell, spmm.choose_ell_width(counts))
    # first pass: spill sizes -> common pad
    spill_pad = 1
    built = []
    for (oi, ii, xv) in parts:
        res = spmm.build_hybrid_arrays(
            f, oi, ii, xv, out_dim, out_dim, ell, chunk=chunk, delta=delta)
        built.append(res)
        spill_pad = max(spill_pad, res[1][0].shape[0])
    # shard_map needs a uniform slab encoding across shards
    if delta and any(not slab.delta for slab, _, _ in built):
        return _build_dir(f, parts, out_dim, R, C, nnz_sharding, chunk,
                          delta=False)
    # rebuild spills padded to the common size
    slab_l, so_l, si_l, sv_l, srp_l = [], [], [], [], []
    seg_safe = True
    for (slab, spill_t, _nnz), (oi, ii, xv) in zip(built, parts):
        if spill_t[0].shape[0] != spill_pad:
            slab, spill_t, _n = spmm.build_hybrid_arrays(
                f, oi, ii, xv, out_dim, out_dim, ell, chunk=chunk,
                spill_pad_to=spill_pad, delta=delta)
        s_o, s_i, s_v, _s_nnz, s_rp, s_safe = spill_t
        seg_safe = seg_safe and s_safe
        slab_l.append(slab)
        so_l.append(s_o); si_l.append(s_i); sv_l.append(s_v)
        srp_l.append(s_rp)

    def stack(xs):
        from block_lanczos_tpu.parallel.multihost import put_global
        arr = np.stack(xs)
        arr = arr.reshape((R, C) + arr.shape[1:])
        return put_global(arr, nnz_sharding)

    is_delta = slab_l[0].delta
    return _StackedDir(
        ell=ell, seg_safe=seg_safe,
        cols=None if is_delta else stack([s.cols for s in slab_l]),
        vals=stack([s.vals for s in slab_l]),
        spill_out=stack(so_l), spill_in=stack(si_l),
        spill_val=stack(sv_l), spill_rowptr=stack(srp_l),
        col0=stack([s.col0 for s in slab_l]) if is_delta else None,
        dcols=stack([s.dcols for s in slab_l]) if is_delta else None)


def _build_dir_banded(f: GFp, parts, out_dim: int, in_dim: int, n: int,
                      R: int, C: int, nnz_sharding, chunk: int,
                      delta: bool = True):
    """_build_dir with the measured input-banding policy applied per shard
    (spmm.band_count on the LOCAL in-band size; same bands on every shard)."""
    nb = spmm.band_count(in_dim, n)
    if nb == 1:
        return _build_dir(f, parts, out_dim, R, C, nnz_sharding, chunk,
                          delta=delta)
    bounds, dirs = [], []
    for lo, hi in spmm.band_bounds(in_dim, nb):
        sub = []
        for (oi, ii, xv) in parts:
            sel = (ii >= lo) & (ii < hi)
            sub.append((oi[sel], (ii[sel] - lo).astype(np.int32), xv[sel]))
        dirs.append(_build_dir(f, sub, out_dim, R, C, nnz_sharding, chunk,
                               delta=delta))
        bounds.append((lo, hi))
    return _BandedStackedDir(tuple(bounds), tuple(dirs))


def partition_matrix(f: GFp, M: COOMatrix, right: bool,
                     mesh: jax.sharding.Mesh, pad_multiple: int = 8,
                     chunk: int = spmm.DEFAULT_CHUNK,
                     n: int = 1) -> ShardedOps:
    """Split the matrix into an (R, C) grid of blocks, one per mesh device."""
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    n_eff = M.ncols if right else M.nrows   # kernel dimension
    m_eff = M.nrows if right else M.ncols
    key = (M.j if right else M.i).astype(np.int64)    # N-index per nnz
    other = (M.i if right else M.j).astype(np.int64)  # M-index per nnz

    band = _band_size(n_eff, R, pad_multiple)
    mband = _band_size(m_eff, C, pad_multiple)

    rshard = key // band
    cshard = other // mband
    first_parts, second_parts = [], []
    for r in range(R):
        for c in range(C):
            sel = (rshard == r) & (cshard == c)
            lk = (key[sel] - r * band).astype(np.int32)     # local N-index
            lo = (other[sel] - c * mband).astype(np.int32)  # local M-index
            xv = M.x[sel]
            first_parts.append((lo, lk, xv))   # out = local M, in = local N
            second_parts.append((lk, lo, xv))  # out = local N, in = local M

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    first = _build_dir_banded(f, first_parts, mband, band, n, R, C,
                              nnz_sharding, chunk)
    second = _build_dir_banded(f, second_parts, band, mband, n, R, C,
                               nnz_sharding, chunk)
    return ShardedOps(grid=(R, C), band=band, mband=mband,
                      np_rows=band * R, mp_rows=mband * C,
                      n_eff=n_eff, m_eff=m_eff,
                      first=first, second=second, chunk=chunk)


@dataclasses.dataclass
class OverlapShardedOps:
    """ShardedOps variant with each SpMV direction split into two row
    chunks, so the psum of chunk A can overlap chunk B's local compute
    (the north-star "halo psum overlapped with SpMV" — XLA's async
    collective scheduler interleaves them once the ops are independent).
    Bit-exact with the unchunked layout by construction.
    """
    grid: tuple
    band: int
    mband: int
    np_rows: int
    mp_rows: int
    n_eff: int
    m_eff: int
    ha: int            # first-direction split row (out dim = mband)
    hb: int            # second-direction split row (out dim = band)
    first_a: _StackedDir
    first_b: _StackedDir
    second_a: _StackedDir
    second_b: _StackedDir
    chunk: int

    def _local(self, d: _StackedDir, out_dim: int, in_dim: int,
               leaves) -> HybridOp:
        return _local_hybrid(d, out_dim, in_dim, self.chunk, leaves)

    def leaves(self):
        return (self.first_a.leaves(), self.first_b.leaves(),
                self.second_a.leaves(), self.second_b.leaves())


def partition_matrix_overlap(f: GFp, M: COOMatrix, right: bool,
                             mesh: jax.sharding.Mesh, pad_multiple: int = 8,
                             chunk: int = spmm.DEFAULT_CHUNK
                             ) -> OverlapShardedOps:
    """2D partition with each direction's output rows split in half."""
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    n_eff = M.ncols if right else M.nrows
    m_eff = M.nrows if right else M.ncols
    key = (M.j if right else M.i).astype(np.int64)
    other = (M.i if right else M.j).astype(np.int64)
    band = _band_size(n_eff, R, pad_multiple)
    mband = _band_size(m_eff, C, pad_multiple)
    ha = (mband // 2 // pad_multiple) * pad_multiple
    hb = (band // 2 // pad_multiple) * pad_multiple
    if not (0 < ha < mband and 0 < hb < band):
        raise ValueError(
            "matrix bands too small to chunk for comm/compute overlap; "
            "use the default ShardedBlockLanczos")

    rshard = key // band
    cshard = other // mband
    fa, fb, sa, sb = [], [], [], []
    for r in range(R):
        for c in range(C):
            sel = (rshard == r) & (cshard == c)
            lk = (key[sel] - r * band).astype(np.int32)
            lo = (other[sel] - c * mband).astype(np.int32)
            xv = M.x[sel]
            m_lo = lo < ha
            fa.append((lo[m_lo], lk[m_lo], xv[m_lo]))
            fb.append(((lo[~m_lo] - ha).astype(np.int32), lk[~m_lo],
                       xv[~m_lo]))
            m_lk = lk < hb
            sa.append((lk[m_lk], lo[m_lk], xv[m_lk]))
            sb.append(((lk[~m_lk] - hb).astype(np.int32), lo[~m_lk],
                       xv[~m_lk]))

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    return OverlapShardedOps(
        grid=(R, C), band=band, mband=mband,
        np_rows=band * R, mp_rows=mband * C, n_eff=n_eff, m_eff=m_eff,
        ha=ha, hb=hb,
        first_a=_build_dir(f, fa, ha, R, C, nnz_sharding, chunk),
        first_b=_build_dir(f, fb, mband - ha, R, C, nnz_sharding, chunk),
        second_a=_build_dir(f, sa, hb, R, C, nnz_sharding, chunk),
        second_b=_build_dir(f, sb, band - hb, R, C, nnz_sharding, chunk),
        chunk=chunk)
