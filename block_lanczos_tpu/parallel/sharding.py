"""Host-side matrix/vector partitioning for the sharded solver.

The reference's root process carves the COO matrix into a 2D process grid
and re-sends vector slices EVERY iteration (reference:
mpi/lanczos_modp.c:623-964, 967-1051).  Here the partition happens once at
load time, each device keeps its block resident in HBM, and nothing is ever
re-scattered.

Grid partition over a ("rows", "cols") mesh of shape (R, C): device (r, c)
owns the nnz whose kernel-dimension index (N-index) falls in row-band r AND
whose other-dimension index (M-index) falls in col-band c.  The two SpMV
directions per device:

  first  (tmp partial): in = local N-band of v, out = local M-band
         -> exact psum over "rows" gives tmp sharded by cols
  second (Av partial): in = local M-band of tmp, out = local N-band
         -> exact psum over "cols" gives Av sharded by rows (no-op if C==1)

Per-shard operators are stacked on leading (R, C) axes and device_put with
a NamedSharding, so each device materializes only its own block.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from block_lanczos_tpu.ops import spmm
from block_lanczos_tpu.ops.gfp import GFp
from block_lanczos_tpu.ops.spmm import SparseOp
from block_lanczos_tpu.utils.mmio import COOMatrix
from block_lanczos_tpu.parallel.mesh import COLS_AXIS, ROWS_AXIS


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
    # stacked (R, C, padded_nnz) / (R, C, out+1) arrays for each direction
    first_out: jax.Array
    first_in: jax.Array
    first_val: jax.Array
    first_rowptr: jax.Array
    second_out: jax.Array
    second_in: jax.Array
    second_val: jax.Array
    second_rowptr: jax.Array
    chunk: int
    seg_safe: bool  # True iff EVERY shard's ops are prefix-sum safe

    @property
    def n_shards(self) -> int:
        return self.grid[0] * self.grid[1]

    def local_first(self, oi, ii, vm, rp) -> SparseOp:
        """Local 'first' op inside shard_map (out = local M-band)."""
        return SparseOp(out_dim=self.mband, in_dim=self.band, nnz=-1,
                        chunk=self.chunk, seg_safe=self.seg_safe,
                        out_idx=oi, in_idx=ii, val_mont=vm, rowptr=rp)

    def local_second(self, oi, ii, vm, rp) -> SparseOp:
        return SparseOp(out_dim=self.band, in_dim=self.mband, nnz=-1,
                        chunk=self.chunk, seg_safe=self.seg_safe,
                        out_idx=oi, in_idx=ii, val_mont=vm, rowptr=rp)


def _band_size(dim: int, parts: int, multiple: int) -> int:
    return ((dim + parts * multiple - 1) // (parts * multiple)) * multiple


def partition_matrix(f: GFp, M: COOMatrix, right: bool,
                     mesh: jax.sharding.Mesh, pad_multiple: int = 8,
                     chunk: int = spmm.DEFAULT_CHUNK) -> ShardedOps:
    """Split the matrix into an (R, C) grid of blocks, one per mesh device."""
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    n_eff = M.ncols if right else M.nrows   # kernel dimension
    m_eff = M.nrows if right else M.ncols
    key = (M.j if right else M.i).astype(np.int64)    # N-index per nnz
    other = (M.i if right else M.j).astype(np.int64)  # M-index per nnz

    band = _band_size(n_eff, R, pad_multiple)
    mband = _band_size(m_eff, C, pad_multiple)
    np_rows = band * R
    mp_rows = mband * C

    rshard = key // band
    cshard = other // mband
    first_parts, second_parts = [], []
    max_nnz = 1
    for r in range(R):
        for c in range(C):
            sel = (rshard == r) & (cshard == c)
            lk = (key[sel] - r * band).astype(np.int32)     # local N-index
            lo = (other[sel] - c * mband).astype(np.int32)  # local M-index
            xv = M.x[sel]
            max_nnz = max(max_nnz, len(xv))
            first_parts.append((lo, lk, xv))   # out = local M, in = local N
            second_parts.append((lk, lo, xv))  # out = local N, in = local M

    def build_stack(parts, out_dim):
        outs, ins, vals, rps = [], [], [], []
        safe = True
        for (oi, ii, xv) in parts:
            o, i, v, _, rp, s = spmm.build_op_arrays(
                f, oi, ii, xv, out_dim, chunk=chunk, pad_to=max_nnz)
            outs.append(o); ins.append(i); vals.append(v); rps.append(rp)
            safe = safe and s
        shard = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))

        def stack(xs):
            arr = np.stack(xs).reshape(R, C, -1)
            return jax.device_put(arr, shard)

        return stack(outs), stack(ins), stack(vals), stack(rps), safe

    f_o, f_i, f_v, f_rp, f_safe = build_stack(first_parts, mband)
    s_o, s_i, s_v, s_rp, s_safe = build_stack(second_parts, band)
    return ShardedOps(grid=(R, C), band=band, mband=mband,
                      np_rows=np_rows, mp_rows=mp_rows,
                      n_eff=n_eff, m_eff=m_eff,
                      first_out=f_o, first_in=f_i, first_val=f_v,
                      first_rowptr=f_rp,
                      second_out=s_o, second_in=s_i, second_val=s_v,
                      second_rowptr=s_rp,
                      chunk=chunk, seg_safe=f_safe and s_safe)
