"""Host-side matrix/vector partitioning for the sharded solver.

The reference's root process carves the COO matrix into a 2D process grid
and re-sends vector slices EVERY iteration (reference:
mpi/lanczos_modp.c:623-964, 967-1051).  Here the partition happens once at
load time, each device keeps its band resident in HBM, and nothing is ever
re-scattered: the kernel dimension N_eff is split into K equal bands
(padded), device k owning the nnz whose N-index falls in band k.  That
single partition serves BOTH SpMV directions:

  first  (tmp = Mt*v for left kernel): in = local band of v, out = full M_eff
         -> partial tmp, combined with ONE exact psum
  second (Av = M*tmp): in = replicated tmp, out = local band -> no comms

Per-shard operators are stacked on a leading mesh axis and device_put with
a NamedSharding, so each device materializes only its own band.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from block_lanczos_tpu.ops import spmm
from block_lanczos_tpu.ops.gfp import GFp
from block_lanczos_tpu.ops.spmm import SparseOp
from block_lanczos_tpu.utils.mmio import COOMatrix


@dataclasses.dataclass
class ShardedOps:
    """Stacked per-shard operators + dimensions (leading axis = mesh axis)."""
    n_shards: int
    band: int          # rows of the kernel dimension per shard
    np_rows: int       # padded kernel dimension (= band * n_shards)
    mp_rows: int       # padded other dimension
    n_eff: int
    m_eff: int
    # stacked (K, padded_nnz) / (K, out+1) arrays for each direction
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

    def local_first(self, oi, ii, vm, rp) -> SparseOp:
        """Rebuild the local 'first' op inside shard_map (out = full M_eff)."""
        return SparseOp(out_dim=self.mp_rows, in_dim=self.band, nnz=-1,
                        chunk=self.chunk, seg_safe=self.seg_safe,
                        out_idx=oi, in_idx=ii, val_mont=vm, rowptr=rp)

    def local_second(self, oi, ii, vm, rp) -> SparseOp:
        return SparseOp(out_dim=self.band, in_dim=self.mp_rows, nnz=-1,
                        chunk=self.chunk, seg_safe=self.seg_safe,
                        out_idx=oi, in_idx=ii, val_mont=vm, rowptr=rp)


def partition_matrix(f: GFp, M: COOMatrix, right: bool, mesh: jax.sharding.Mesh,
                     pad_multiple: int = 8,
                     chunk: int = spmm.DEFAULT_CHUNK) -> ShardedOps:
    """Split the matrix into kernel-dimension bands, one per mesh device."""
    axis = mesh.axis_names[0]
    K = mesh.shape[axis]
    n_eff = M.ncols if right else M.nrows   # kernel dimension
    m_eff = M.nrows if right else M.ncols
    key = (M.j if right else M.i).astype(np.int64)    # N-index per nnz
    other = (M.i if right else M.j).astype(np.int64)  # M-index per nnz

    band = ((n_eff + K * pad_multiple - 1) // (K * pad_multiple)) * pad_multiple
    np_rows = band * K
    mp_rows = ((m_eff + pad_multiple - 1) // pad_multiple) * pad_multiple

    shard_of = key // band
    first_parts, second_parts = [], []
    max_nnz = 1
    for k in range(K):
        sel = shard_of == k
        lk = (key[sel] - k * band).astype(np.int32)  # rebased local N-index
        ok = other[sel].astype(np.int32)
        xv = M.x[sel]
        max_nnz = max(max_nnz, len(xv))
        first_parts.append((ok, lk, xv))   # out = M-index, in = local N
        second_parts.append((lk, ok, xv))  # out = local N, in = M-index

    def build_stack(parts, out_dim):
        outs, ins, vals, rps = [], [], [], []
        safe = True
        for (oi, ii, xv) in parts:
            o, i, v, _, rp, s = spmm.build_op_arrays(
                f, oi, ii, xv, out_dim, chunk=chunk, pad_to=max_nnz)
            outs.append(o); ins.append(i); vals.append(v); rps.append(rp)
            safe = safe and s
        sharding = NamedSharding(mesh, P(axis))
        return (jax.device_put(np.stack(outs), sharding),
                jax.device_put(np.stack(ins), sharding),
                jax.device_put(np.stack(vals), sharding),
                jax.device_put(np.stack(rps), sharding), safe)

    f_o, f_i, f_v, f_rp, f_safe = build_stack(first_parts, mp_rows)
    s_o, s_i, s_v, s_rp, s_safe = build_stack(second_parts, band)
    return ShardedOps(n_shards=K, band=band, np_rows=np_rows, mp_rows=mp_rows,
                      n_eff=n_eff, m_eff=m_eff,
                      first_out=f_o, first_in=f_i, first_val=f_v,
                      first_rowptr=f_rp,
                      second_out=s_o, second_in=s_i, second_val=s_v,
                      second_rowptr=s_rp,
                      chunk=chunk, seg_safe=f_safe and s_safe)
