"""Sparse matrix-times-vector-block (SpMM) over GF(p) on TPU.

The reference's hot loop (62% of runtime) is a COO scatter with a `% prime`
after every FMA (reference: sequential/lanczos_modp.c:266-287).  The TPU
formulation instead:

  * stores the matrix twice, row-sorted and column-sorted, so both y = M*x
    and y = M^T*x are gather + segment-sum over *sorted* output ids,
  * keeps coefficients pre-converted to the Montgomery domain at load time,
    so each product is ONE mont_mul (exact, no divide),
  * defers reduction: products < p < 2^30 are split into 15-bit limbs and
    accumulated with plain uint32 adds (the TPU analogue of the reference's
    "accumulate in u64, reduce once" OpenMP optimization,
    reference: openMP/lanczos_modp.c:329-374) — overflow-safe by
    construction for segments up to 2^17 elements,
  * chunks the nnz axis with lax.scan so the temporary (chunk, n) product
    block stays small and every segment-within-chunk respects the limb bound.

All shapes are static; the nnz axis is padded to a multiple of the chunk
size with zero-valued entries (additive identity).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from block_lanczos_tpu import native
from block_lanczos_tpu.ops import gfp
from block_lanczos_tpu.ops.gfp import GFp, u32
from block_lanczos_tpu.utils.mmio import COOMatrix

# Max entries per scan chunk == max segment length inside one segment-sum.
# Must be <= gfp.LIMB_SUM_MAX.
DEFAULT_CHUNK = 1 << 17


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseOp:
    """One direction of a sparse operator: y[out] += val * x[in].

    Entries are sorted by out_idx; val_mont is in the Montgomery domain
    (val * R mod p) so mont_mul(val_mont, x) == val * x mod p exactly.
    rowptr is the CSR-style segment-boundary array over the TRUE entries
    (padding lives past rowptr[out_dim] or contributes zeros), which lets
    the segment reduction run scatter-free via prefix sums.
    """
    out_dim: int
    in_dim: int
    nnz: int          # true nnz (before padding)
    chunk: int
    seg_safe: bool    # max segment length <= LIMB_SUM_MAX
    out_idx: jax.Array  # (padded_nnz,) int32, sorted
    in_idx: jax.Array   # (padded_nnz,) int32
    val_mont: jax.Array  # (padded_nnz,) uint32
    rowptr: jax.Array   # (out_dim + 1,) int32

    def tree_flatten(self):
        return ((self.out_idx, self.in_idx, self.val_mont, self.rowptr),
                (self.out_dim, self.in_dim, self.nnz, self.chunk,
                 self.seg_safe))

    @classmethod
    def tree_unflatten(cls, aux, children):
        out_idx, in_idx, val_mont, rowptr = children
        out_dim, in_dim, nnz, chunk, seg_safe = aux
        return cls(out_dim, in_dim, nnz, chunk, seg_safe,
                   out_idx, in_idx, val_mont, rowptr)


def _sort_by(key_idx, other_idx, vals, key_dim):
    """Sort by (key_idx, other_idx): row-major with ascending column within
    each row.  The secondary key costs nothing for correctness (segment sums
    are order-independent) and improves gather locality on TPU — consecutive
    nnz hit ascending x rows."""
    order = np.lexsort((other_idx, key_idx))
    return (np.asarray(key_idx, np.int32)[order],
            np.asarray(other_idx, np.int32)[order],
            np.asarray(vals, np.uint32)[order])


def build_op_arrays(f: GFp, out_idx, in_idx, vals, out_dim: int,
                    chunk: int = DEFAULT_CHUNK, pad_to: int | None = None,
                    sort: bool = True):
    """Host-side SparseOp array construction (sort, Montgomery, padding).

    Returns (out_idx, in_idx, val_mont, nnz, rowptr, seg_safe) as NumPy
    arrays padded to a multiple of `chunk` (at least `pad_to` entries if
    given — used to equalize shard shapes for shard_map).
    """
    assert chunk <= gfp.LIMB_SUM_MAX
    out_idx = np.asarray(out_idx, np.int32)
    in_idx = np.asarray(in_idx, np.int32)
    vals = np.asarray(vals, np.uint32)
    if sort:
        out_idx, in_idx, vals = _sort_by(out_idx, in_idx, vals, out_dim)
    nnz = len(vals)
    if f.use_mont:  # val * R mod p (fits u64: val < 2^30, R = 2^32)
        vm = ((vals.astype(np.uint64) << 32) % np.uint64(f.p)).astype(np.uint32)
    else:
        vm = vals % np.uint32(f.p)
    # CSR-style segment boundaries over the true (sorted) entries
    rowptr = np.searchsorted(out_idx, np.arange(out_dim + 1)).astype(np.int32)
    seg_safe = bool((np.diff(rowptr) <= gfp.LIMB_SUM_MAX).all())
    target = max(nnz, pad_to or 0, 1)
    target += (-target) % chunk
    pad = target - nnz
    if pad:
        # zero-valued padding entries scatter 0; pad out_idx with the last
        # (max) id so the array stays sorted for indices_are_sorted=True
        last = out_idx[-1] if nnz else np.int32(0)
        out_idx = np.concatenate([out_idx, np.full(pad, last, np.int32)])
        in_idx = np.concatenate([in_idx, np.zeros(pad, np.int32)])
        vm = np.concatenate([vm, np.zeros(pad, np.uint32)])
    return out_idx, in_idx, vm, nnz, rowptr, seg_safe


def make_sparse_op(f: GFp, out_idx, in_idx, vals, out_dim: int, in_dim: int,
                   chunk: int = DEFAULT_CHUNK, sort: bool = True) -> SparseOp:
    """Build a device SparseOp from host COO arrays (values in [0, p))."""
    oi, ii, vm, nnz, rowptr, seg_safe = build_op_arrays(
        f, out_idx, in_idx, vals, out_dim, chunk=chunk, sort=sort)
    return SparseOp(out_dim=out_dim, in_dim=in_dim, nnz=nnz, chunk=chunk,
                    seg_safe=seg_safe,
                    out_idx=jnp.asarray(oi), in_idx=jnp.asarray(ii),
                    val_mont=jnp.asarray(vm), rowptr=jnp.asarray(rowptr))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SpMatrix:
    """A sparse matrix with both application directions resident on device."""
    nrows: int
    ncols: int
    nnz: int
    fwd: SparseOp  # y (nrows) = M  * x (ncols)
    bwd: SparseOp  # y (ncols) = M^T * x (nrows)

    def tree_flatten(self):
        return ((self.fwd, self.bwd), (self.nrows, self.ncols, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        fwd, bwd = children
        nrows, ncols, nnz = aux
        return cls(nrows, ncols, nnz, fwd, bwd)

    @staticmethod
    def from_coo(f: GFp, M: COOMatrix, chunk: int = DEFAULT_CHUNK) -> "SpMatrix":
        fwd = make_sparse_op(f, M.i, M.j, M.x, M.nrows, M.ncols, chunk)
        bwd = make_sparse_op(f, M.j, M.i, M.x, M.ncols, M.nrows, chunk)
        return SpMatrix(M.nrows, M.ncols, M.nnz, fwd, bwd)


def spmv_block(f: GFp, op: SparseOp, x, out_rows: int | None = None):
    """y = op * x exactly mod p.

    x: (in_pad, n) uint32 with in_pad >= op.in_dim; returns (out_rows, n)
    with out_rows >= op.out_dim (default op.out_dim); rows beyond the true
    output dimension are zero, matching the reference's zero-padded blocks.

    Fast path: gather + ONE fused elementwise mont_mul + limb prefix-sums +
    rowptr differences.  XLA TPU scatter serializes on colliding indices
    (measured 25x slower than this), so the segment reduction is done
    scatter-free: with entries sorted by output row, the segment sum is the
    difference of an (exclusive) running prefix at the row boundaries;
    uint32 wrap-around keeps the differences exact because every true
    segment sum of 15-bit limbs stays below 2^32 (seg_safe).
    """
    if out_rows is None:
        out_rows = op.out_dim
    if op.seg_safe:
        return _spmv_prefix(f, op, x, out_rows)
    return _spmv_scan(f, op, x, out_rows)


def _spmv_prefix(f: GFp, op: SparseOp, x, out_rows: int):
    n = x.shape[1]
    prod = gfp.mont_mul(f, op.val_mont[:, None], x[op.in_idx])  # (nnzp, n)
    hi, lo = gfp.limb_split(prod)
    zero = jnp.zeros((1, n), u32)
    ph = jnp.concatenate([zero, jnp.cumsum(hi, axis=0, dtype=u32)])
    pl = jnp.concatenate([zero, jnp.cumsum(lo, axis=0, dtype=u32)])
    lo_b = op.rowptr[:-1]
    hi_b = op.rowptr[1:]
    yh = ph[hi_b] - ph[lo_b]   # wrap-exact: true segment sums < 2^32
    yl = pl[hi_b] - pl[lo_b]
    y = gfp.limb_combine(f, yh, yl)
    if out_rows > op.out_dim:
        y = jnp.pad(y, ((0, out_rows - op.out_dim), (0, 0)))
    return y


def _spmv_scan(f: GFp, op: SparseOp, x, out_rows: int):
    """Fallback for pathological segment lengths (> 2^17 nnz in one row):
    chunked scan where each chunk's segments are bounded by the chunk size."""
    n = x.shape[1]
    padded_nnz = op.out_idx.shape[0]
    nchunks = padded_nnz // op.chunk

    def one_chunk(oi, ii, vm):
        prod = gfp.mont_mul(f, vm[:, None], x[ii])        # (chunk, n), < p
        hi, lo = gfp.limb_split(prod)
        hi_s = jax.ops.segment_sum(hi, oi, num_segments=out_rows,
                                   indices_are_sorted=True)
        lo_s = jax.ops.segment_sum(lo, oi, num_segments=out_rows,
                                   indices_are_sorted=True)
        return hi_s, lo_s

    if nchunks == 1:
        hi_s, lo_s = one_chunk(op.out_idx, op.in_idx, op.val_mont)
        return gfp.limb_combine(f, hi_s, lo_s)

    def body(y, chunk):
        oi, ii, vm = chunk
        hi_s, lo_s = one_chunk(oi, ii, vm)
        return gfp.modadd(f, y, gfp.limb_combine(f, hi_s, lo_s)), None

    chunks = (op.out_idx.reshape(nchunks, op.chunk),
              op.in_idx.reshape(nchunks, op.chunk),
              op.val_mont.reshape(nchunks, op.chunk))
    y0 = jnp.zeros((out_rows, n), u32)
    y, _ = jax.lax.scan(body, y0, chunks)
    return y


def spmv_reference_np(p: int, nrows, i, j, x, v):
    """Host oracle: y[i] += x*v[j] mod p with exact object/int64 arithmetic."""
    n = v.shape[1]
    y = np.zeros((nrows, n), np.uint64)
    np_p = np.uint64(p)
    for k in range(len(x)):  # slow; tests only
        y[i[k]] = (y[i[k]] + np.uint64(x[k]) * v[j[k]].astype(np.uint64)) % np_p
    return y.astype(np.uint32)
