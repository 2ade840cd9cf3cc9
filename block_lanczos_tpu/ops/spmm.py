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

import jax
import jax.numpy as jnp
import numpy as np

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
    def from_coo(f: GFp, M: COOMatrix, chunk: int = DEFAULT_CHUNK,
                 layout: str = "hybrid") -> "SpMatrix":
        if layout == "hybrid":
            fwd = make_hybrid_op(f, M.i, M.j, M.x, M.nrows, M.ncols,
                                 chunk=chunk)
            bwd = make_hybrid_op(f, M.j, M.i, M.x, M.ncols, M.nrows,
                                 chunk=chunk)
        elif layout == "coo":
            fwd = make_sparse_op(f, M.i, M.j, M.x, M.nrows, M.ncols, chunk)
            bwd = make_sparse_op(f, M.j, M.i, M.x, M.ncols, M.nrows, chunk)
        else:
            raise ValueError(f"unknown layout {layout!r}")
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
    if isinstance(op, HybridOp):
        return spmv_hybrid(f, op, x, out_rows)
    if out_rows is None:
        out_rows = op.out_dim
    if op.seg_safe:
        return _spmv_prefix(f, op, x, out_rows)
    return _spmv_scan(f, op, x, out_rows)


def _spmv_prefix(f: GFp, op: SparseOp, x, out_rows: int):
    n = x.shape[1]
    prod = gfp.mont_mul(f, op.val_mont[:, None], x[op.in_idx])  # (nnzp, n)
    hi, lo = gfp.limb_split(prod)
    # one fused prefix over both limbs (2n lanes) and one boundary gather
    hl = jnp.concatenate([hi, lo], axis=1)            # (nnzp, 2n)
    pref = jnp.cumsum(hl, axis=0, dtype=u32)
    pref = jnp.concatenate([jnp.zeros((1, 2 * n), u32), pref])
    seg = pref[op.rowptr[1:]] - pref[op.rowptr[:-1]]  # wrap-exact (< 2^32)
    y = gfp.limb_combine(f, seg[:, :n], seg[:, n:])
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


# ---------------------------------------------------------------------------
# Hybrid ELL + spill layout — the production SpMV path
# ---------------------------------------------------------------------------
#
# The prefix-sum path reads/writes O(nnz * n) prefix state; measured on TPU
# the gather is row-count-bound (~3ns/row, independent of n), so a k-loop
# over a fixed-width ELL slab — L gathers of (rows, n) with in-register
# modadd accumulation — is 1.8x (n=4) to 4.5x (n=64) faster.  Rows denser
# than the chosen width spill their excess entries to a small COO sidecar
# handled by the prefix path, which keeps the slab width near the mean nnz
# per row even for skewed matrices.  Static shapes everywhere.

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HybridOp:
    """y[r] = sum_k vals[r,k] * x[cols[r,k]]  (+ spill)  exactly mod p."""
    out_dim: int
    in_dim: int
    nnz: int
    ell: int               # slab width L (static)
    cols: jax.Array        # (out_pad, L) int32
    vals: jax.Array        # (out_pad, L) uint32, Montgomery form
    spill: SparseOp        # possibly empty (nnz == 0)

    def tree_flatten(self):
        return ((self.cols, self.vals, self.spill),
                (self.out_dim, self.in_dim, self.nnz, self.ell))

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals, spill = children
        out_dim, in_dim, nnz, ell = aux
        return cls(out_dim, in_dim, nnz, ell, cols, vals, spill)


def choose_ell_width(counts: np.ndarray, spill_cost: float = 3.0) -> int:
    """Pick the slab width minimizing  rows*L + spill_cost*spill_nnz(L).

    spill_cost models the prefix path's per-entry overhead vs a slab slot.
    """
    counts = np.asarray(counts)
    if counts.size == 0 or counts.max() == 0:
        return 1
    cands = np.unique(np.concatenate([
        np.percentile(counts[counts > 0], [50, 75, 90, 95, 99, 100])
        .astype(np.int64),
        [1, int(counts.mean() + 1)]]))
    cands = cands[cands >= 1]
    best, best_cost = 1, None
    for L in cands:
        spill = np.maximum(counts - L, 0).sum()
        cost = float(len(counts) * L + spill_cost * spill)
        if best_cost is None or cost < best_cost:
            best, best_cost = int(L), cost
    return best


def _within_row_positions(sorted_out_idx: np.ndarray) -> np.ndarray:
    """pos[e] = rank of entry e within its (sorted) out_idx run.

    O(nnz) sequential passes — np.repeat(starts, counts) and starts[oi]
    gathers both measured 30-70 s at 50M nnz on shared hosts.
    """
    nnz = len(sorted_out_idx)
    if nnz == 0:
        return np.zeros(0, np.int64)
    idx = np.arange(nnz, dtype=np.int64)
    same = np.empty(nnz, bool)
    same[0] = False
    np.equal(sorted_out_idx[1:], sorted_out_idx[:-1], out=same[1:])
    run_start = np.where(same, 0, idx)  # run heads keep their index
    np.maximum.accumulate(run_start, out=run_start)
    return idx - run_start


def build_hybrid_arrays(f: GFp, out_idx, in_idx, vals, out_dim: int,
                        out_pad: int, ell: int,
                        chunk: int = DEFAULT_CHUNK,
                        spill_pad_to: int | None = None, sort: bool = True):
    """Host-side construction of the ELL slab + spill COO (NumPy arrays).

    Returns (cols2d, vals2d, spill_tuple, nnz) where spill_tuple is the
    build_op_arrays output for the overflow entries.
    """
    out_idx = np.asarray(out_idx, np.int64)
    in_idx = np.asarray(in_idx, np.int64)
    vals = np.asarray(vals, np.uint32)
    nnz = len(vals)
    sorted_native = False
    if sort and nnz:
        # native counting sort by row: O(nnz) vs lexsort+gathers (~50 s at
        # 50M nnz).  Within-row order becomes file order instead of
        # column-sorted — irrelevant: exact sums are order-independent and
        # gather cost is locality-independent (PERF.md).
        from block_lanczos_tpu import native
        csr = native.coo_to_csr(out_dim, out_idx.astype(np.int32),
                                in_idx.astype(np.int32), vals)
        if csr is not None:
            rowptr_full, in_idx, vals = csr
            in_idx = in_idx.astype(np.int64)
            counts = np.diff(rowptr_full)
            # reconstruct sorted row ids via run-head max-scan (rows ascend)
            out_idx = np.zeros(nnz, np.int64)
            heads = rowptr_full[:-1][counts > 0]
            out_idx[heads] = np.nonzero(counts > 0)[0]
            np.maximum.accumulate(out_idx, out=out_idx)
            sorted_native = True
    if sort and not sorted_native:
        order = np.lexsort((in_idx, out_idx))
        out_idx, in_idx, vals = out_idx[order], in_idx[order], vals[order]
    if not sorted_native:
        counts = np.bincount(out_idx, minlength=out_dim) if nnz else \
            np.zeros(out_dim, np.int64)
    pos = _within_row_positions(out_idx)

    if f.use_mont:
        vm = ((vals.astype(np.uint64) << 32) % np.uint64(f.p)).astype(np.uint32)
    else:
        vm = vals % np.uint32(f.p)

    in_slab = pos < ell
    # flat-index fill: ~4x faster than 2D fancy assignment at 50M+ nnz
    flat = (out_idx * ell + pos)[in_slab]
    cols2d = np.zeros(out_pad * ell, np.int32)
    vals2d = np.zeros(out_pad * ell, np.uint32)
    cols2d[flat] = in_idx[in_slab]
    vals2d[flat] = vm[in_slab]
    cols2d = cols2d.reshape(out_pad, ell)
    vals2d = vals2d.reshape(out_pad, ell)

    sp = ~in_slab
    spill_tuple = build_op_arrays(
        f, out_idx[sp].astype(np.int32), in_idx[sp].astype(np.int32),
        vals[sp], out_dim, chunk=chunk, pad_to=spill_pad_to, sort=False)
    return cols2d, vals2d, spill_tuple, nnz


def make_hybrid_op(f: GFp, out_idx, in_idx, vals, out_dim: int, in_dim: int,
                   out_pad: int | None = None, ell: int | None = None,
                   chunk: int = DEFAULT_CHUNK) -> HybridOp:
    if out_pad is None:
        out_pad = out_dim
    if ell is None:
        counts = (np.bincount(np.asarray(out_idx, np.int64),
                              minlength=out_dim)
                  if len(vals) else np.zeros(out_dim, np.int64))
        ell = choose_ell_width(counts)
    cols2d, vals2d, spill_t, nnz = build_hybrid_arrays(
        f, out_idx, in_idx, vals, out_dim, out_pad, ell, chunk=chunk)
    s_o, s_i, s_v, s_nnz, s_rp, s_safe = spill_t
    spill = SparseOp(out_dim=out_dim, in_dim=in_dim, nnz=s_nnz, chunk=chunk,
                     seg_safe=s_safe, out_idx=jnp.asarray(s_o),
                     in_idx=jnp.asarray(s_i), val_mont=jnp.asarray(s_v),
                     rowptr=jnp.asarray(s_rp))
    return HybridOp(out_dim=out_dim, in_dim=in_dim, nnz=nnz, ell=ell,
                    cols=jnp.asarray(cols2d), vals=jnp.asarray(vals2d),
                    spill=spill)


# L-loop unroll limit: beyond this use fori_loop to bound trace size
_ELL_UNROLL = 32


def spmv_hybrid(f: GFp, op: HybridOp, x, out_rows: int | None = None):
    """y = op * x exactly mod p; returns (out_rows, n), zero-padded."""
    if out_rows is None:
        out_rows = op.out_dim
    n = x.shape[1]
    out_pad = op.cols.shape[0]

    def slab_step(k, y):
        ck = jax.lax.dynamic_index_in_dim(op.cols.T, k, 0, keepdims=False)
        vk = jax.lax.dynamic_index_in_dim(op.vals.T, k, 0, keepdims=False)
        return gfp.modadd(f, y, gfp.mont_mul(f, vk[:, None], x[ck]))

    y = jnp.zeros((out_pad, n), u32)
    if op.ell <= _ELL_UNROLL:
        for k in range(op.ell):
            y = gfp.modadd(
                f, y, gfp.mont_mul(f, op.vals[:, k][:, None], x[op.cols[:, k]]))
    else:
        y = jax.lax.fori_loop(0, op.ell, slab_step, y)

    if op.spill.nnz != 0:
        y_spill = spmv_block(f, op.spill, x, out_rows=out_pad)
        y = gfp.modadd(f, y, y_spill)

    if out_rows > out_pad:
        y = jnp.pad(y, ((0, out_rows - out_pad), (0, 0)))
    elif out_rows < out_pad:
        y = y[:out_rows]
    return y


def apply_op(f: GFp, op, x, out_rows: int | None = None):
    """Dispatch: y = op * x for either sparse layout."""
    if isinstance(op, HybridOp):
        return spmv_hybrid(f, op, x, out_rows)
    return spmv_block(f, op, x, out_rows)


def spmv_reference_np(p: int, nrows, i, j, x, v):
    """Host oracle: y[i] += x*v[j] mod p with exact object/int64 arithmetic."""
    n = v.shape[1]
    y = np.zeros((nrows, n), np.uint64)
    np_p = np.uint64(p)
    for k in range(len(x)):  # slow; tests only
        y[i[k]] = (y[i[k]] + np.uint64(x[k]) * v[j[k]].astype(np.uint64)) % np_p
    return y.astype(np.uint32)
