"""Multi-device bitsliced GF(2) block Lanczos.

Mirrors parallel/distributed.py with the bit-packed representation of
ops/gf2.py.  The one structural difference from the mod-p meshes: the
cross-device reduction is XOR, which has no native collective — see pxor
below for the bit-plane psum that provides it exactly.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from block_lanczos_tpu.models import lanczos_gf2 as lg
from block_lanczos_tpu.models.lanczos import (SolveResult, fit_rows,
                                               state_rows)
from block_lanczos_tpu.ops import gf2
from block_lanczos_tpu.ops.gf2 import WORD, words
from block_lanczos_tpu.ops.gfp import u32
from block_lanczos_tpu.parallel.mesh import COLS_AXIS, ROWS_AXIS
from block_lanczos_tpu.parallel.multihost import fetch_global, put_global
from block_lanczos_tpu.parallel.sharding import (BandMap, DirStats,
                                                 PartitionStats,
                                                 _addressable_parts,
                                                 _announce_local_build,
                                                 _grid_maps, _grid_parts,
                                                 _lazy_stack)
from block_lanczos_tpu.utils.mmio import COOMatrix
from block_lanczos_tpu.utils.rng import Xoshiro256Plus


def pxor(x, axis_name: str):
    """Exact XOR all-reduce over a mesh axis.

    XOR has no native collective; bitwise parity does: spread each uint32
    word into L-bit lanes (one lane per bit), psum the lanes — each lane
    accumulates up to 2^L - 1 device contributions without carrying into
    its neighbor — and keep each lane's low bit (the parity).  psum also
    yields the axis-invariant result type that lets the value live in
    while_loop carries under shard_map (an all_gather + local fold stays
    "varying" and cannot).

    L is picked from the static axis size: 2-bit lanes up to 3 devices,
    nibbles up to 15, bytes up to 255 — 2x/4x/8x the ideal XOR payload.
    Round 3 shipped fixed uint8 bit-planes (32 planes = 8x payload +
    a 32-wide recombine); the lane packing halves the collective volume
    at <= 15 devices per axis and shrinks the spread/recombine work to
    L elementwise ops (measured in benchmarks/gf2_mesh_overhead.py).
    """
    size = jax.lax.axis_size(axis_name)
    lane = 2 if size <= 3 else 4 if size <= 15 else 8
    mask = u32({2: 0x55555555, 4: 0x11111111, 8: 0x01010101}[lane])
    ks = jnp.arange(lane, dtype=u32)
    spread = (x[..., None] >> ks) & mask          # (..., L) uint32
    s = jax.lax.psum(spread, axis_name)
    # low bit of each lane = parity; set bits never overlap across k,
    # so the sum over the lane axis IS the bitwise OR recombine
    return ((s & mask) << ks).sum(axis=-1, dtype=u32)


def _pxor_planes(x, axis_name: str):
    """Round-3 pxor (32 uint8 bit-planes): kept as the A/B yardstick for
    benchmarks/gf2_mesh_overhead.py; bit-identical results."""
    shifts = jnp.arange(WORD, dtype=u32)
    planes = ((x[..., None] >> shifts) & u32(1)).astype(jnp.uint8)
    s = jax.lax.psum(planes, axis_name)
    bits = (s & jnp.uint8(1)).astype(u32)
    return (bits << shifts).sum(axis=-1, dtype=u32)


@dataclasses.dataclass
class _GF2StackedDir:
    ell: int
    cols: jax.Array          # (R, C, out_band, L) int32
    valid: jax.Array         # (R, C, out_band, ceil(L/32)) uint32
    spill_out: jax.Array
    spill_in: jax.Array
    spill_rowptr: jax.Array

    def leaves(self):
        return (self.cols, self.valid, self.spill_out, self.spill_in,
                self.spill_rowptr)


@dataclasses.dataclass
class GF2ShardedOps:
    grid: tuple
    band: int
    mband: int
    np_rows: int
    mp_rows: int
    n_eff: int
    m_eff: int
    first: _GF2StackedDir
    second: _GF2StackedDir
    row_map: BandMap | None = None   # BandMap of the kernel dimension
    col_map: BandMap | None = None   # BandMap of the other dimension
    stats: PartitionStats | None = None

    def _local(self, d: _GF2StackedDir, out_dim: int, in_dim: int,
               leaves) -> lg.GF2Op:
        cols, valid, s_o, s_i, s_rp = (leaf[0, 0] for leaf in leaves)
        return lg.GF2Op(out_dim=out_dim, in_dim=in_dim, nnz=-1, ell=d.ell,
                        cols=cols, valid=valid, spill_out=s_o, spill_in=s_i,
                        spill_rowptr=s_rp, spill_nnz=int(s_o.shape[0]))

    def local_first(self, leaves):
        return self._local(self.first, self.mband, self.band, leaves)

    def local_second(self, leaves):
        return self._local(self.second, self.band, self.mband, leaves)


def partition_matrix_gf2(M: COOMatrix, right: bool, mesh: jax.sharding.Mesh,
                         pad_multiple: int = 8,
                         dedup: bool = True) -> GF2ShardedOps:
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    odd = (np.asarray(M.x) & 1) == 1
    mi, mj = M.i[odd], M.j[odd]
    # m_eff-side dedup, then balance on the surviving entries only — they
    # ARE the operator (duplicates cancel out of A over GF(2); see
    # ops/gf2.py::dedup_lines)
    if dedup:
        mi, mj, nrows_eff, ncols_eff, _nd, _ne = gf2.dedup_lines(
            mi, mj, M.nrows, M.ncols, right)
    else:
        nrows_eff, ncols_eff = M.nrows, M.ncols
    n_eff, m_eff, key, other, row_map, col_map = _grid_maps(
        mi, mj, nrows_eff, ncols_eff, right, R, C, pad_multiple)
    band, mband = row_map.band, col_map.band

    (first3, second3), shard_nnz = _grid_parts(key, other, None,
                                               row_map, col_map)
    first_parts = [(lo, lk) for (lo, lk, _x) in first3]
    second_parts = [(lk, lo) for (lk, lo, _x) in second3]

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    local = _addressable_parts(mesh)   # multi-host: build only our blocks
    _announce_local_build(local, R, C)

    def build_dir(parts, out_dim) -> _GF2StackedDir:
        return _build_gf2_dir(parts, out_dim, R, C, nnz_sharding, local)

    first = build_dir(first_parts, mband)
    second = build_dir(second_parts, band)

    return GF2ShardedOps(
        grid=(R, C), band=band, mband=mband,
        np_rows=band * R, mp_rows=mband * C,
        n_eff=n_eff, m_eff=m_eff,
        first=first, second=second, row_map=row_map, col_map=col_map,
        stats=PartitionStats(grid=(R, C), shard_nnz=shard_nnz,
                             row_balanced=not row_map.identity,
                             col_balanced=not col_map.identity,
                             first=_gf2_dstats(first),
                             second=_gf2_dstats(second)))


def _gf2_dstats(d: _GF2StackedDir) -> DirStats:
    return DirStats(ell=d.ell,
                    slab_slots=int(np.prod(d.cols.shape[:4])),
                    spill_slots=int(np.prod(d.spill_out.shape)))


def _build_gf2_dir(parts, out_dim: int, R: int, C: int, nnz_sharding,
                   local) -> _GF2StackedDir:
    from block_lanczos_tpu.ops.spmm import choose_ell_width_multi
    counts_list = [np.bincount(oi, minlength=out_dim) if len(oi)
                   else np.zeros(out_dim, np.int64)
                   for (oi, _ii) in parts]
    ell = choose_ell_width_multi(counts_list)
    if local is not None:
        # Shard-local multi-host build: GF(2) spills are exact from the
        # count model (first ell entries of every row go to the slab,
        # the rest spill — no evictions, no seg-safety constraint), so
        # every process agrees on the padded shapes without building
        # non-local blocks.
        spill_pad = max(max(int(np.maximum(c - ell, 0).sum())
                            for c in counts_list), 1)
        built = {}
        for k, (oi, ii) in enumerate(parts):
            r, c = divmod(k, C)
            if (r, c) not in local:
                continue
            arrs = lg.build_gf2_arrays(oi, ii, out_dim, ell=ell,
                                       spill_pad_to=spill_pad)
            cols2d, valid, (s_o, s_i, _n, s_rp), _nnz, _e = arrs
            assert s_o.shape[0] == spill_pad, (s_o.shape, spill_pad)
            built[(r, c)] = (cols2d, valid, s_o, s_i, s_rp)
        vwords = (ell + WORD - 1) // WORD
        return _GF2StackedDir(
            ell=ell,
            cols=_lazy_stack(built, R, C, nnz_sharding, 0,
                             (out_dim, ell), np.int32),
            valid=_lazy_stack(built, R, C, nnz_sharding, 1,
                              (out_dim, vwords), np.uint32),
            spill_out=_lazy_stack(built, R, C, nnz_sharding, 2,
                                  (spill_pad,), np.int32),
            spill_in=_lazy_stack(built, R, C, nnz_sharding, 3,
                                 (spill_pad,), np.int32),
            spill_rowptr=_lazy_stack(built, R, C, nnz_sharding, 4,
                                     (out_dim + 1,), np.int32))
    built, spill_pad = [], 1
    for (oi, ii) in parts:
        arrs = lg.build_gf2_arrays(oi, ii, out_dim, ell=ell)
        built.append(arrs)
        spill_pad = max(spill_pad, arrs[2][0].shape[0])
    cols_l, val_l, so_l, si_l, srp_l = [], [], [], [], []
    for arrs, (oi, ii) in zip(built, parts):
        if arrs[2][0].shape[0] != spill_pad:
            arrs = lg.build_gf2_arrays(oi, ii, out_dim, ell=ell,
                                       spill_pad_to=spill_pad)
        cols2d, valid, (s_o, s_i, _n, s_rp), _nnz, _e = arrs
        cols_l.append(cols2d); val_l.append(valid)
        so_l.append(s_o); si_l.append(s_i); srp_l.append(s_rp)

    def stack(xs):
        arr = np.stack(xs)
        arr = arr.reshape((R, C) + arr.shape[1:])
        return put_global(arr, nnz_sharding)

    return _GF2StackedDir(ell=ell, cols=stack(cols_l),
                          valid=stack(val_l), spill_out=stack(so_l),
                          spill_in=stack(si_l), spill_rowptr=stack(srp_l))


def _local_step(ops: GF2ShardedOps, n: int, check: bool,
                first_leaves, second_leaves, v_local, p_local):
    first = ops.local_first(first_leaves)
    second = ops.local_second(second_leaves)

    tmp = pxor(lg.spmv_gf2(first, v_local, out_rows=ops.mband), ROWS_AXIS)
    Av_local = pxor(lg.spmv_gf2(second, tmp, out_rows=ops.band), COLS_AXIS)

    grams = pxor(gf2.gram_gf2(
        jnp.concatenate([v_local, Av_local], axis=1), Av_local, 2 * n),
        ROWS_AXIS)
    vtAv, vtAAv = grams[:n], grams[n:]

    winv, d, npiv = gf2.semi_inverse_gf2(vtAv, n)
    stop = npiv == 0
    inv_ok = (lg.check_invariants_gf2(vtAv, vtAAv, winv, d, n)
              if check else jnp.bool_(True))

    v_next, p_next = lg.orthogonalize_gf2(
        v_local, Av_local, p_local, d, vtAv, vtAAv, winv, n)
    v_out = jnp.where(stop, v_local, v_next)
    p_out = jnp.where(stop, p_local, p_next)
    return v_out, p_out, tmp, vtAv, vtAAv, winv, d, stop, inv_ok


def _local_multi_step(ops: GF2ShardedOps, n: int, check: bool,
                      first_leaves, second_leaves, v_local, p_local,
                      max_steps):
    from block_lanczos_tpu.models.lanczos import run_multi_step
    W = words(n)
    zed = jnp.zeros((n, W), u32)
    tmp0 = jax.lax.pcast(jnp.zeros((ops.mband, W), u32), (COLS_AXIS,),
                         to="varying")
    zeros = (tmp0, zed, zed, zed, jnp.zeros((n,), u32))
    return run_multi_step(
        lambda v, p: _local_step(ops, n, check, first_leaves,
                                 second_leaves, v, p),
        zeros, v_local, p_local, max_steps)


@dataclasses.dataclass
class GF2OverlapShardedOps:
    """GF2ShardedOps variant with each SpMV direction split into two row
    chunks so chunk A's pxor is independent of chunk B's local compute
    (XLA's async collective scheduler interleaves them on real meshes) —
    the GF(2) twin of sharding.OverlapShardedOps.  Bit-exact with the
    unchunked layout by construction."""
    grid: tuple
    band: int
    mband: int
    np_rows: int
    mp_rows: int
    n_eff: int
    m_eff: int
    ha: int            # first-direction split row (out dim = mband)
    hb: int            # second-direction split row (out dim = band)
    first_a: _GF2StackedDir
    first_b: _GF2StackedDir
    second_a: _GF2StackedDir
    second_b: _GF2StackedDir
    row_map: BandMap | None = None
    col_map: BandMap | None = None
    stats: PartitionStats | None = None

    def _local(self, d: _GF2StackedDir, out_dim: int, in_dim: int,
               leaves) -> lg.GF2Op:
        return GF2ShardedOps._local(self, d, out_dim, in_dim, leaves)

    def leaves(self):
        return (self.first_a.leaves(), self.first_b.leaves(),
                self.second_a.leaves(), self.second_b.leaves())


def partition_matrix_overlap_gf2(M: COOMatrix, right: bool,
                                 mesh: jax.sharding.Mesh,
                                 pad_multiple: int = 8,
                                 dedup: bool = True
                                 ) -> GF2OverlapShardedOps:
    """2D GF(2) partition with each direction's output rows split in half
    (mirrors sharding.partition_matrix_overlap for the narrow field)."""
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    odd = (np.asarray(M.x) & 1) == 1
    mi, mj = M.i[odd], M.j[odd]
    if dedup:
        mi, mj, nrows_eff, ncols_eff, _nd, _ne = gf2.dedup_lines(
            mi, mj, M.nrows, M.ncols, right)
    else:
        nrows_eff, ncols_eff = M.nrows, M.ncols
    n_eff, m_eff, key, other, row_map, col_map = _grid_maps(
        mi, mj, nrows_eff, ncols_eff, right, R, C, pad_multiple)
    band, mband = row_map.band, col_map.band
    ha = (mband // 2 // pad_multiple) * pad_multiple
    hb = (band // 2 // pad_multiple) * pad_multiple
    if not (0 < ha < mband and 0 < hb < band):
        raise ValueError(
            "matrix bands too small to chunk for comm/compute overlap; "
            "use the default ShardedBlockLanczosGF2")

    (first3, _second3), shard_nnz = _grid_parts(key, other, None,
                                                row_map, col_map)
    fa, fb, sa, sb = [], [], [], []
    for (lo, lk, _x) in first3:
        m_lo = lo < ha
        fa.append((lo[m_lo], lk[m_lo]))
        fb.append(((lo[~m_lo] - ha).astype(np.int32), lk[~m_lo]))
        m_lk = lk < hb
        sa.append((lk[m_lk], lo[m_lk]))
        sb.append(((lk[~m_lk] - hb).astype(np.int32), lo[~m_lk]))

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    local = _addressable_parts(mesh)
    _announce_local_build(local, R, C)
    dirs = [_build_gf2_dir(p_, od, R, C, nnz_sharding, local)
            for p_, od in ((fa, ha), (fb, mband - ha),
                           (sa, hb), (sb, band - hb))]
    fs = _gf2_dstats(dirs[0]), _gf2_dstats(dirs[1])
    ss = _gf2_dstats(dirs[2]), _gf2_dstats(dirs[3])
    return GF2OverlapShardedOps(
        grid=(R, C), band=band, mband=mband,
        np_rows=band * R, mp_rows=mband * C, n_eff=n_eff, m_eff=m_eff,
        ha=ha, hb=hb,
        first_a=dirs[0], first_b=dirs[1], second_a=dirs[2], second_b=dirs[3],
        row_map=row_map, col_map=col_map,
        stats=PartitionStats(
            grid=(R, C), shard_nnz=shard_nnz,
            row_balanced=not row_map.identity,
            col_balanced=not col_map.identity,
            first=DirStats(ell=(fs[0].ell, fs[1].ell),
                           slab_slots=fs[0].slab_slots + fs[1].slab_slots,
                           spill_slots=fs[0].spill_slots + fs[1].spill_slots),
            second=DirStats(ell=(ss[0].ell, ss[1].ell),
                            slab_slots=ss[0].slab_slots + ss[1].slab_slots,
                            spill_slots=ss[0].spill_slots
                            + ss[1].spill_slots)))


def _local_step_overlap(ops: GF2OverlapShardedOps, n: int, check: bool,
                        fa, fb, sa, sb, v_local, p_local):
    first_a = ops._local(ops.first_a, ops.ha, ops.band, fa)
    first_b = ops._local(ops.first_b, ops.mband - ops.ha, ops.band, fb)
    second_a = ops._local(ops.second_a, ops.hb, ops.mband, sa)
    second_b = ops._local(ops.second_b, ops.band - ops.hb, ops.mband, sb)

    tmp = jnp.concatenate([
        pxor(lg.spmv_gf2(first_a, v_local, out_rows=ops.ha), ROWS_AXIS),
        pxor(lg.spmv_gf2(first_b, v_local, out_rows=ops.mband - ops.ha),
             ROWS_AXIS),
    ], axis=0)
    Av_local = jnp.concatenate([
        pxor(lg.spmv_gf2(second_a, tmp, out_rows=ops.hb), COLS_AXIS),
        pxor(lg.spmv_gf2(second_b, tmp, out_rows=ops.band - ops.hb),
             COLS_AXIS),
    ], axis=0)

    grams = pxor(gf2.gram_gf2(
        jnp.concatenate([v_local, Av_local], axis=1), Av_local, 2 * n),
        ROWS_AXIS)
    vtAv, vtAAv = grams[:n], grams[n:]

    winv, d, npiv = gf2.semi_inverse_gf2(vtAv, n)
    stop = npiv == 0
    inv_ok = (lg.check_invariants_gf2(vtAv, vtAAv, winv, d, n)
              if check else jnp.bool_(True))

    v_next, p_next = lg.orthogonalize_gf2(
        v_local, Av_local, p_local, d, vtAv, vtAAv, winv, n)
    v_out = jnp.where(stop, v_local, v_next)
    p_out = jnp.where(stop, p_local, p_next)
    return v_out, p_out, tmp, vtAv, vtAAv, winv, d, stop, inv_ok


def _local_multi_step_overlap(ops: GF2OverlapShardedOps, n: int, check: bool,
                              fa, fb, sa, sb, v_local, p_local, max_steps):
    from block_lanczos_tpu.models.lanczos import run_multi_step
    W = words(n)
    zed = jnp.zeros((n, W), u32)
    tmp0 = jax.lax.pcast(jnp.zeros((ops.mband, W), u32), (COLS_AXIS,),
                         to="varying")
    zeros = (tmp0, zed, zed, zed, jnp.zeros((n,), u32))
    return run_multi_step(
        lambda v, p: _local_step_overlap(ops, n, check, fa, fb, sa, sb,
                                         v, p),
        zeros, v_local, p_local, max_steps)


class ShardedBlockLanczosGF2:
    """Multi-device bitsliced GF(2) solver; API mirrors ShardedBlockLanczos."""

    def __init__(self, M: COOMatrix, n: int = 32, right: bool = False,
                 mesh: jax.sharding.Mesh | None = None,
                 pad_multiple: int = 8, check_invariants: bool = True,
                 sync_every: int | None = None,
                 ops: GF2ShardedOps | GF2OverlapShardedOps | None = None,
                 overlap: bool = False, dedup: bool = True):
        from block_lanczos_tpu.parallel.mesh import make_mesh
        if int(M.prime) != 2 or n % WORD != 0:
            raise ValueError("GF(2) sharded solver requires p == 2 and n % 32 == 0")
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n = int(n)
        self.W = words(self.n)
        self.right = bool(right)
        self.check_invariants = check_invariants
        # the partitioned operator is independent of the blocking n — callers
        # sweeping n (bench.py at the 51M-nnz scale, where the host-side
        # build is ~25 min on this 1-core host) build once and pass it in
        if ops is None:
            ops = (partition_matrix_overlap_gf2(
                       M, right, self.mesh, pad_multiple=pad_multiple,
                       dedup=dedup)
                   if overlap else partition_matrix_gf2(
                       M, right, self.mesh, pad_multiple=pad_multiple,
                       dedup=dedup))
        self.ops = ops
        self.overlap = isinstance(self.ops, GF2OverlapShardedOps)
        self.n_eff = self.ops.n_eff
        self.m_eff = self.ops.m_eff
        self.np_rows = self.ops.np_rows
        self.row_map = self.ops.row_map
        self.col_map = self.ops.col_map
        self.expected_iterations = 1 + self.m_eff // self.n
        self._rng = Xoshiro256Plus()
        self._vec_sharding = NamedSharding(self.mesh, P(ROWS_AXIS, None))
        self.sync_every = sync_every

        nnz_spec = P(ROWS_AXIS, COLS_AXIS)
        v_spec = P(ROWS_AXIS, None)
        tmp_spec = P(COLS_AXIS, None)
        rep2 = P(None, None)
        if self.overlap:
            groups = self.ops.leaves()
            in_specs = tuple((nnz_spec,) * len(g) for g in groups)
            mbody = partial(_local_multi_step_overlap, self.ops, self.n,
                            check_invariants)
            donate = (4, 5)
        else:
            in_specs = ((nnz_spec,) * len(self.ops.first.leaves()),
                        (nnz_spec,) * len(self.ops.second.leaves()))
            mbody = partial(_local_multi_step, self.ops, self.n,
                            check_invariants)
            donate = (2, 3)
        msmapped = jax.shard_map(
            mbody, mesh=self.mesh,
            in_specs=(*in_specs, v_spec, v_spec, P()),
            out_specs=(v_spec, v_spec, tmp_spec, rep2, rep2, rep2,
                       P(None), P(), P(), P()))
        self._multi_step = jax.jit(msmapped, donate_argnums=donate)

    def initial_block(self):
        bits = self._rng.fill_mod(self.n_eff * self.n, 2)
        block = self.row_map.scatter(
            bits.reshape(self.n_eff, self.n).astype(np.uint32))
        return put_global(gf2.pack_bits_np(block), self._vec_sharding)

    def _step_args(self):
        if self.overlap:
            return self.ops.leaves()
        return (self.ops.first.leaves(), self.ops.second.leaves())

    def solve(self, stop_after: int = -1, verbose: bool = False,
              on_iteration: Callable | None = None,
              resume_state: dict | None = None) -> SolveResult:
        """Run to convergence (or `stop_after` iterations).

        `on_iteration` fires once per device-side iteration block (adaptive,
        up to 1024 iterations per dispatch under the default sync_every=None),
        not once per Lanczos iteration; construct with sync_every=1 for strict
        per-iteration callbacks (see models.lanczos.blocked_solve_loop).
        """
        if resume_state is None:
            v = self.initial_block()
            p_blk = put_global(np.zeros((self.np_rows, self.W), np.uint32),
                                   self._vec_sharding)
            n_iterations = 0
        else:
            v = put_global(self.row_map.scatter(fit_rows(
                state_rows(resume_state, "v"), self.n_eff)),
                self._vec_sharding)
            p_blk = put_global(self.row_map.scatter(fit_rows(
                state_rows(resume_state, "p"), self.n_eff)),
                self._vec_sharding)
            n_iterations = int(resume_state["iteration"])
        if verbose:
            R, C = self.ops.grid
            mode = " overlap" if self.overlap else ""
            print(f"Block Lanczos [GF(2) bitsliced, sharded {R}x{C}{mode}]")
            if self.ops.stats is not None:
                print(self.ops.stats.summary())
            print(f"  - Expecting {self.expected_iterations} iterations")
            print("  - Main loop")

        args = self._step_args()

        def inv_fail(diag, iteration):
            raise AssertionError(
                "device invariant check failed (GF2, sharded) at "
                f"iteration ~{iteration}")

        from block_lanczos_tpu.models.lanczos import blocked_solve_loop
        v, p_blk, tmp, n_iterations, stopped_by_limit, start = \
            blocked_solve_loop(
                lambda v, p, k: self._multi_step(*args, v, p, np.uint32(k)),
                v, p_blk, n_iterations, stop_after, self.sync_every,
                on_iteration=on_iteration,
                inv_fail=inv_fail if self.check_invariants else None,
                solver=self)
        elapsed = time.time() - start
        v_bits = self.row_map.gather(
            gf2.unpack_bits_np(fetch_global(v), self.n))
        v_nonzero = product_zero = None
        vtM = None
        if not stopped_by_limit:
            tmp_bits = self.col_map.gather(gf2.unpack_bits_np(
                fetch_global(tmp), self.n))
            v_nonzero = bool((v_bits[:self.n_eff] != 0).any())
            product_zero = bool((tmp_bits[:self.m_eff] == 0).all())
            if not product_zero:
                vtM = tmp_bits[:self.m_eff]
            if verbose:
                print("Final check:")
                print(f"  - {'OK:    v != 0' if v_nonzero else 'KO:    v == 0'}")
                print(f"  - {'OK: vt*M == 0' if product_zero else 'KO: vt*M != 0'}")
        if verbose:
            print(f"  - Terminated in {elapsed:.1f}s after "
                  f"{n_iterations} iterations")
        return SolveResult(kernel=v_bits[:self.n_eff],
                           iterations=n_iterations,
                           v_nonzero=v_nonzero, product_zero=product_zero,
                           elapsed=elapsed, stopped_by_limit=stopped_by_limit,
                           vtM=vtM)
