"""Multi-device block Lanczos for WIDE primes (2^30-35 < p < 2^62).

Mirrors parallel/distributed.py on the uint32-pair field: the matrix is
2D-partitioned over a ("rows", "cols") mesh, each device owns one block in
the wide hybrid ELL+spill layout, and exact mod-p reductions ride
`psum_mod_wide` (five 15-bit limbs per value).  Root-free: state stays
sharded for the whole solve, the only host traffic is the per-block stop
flag — same architecture notes as the narrow module.
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

from block_lanczos_tpu.models import lanczos_wide as lw
from block_lanczos_tpu.models.lanczos import (SolveResult, fit_rows,
                                               state_rows)
from block_lanczos_tpu.ops import gfp_wide as gw
from block_lanczos_tpu.ops import wide_ops as wo
from block_lanczos_tpu.ops.gfp import u32
from block_lanczos_tpu.ops.gfp_wide import GFpWide
from block_lanczos_tpu.parallel.collectives import psum_mod_wide
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


@dataclasses.dataclass
class _WideStackedDir:
    ell: int
    cols: jax.Array          # (R, C, out_band, L) int32
    vals: jax.Array          # (R, C, out_band, L, 2) uint32
    spill_out: jax.Array     # (R, C, spill_pad) int32
    spill_in: jax.Array      # (R, C, spill_pad) int32
    spill_val: jax.Array     # (R, C, spill_pad, 2) uint32
    spill_rowptr: jax.Array  # (R, C, out_band + 1) int32

    def leaves(self):
        return (self.cols, self.vals, self.spill_out, self.spill_in,
                self.spill_val, self.spill_rowptr)


@dataclasses.dataclass
class WideShardedOps:
    grid: tuple
    band: int
    mband: int
    np_rows: int
    mp_rows: int
    n_eff: int
    m_eff: int
    first: _WideStackedDir
    second: _WideStackedDir
    row_map: BandMap | None = None   # BandMap of the kernel dimension
    col_map: BandMap | None = None   # BandMap of the other dimension
    stats: PartitionStats | None = None

    def _local(self, d: _WideStackedDir, out_dim: int, in_dim: int,
               leaves) -> wo.WideHybridOp:
        cols, vals, s_o, s_i, s_v, s_rp = (leaf[0, 0] for leaf in leaves)
        spill = wo.WideSparseOp(out_dim=out_dim, in_dim=in_dim, nnz=-1,
                                out_idx=s_o, in_idx=s_i, val_mont=s_v,
                                rowptr=s_rp)
        return wo.WideHybridOp(out_dim=out_dim, in_dim=in_dim, nnz=-1,
                               ell=d.ell, cols=cols, vals=vals, spill=spill)

    def local_first(self, leaves):
        return self._local(self.first, self.mband, self.band, leaves)

    def local_second(self, leaves):
        return self._local(self.second, self.band, self.mband, leaves)


def partition_matrix_wide(f: GFpWide, M: COOMatrix, right: bool,
                          mesh: jax.sharding.Mesh,
                          pad_multiple: int = 8) -> WideShardedOps:
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    n_eff, m_eff, key, other, row_map, col_map = _grid_maps(
        M.i, M.j, M.nrows, M.ncols, right, R, C, pad_multiple)
    band, mband = row_map.band, col_map.band

    x_obj = np.asarray(M.x, dtype=object)
    (first_parts, second_parts), shard_nnz = _grid_parts(
        key, other, x_obj, row_map, col_map)

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    local = _addressable_parts(mesh)   # multi-host: build only our blocks
    _announce_local_build(local, R, C)

    def build_dir(parts, out_dim) -> _WideStackedDir:
        return _build_wide_dir(f, parts, out_dim, R, C, nnz_sharding, local)

    first = build_dir(first_parts, mband)
    second = build_dir(second_parts, band)

    return WideShardedOps(
        grid=(R, C), band=band, mband=mband,
        np_rows=band * R, mp_rows=mband * C,
        n_eff=n_eff, m_eff=m_eff,
        first=first, second=second, row_map=row_map, col_map=col_map,
        stats=PartitionStats(grid=(R, C), shard_nnz=shard_nnz,
                             row_balanced=not row_map.identity,
                             col_balanced=not col_map.identity,
                             first=_wide_dstats(first),
                             second=_wide_dstats(second)))


def _wide_dstats(d: _WideStackedDir) -> DirStats:
    return DirStats(ell=d.ell,
                    slab_slots=int(np.prod(d.vals.shape[:4])),
                    spill_slots=int(np.prod(d.spill_out.shape)))


def _build_wide_dir(f: GFpWide, parts, out_dim: int, R: int, C: int,
                    nnz_sharding, local) -> _WideStackedDir:
    from block_lanczos_tpu.ops.spmm import choose_ell_width_multi
    counts_list = [np.bincount(oi, minlength=out_dim) if len(oi)
                   else np.zeros(out_dim, np.int64)
                   for (oi, _ii, _xv) in parts]
    ell = choose_ell_width_multi(counts_list)
    if local is not None:
        # Shard-local multi-host build.  Fold the dense-row guard into
        # the agreed width up front (build_wide_hybrid_arrays widens ell
        # so no spill segment exceeds the 2^17 limb-sum cap); the spill
        # sizes are then exact from the count model (lexsorted rows, no
        # evictions), so all processes agree on the padded shapes
        # without building non-local blocks — and in particular without
        # running the expensive host-side Montgomery conversion on
        # blocks this process does not own.
        max_count = max((int(c.max()) if c.size else 0)
                        for c in counts_list)
        if max_count - ell > gw.LIMB_SUM_MAX:
            ell = max_count - gw.LIMB_SUM_MAX
        spill_pad = max(max(int(np.maximum(c - ell, 0).sum())
                            for c in counts_list), 1)
        built = {}
        for k, (oi, ii, xv) in enumerate(parts):
            r, c = divmod(k, C)
            if (r, c) not in local:
                continue
            arrs = wo.build_wide_hybrid_arrays(
                f, oi, ii, xv, out_dim, ell=ell, spill_pad_to=spill_pad)
            cols2d, vals2d, (s_o, s_i, s_v, _n, s_rp), _nnz, got_ell = \
                arrs
            assert got_ell == ell and s_o.shape[0] == spill_pad, (
                got_ell, ell, s_o.shape, spill_pad)
            built[(r, c)] = (cols2d, vals2d, s_o, s_i, s_v, s_rp)
        return _WideStackedDir(
            ell=ell,
            cols=_lazy_stack(built, R, C, nnz_sharding, 0,
                             (out_dim, ell), np.int32),
            vals=_lazy_stack(built, R, C, nnz_sharding, 1,
                             (out_dim, ell, 2), np.uint32),
            spill_out=_lazy_stack(built, R, C, nnz_sharding, 2,
                                  (spill_pad,), np.int32),
            spill_in=_lazy_stack(built, R, C, nnz_sharding, 3,
                                 (spill_pad,), np.int32),
            spill_val=_lazy_stack(built, R, C, nnz_sharding, 4,
                                  (spill_pad, 2), np.uint32),
            spill_rowptr=_lazy_stack(built, R, C, nnz_sharding, 5,
                                     (out_dim + 1,), np.int32))
    built, spill_pad = [], 1
    for (oi, ii, xv) in parts:
        arrs = wo.build_wide_hybrid_arrays(f, oi, ii, xv, out_dim,
                                           ell=ell)
        ell = max(ell, arrs[4])  # dense-row guard may widen
        built.append(arrs)
        spill_pad = max(spill_pad, arrs[2][0].shape[0])
    cols_l, vals_l, so_l, si_l, sv_l, srp_l = [], [], [], [], [], []
    for arrs, (oi, ii, xv) in zip(built, parts):
        if arrs[4] != ell or arrs[2][0].shape[0] != spill_pad:
            arrs = wo.build_wide_hybrid_arrays(
                f, oi, ii, xv, out_dim, ell=ell, spill_pad_to=spill_pad)
        cols2d, vals2d, (s_o, s_i, s_v, _n, s_rp), _nnz, _e = arrs
        cols_l.append(cols2d); vals_l.append(vals2d)
        so_l.append(s_o); si_l.append(s_i); sv_l.append(s_v)
        srp_l.append(s_rp)

    def stack(xs):
        arr = np.stack(xs)
        arr = arr.reshape((R, C) + arr.shape[1:])
        return put_global(arr, nnz_sharding)

    return _WideStackedDir(ell=ell, cols=stack(cols_l),
                           vals=stack(vals_l), spill_out=stack(so_l),
                           spill_in=stack(si_l), spill_val=stack(sv_l),
                           spill_rowptr=stack(srp_l))


def _local_step(f: GFpWide, ops: WideShardedOps, check: bool,
                first_leaves, second_leaves, v_local, p_local):
    first = ops.local_first(first_leaves)
    second = ops.local_second(second_leaves)

    tmp_partial = wo.spmv_wide(f, first, v_local, out_rows=ops.mband)
    tmp = psum_mod_wide(f, tmp_partial, ROWS_AXIS)
    av_partial = wo.spmv_wide(f, second, tmp, out_rows=ops.band)
    Av_local = psum_mod_wide(f, av_partial, COLS_AXIS)

    n = v_local.shape[1]
    grams = psum_mod_wide(f, wo.gram_mod(
        f, jnp.concatenate([v_local, Av_local], axis=1), Av_local), ROWS_AXIS)
    vtAv, vtAAv = grams[:n], grams[n:]

    winv, d, npiv = wo.semi_inverse_device(f, vtAv)
    stop = npiv == 0
    inv_ok = (lw.check_invariants_device(f, vtAv, vtAAv, winv, d)
              if check else jnp.bool_(True))

    v_next, p_next = lw.orthogonalize_device(
        f, v_local, Av_local, p_local, d, vtAv, vtAAv, winv)
    v_out = jnp.where(stop, v_local, v_next)
    p_out = jnp.where(stop, p_local, p_next)
    return v_out, p_out, tmp, vtAv, vtAAv, winv, d, stop, inv_ok


def _local_multi_step(f: GFpWide, ops: WideShardedOps, check: bool,
                      first_leaves, second_leaves, v_local, p_local,
                      max_steps):
    from block_lanczos_tpu.models.lanczos import run_multi_step
    n = v_local.shape[1]
    zed = jnp.zeros((n, n, 2), u32)
    tmp0 = jax.lax.pcast(jnp.zeros((ops.mband, n, 2), u32), (COLS_AXIS,),
                         to="varying")
    zeros = (tmp0, zed, zed, zed, jnp.zeros((n,), u32))
    return run_multi_step(
        lambda v, p: _local_step(f, ops, check, first_leaves,
                                 second_leaves, v, p),
        zeros, v_local, p_local, max_steps)


@dataclasses.dataclass
class WideOverlapShardedOps:
    """WideShardedOps variant with each SpMV direction split into two row
    chunks so chunk A's exact psum is independent of chunk B's local
    compute — the wide twin of sharding.OverlapShardedOps.  Bit-exact with
    the unchunked layout by construction."""
    grid: tuple
    band: int
    mband: int
    np_rows: int
    mp_rows: int
    n_eff: int
    m_eff: int
    ha: int            # first-direction split row (out dim = mband)
    hb: int            # second-direction split row (out dim = band)
    first_a: _WideStackedDir
    first_b: _WideStackedDir
    second_a: _WideStackedDir
    second_b: _WideStackedDir
    row_map: BandMap | None = None
    col_map: BandMap | None = None
    stats: PartitionStats | None = None

    def _local(self, d: _WideStackedDir, out_dim: int, in_dim: int,
               leaves) -> wo.WideHybridOp:
        return WideShardedOps._local(self, d, out_dim, in_dim, leaves)

    def leaves(self):
        return (self.first_a.leaves(), self.first_b.leaves(),
                self.second_a.leaves(), self.second_b.leaves())


def partition_matrix_overlap_wide(f: GFpWide, M: COOMatrix, right: bool,
                                  mesh: jax.sharding.Mesh,
                                  pad_multiple: int = 8
                                  ) -> WideOverlapShardedOps:
    """2D wide partition with each direction's output rows split in half
    (mirrors sharding.partition_matrix_overlap for the narrow field)."""
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    n_eff, m_eff, key, other, row_map, col_map = _grid_maps(
        M.i, M.j, M.nrows, M.ncols, right, R, C, pad_multiple)
    band, mband = row_map.band, col_map.band
    ha = (mband // 2 // pad_multiple) * pad_multiple
    hb = (band // 2 // pad_multiple) * pad_multiple
    if not (0 < ha < mband and 0 < hb < band):
        raise ValueError(
            "matrix bands too small to chunk for comm/compute overlap; "
            "use the default ShardedBlockLanczosWide")

    x_obj = np.asarray(M.x, dtype=object)
    (first_parts, _second), shard_nnz = _grid_parts(
        key, other, x_obj, row_map, col_map)
    fa, fb, sa, sb = [], [], [], []
    for (lo, lk, xv) in first_parts:
        m_lo = lo < ha
        fa.append((lo[m_lo], lk[m_lo], xv[m_lo]))
        fb.append(((lo[~m_lo] - ha).astype(np.int32), lk[~m_lo], xv[~m_lo]))
        m_lk = lk < hb
        sa.append((lk[m_lk], lo[m_lk], xv[m_lk]))
        sb.append(((lk[~m_lk] - hb).astype(np.int32), lo[~m_lk], xv[~m_lk]))

    nnz_sharding = NamedSharding(mesh, P(ROWS_AXIS, COLS_AXIS))
    local = _addressable_parts(mesh)
    _announce_local_build(local, R, C)
    dirs = [_build_wide_dir(f, p_, od, R, C, nnz_sharding, local)
            for p_, od in ((fa, ha), (fb, mband - ha),
                           (sa, hb), (sb, band - hb))]
    fs = _wide_dstats(dirs[0]), _wide_dstats(dirs[1])
    ss = _wide_dstats(dirs[2]), _wide_dstats(dirs[3])
    return WideOverlapShardedOps(
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


def _local_step_overlap(f: GFpWide, ops: WideOverlapShardedOps, check: bool,
                        fa, fb, sa, sb, v_local, p_local):
    first_a = ops._local(ops.first_a, ops.ha, ops.band, fa)
    first_b = ops._local(ops.first_b, ops.mband - ops.ha, ops.band, fb)
    second_a = ops._local(ops.second_a, ops.hb, ops.mband, sa)
    second_b = ops._local(ops.second_b, ops.band - ops.hb, ops.mband, sb)

    tmp = jnp.concatenate([
        psum_mod_wide(f, wo.spmv_wide(f, first_a, v_local,
                                      out_rows=ops.ha), ROWS_AXIS),
        psum_mod_wide(f, wo.spmv_wide(f, first_b, v_local,
                                      out_rows=ops.mband - ops.ha),
                      ROWS_AXIS),
    ], axis=0)
    Av_local = jnp.concatenate([
        psum_mod_wide(f, wo.spmv_wide(f, second_a, tmp,
                                      out_rows=ops.hb), COLS_AXIS),
        psum_mod_wide(f, wo.spmv_wide(f, second_b, tmp,
                                      out_rows=ops.band - ops.hb),
                      COLS_AXIS),
    ], axis=0)

    n = v_local.shape[1]
    grams = psum_mod_wide(f, wo.gram_mod(
        f, jnp.concatenate([v_local, Av_local], axis=1), Av_local), ROWS_AXIS)
    vtAv, vtAAv = grams[:n], grams[n:]

    winv, d, npiv = wo.semi_inverse_device(f, vtAv)
    stop = npiv == 0
    inv_ok = (lw.check_invariants_device(f, vtAv, vtAAv, winv, d)
              if check else jnp.bool_(True))

    v_next, p_next = lw.orthogonalize_device(
        f, v_local, Av_local, p_local, d, vtAv, vtAAv, winv)
    v_out = jnp.where(stop, v_local, v_next)
    p_out = jnp.where(stop, p_local, p_next)
    return v_out, p_out, tmp, vtAv, vtAAv, winv, d, stop, inv_ok


def _local_multi_step_overlap(f: GFpWide, ops: WideOverlapShardedOps,
                              check: bool, fa, fb, sa, sb,
                              v_local, p_local, max_steps):
    from block_lanczos_tpu.models.lanczos import run_multi_step
    n = v_local.shape[1]
    zed = jnp.zeros((n, n, 2), u32)
    tmp0 = jax.lax.pcast(jnp.zeros((ops.mband, n, 2), u32), (COLS_AXIS,),
                         to="varying")
    zeros = (tmp0, zed, zed, zed, jnp.zeros((n,), u32))
    return run_multi_step(
        lambda v, p: _local_step_overlap(f, ops, check, fa, fb, sa, sb,
                                         v, p),
        zeros, v_local, p_local, max_steps)


class ShardedBlockLanczosWide:
    """Multi-device wide-field solver; API mirrors ShardedBlockLanczos."""

    def __init__(self, M: COOMatrix, n: int = 1, right: bool = False,
                 mesh: jax.sharding.Mesh | None = None,
                 pad_multiple: int = 8, check_invariants: bool = True,
                 sync_every: int | None = None, overlap: bool = False):
        from block_lanczos_tpu.parallel.mesh import make_mesh
        self.mesh = mesh if mesh is not None else make_mesh()
        self.f = GFpWide.make(M.prime)
        self.n = int(n)
        self.right = bool(right)
        self.check_invariants = check_invariants
        self.overlap = bool(overlap)
        self.ops = (partition_matrix_overlap_wide(
                        self.f, M, right, self.mesh,
                        pad_multiple=pad_multiple)
                    if overlap else
                    partition_matrix_wide(self.f, M, right, self.mesh,
                                          pad_multiple=pad_multiple))
        self.n_eff = self.ops.n_eff
        self.m_eff = self.ops.m_eff
        self.np_rows = self.ops.np_rows
        self.row_map = self.ops.row_map
        self.col_map = self.ops.col_map
        self.expected_iterations = 1 + self.m_eff // self.n
        self._rng = Xoshiro256Plus()
        self._vec_sharding = NamedSharding(self.mesh, P(ROWS_AXIS, None, None))
        self.sync_every = sync_every

        nnz_spec = P(ROWS_AXIS, COLS_AXIS)
        v_spec = P(ROWS_AXIS, None, None)
        tmp_spec = P(COLS_AXIS, None, None)
        rep3 = P(None, None, None)
        if self.overlap:
            groups = self.ops.leaves()
            in_specs = tuple((nnz_spec,) * len(g) for g in groups)
            mbody = partial(_local_multi_step_overlap, self.f, self.ops,
                            check_invariants)
            donate = (4, 5)
        else:
            in_specs = ((nnz_spec,) * len(self.ops.first.leaves()),
                        (nnz_spec,) * len(self.ops.second.leaves()))
            mbody = partial(_local_multi_step, self.f, self.ops,
                            check_invariants)
            donate = (2, 3)
        msmapped = jax.shard_map(
            mbody, mesh=self.mesh,
            in_specs=(*in_specs, v_spec, v_spec, P()),
            out_specs=(v_spec, v_spec, tmp_spec, rep3, rep3, rep3,
                       P(None), P(), P(), P()))
        self._multi_step = jax.jit(msmapped, donate_argnums=donate)

    def initial_block(self):
        block = self._rng.fill_mod64(self.n_eff * self.n, self.f.p)
        v0 = self.row_map.scatter(
            block.reshape(self.n_eff, self.n).astype(np.uint64))
        return put_global(gw.np_pair(v0.astype(object)),
                              self._vec_sharding)

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
            p_blk = put_global(
                np.zeros((self.np_rows, self.n, 2), np.uint32),
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
            print(f"Block Lanczos [wide field, sharded {R}x{C}]")
            if self.ops.stats is not None:
                print(self.ops.stats.summary())
            print(f"  - Expecting {self.expected_iterations} iterations")
            print("  - Main loop")

        args = self._step_args()

        def inv_fail(diag, iteration):
            raise AssertionError(
                "device invariant check failed (wide, sharded) at "
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
        v_host = self.row_map.gather(gw.np_unpair(fetch_global(v)))
        v_host64 = v_host.astype(np.uint64)
        v_nonzero = product_zero = None
        vtM = None
        if not stopped_by_limit:
            tmp_host = self.col_map.gather(gw.np_unpair(fetch_global(tmp)))
            v_nonzero, product_zero = lw.final_check(
                v_host64, tmp_host, self.n_eff, self.m_eff, verbose)
            if product_zero is False:
                vtM = np.asarray(tmp_host[:self.m_eff], dtype=np.uint64)
        if verbose:
            print(f"  - Terminated in {elapsed:.1f}s after "
                  f"{n_iterations} iterations")
        return SolveResult(kernel=v_host64[:self.n_eff],
                           iterations=n_iterations,
                           v_nonzero=v_nonzero, product_zero=product_zero,
                           elapsed=elapsed, stopped_by_limit=stopped_by_limit,
                           vtM=vtM)
