"""Multi-device sharded solver tests on the virtual 8-device CPU mesh.

Bit-exactness must hold for EVERY mesh size (mod-p arithmetic is exact and
order-independent), mirroring the reference's cross-variant equivalence
between sequential and MPI runs (SURVEY.md section 4).
"""

import os

import jax
import numpy as np
import pytest

from block_lanczos_tpu.parallel import make_mesh
from block_lanczos_tpu.parallel.collectives import psum_mod
from block_lanczos_tpu.parallel.distributed import ShardedBlockLanczos
from block_lanczos_tpu.ops.gfp import GFp
from block_lanczos_tpu.utils import checker, mmio

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    with open(os.path.join(GOLDEN, "MANIFEST.txt")) as fh:
        for line in fh:
            nm, prime, n, right = line.split()
            if nm == name:
                M = mmio.load_mtx(os.path.join(GOLDEN, f"{nm}.mtx"), int(prime))
                _, _, ref = mmio.read_array_mtx(
                    os.path.join(GOLDEN, f"{nm}.kernel.mtx"))
                return M, ref, int(prime), int(n), right == "True"
    raise KeyError(name)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_bit_exact_left(n_dev):
    M, ref, prime, n, right = load_golden("left_p65537_n4")
    res = ShardedBlockLanczos(M, n=n, mesh=make_mesh(n_dev)).solve()
    assert res.v_nonzero and res.product_zero
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref)


@pytest.mark.parametrize("name", ["right_pbig_n2", "left_pbig_n8_odd_dims"])
def test_sharded_bit_exact_other_configs(name):
    M, ref, prime, n, right = load_golden(name)
    res = ShardedBlockLanczos(M, n=n, right=right, mesh=make_mesh(4)).solve()
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref)
    assert checker.check_kernel_block(
        os.path.join(GOLDEN, f"{name}.mtx"), res.kernel, prime, right=right)


def test_psum_mod_exact():
    """Limb-split psum == exact modular sum of per-device partials."""
    p = 1073741789
    f = GFp.make(p)
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    parts = rng.integers(0, p, (8, 16), dtype=np.uint64).astype(np.uint32)

    out = jax.jit(jax.shard_map(
        lambda x: psum_mod(f, x, "rows"), mesh=mesh,
        in_specs=jax.sharding.PartitionSpec("rows"),
        out_specs=jax.sharding.PartitionSpec()))(parts.reshape(8, 16))
    want = (parts.astype(object).sum(axis=0) % p).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(out).reshape(16), want)


@pytest.mark.parametrize("grid", [(4, 2), (2, 4), (2, 2), (1, 8)])
def test_sharded_bit_exact_2d_grid(grid):
    """2D grid partitions must give the same bits as the reference."""
    from block_lanczos_tpu.parallel.mesh import make_mesh_grid
    M, ref, prime, n, right = load_golden("left_p65537_n4")
    mesh = make_mesh_grid(*grid)
    res = ShardedBlockLanczos(M, n=n, mesh=mesh).solve()
    assert res.v_nonzero and res.product_zero
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref)


def test_balanced_grid():
    from block_lanczos_tpu.parallel.mesh import balanced_grid
    assert balanced_grid(1) == (1, 1)
    assert balanced_grid(8) == (4, 2)
    assert balanced_grid(16) == (4, 4)
    assert balanced_grid(7) == (7, 1)


@pytest.mark.slow
def test_sharded_checkpoint_resume(tmp_path):
    """Checkpoint a sharded solve mid-way, resume in a FRESH sharded solver
    on a different mesh shape; kernel must equal the uninterrupted run."""
    import os

    from block_lanczos_tpu.utils import checkpoint as ckpt

    prime, n = 65537, 4
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_p65537_n4.mtx"), prime)
    full = ShardedBlockLanczos(M, n=n, mesh=make_mesh(4)).solve()

    solver_b = ShardedBlockLanczos(M, n=n, mesh=make_mesh(4), sync_every=1)
    saved = {}

    def save_at_5(slv, iteration, v, p_blk, start):
        if iteration == 5:
            saved["state"] = {"v": np.asarray(v), "p": np.asarray(p_blk),
                              "iteration": iteration}

    solver_b.solve(stop_after=7, on_iteration=save_at_5)
    assert "state" in saved
    d = str(tmp_path / "ck")
    st = saved["state"]
    ckpt.save_checkpoint(d, st["v"], st["p"], st["iteration"], elapsed=0.0)
    # resume on a DIFFERENT mesh factorization
    resumed = ShardedBlockLanczos(M, n=n, mesh=make_mesh(2)).solve(
        resume_state=ckpt.load_checkpoint(d))
    assert resumed.iterations == full.iterations
    np.testing.assert_array_equal(resumed.kernel, full.kernel)


@pytest.mark.parametrize("ndev", [2, 8])
def test_overlap_bit_exact(ndev):
    """The chunked comm/compute-overlap layout is bit-exact with the
    default sharded solver (and hence with the sequential C reference)."""
    prime, n = 65537, 4
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_p65537_n4.mtx"), prime)
    ref = ShardedBlockLanczos(M, n=n, mesh=make_mesh(ndev),
                              check_invariants=False).solve()
    got = ShardedBlockLanczos(M, n=n, mesh=make_mesh(ndev),
                              check_invariants=False, overlap=True).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.v_nonzero and got.product_zero


def test_overlap_2d_grid_bit_exact():
    from block_lanczos_tpu.parallel.mesh import make_mesh_grid

    prime, n = 1073741789, 4
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_pbig_n4.mtx"), prime)
    ref = ShardedBlockLanczos(M, n=n, mesh=make_mesh(1),
                              check_invariants=False).solve()
    got = ShardedBlockLanczos(M, n=n, mesh=make_mesh_grid(2, 4),
                              check_invariants=True, overlap=True).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)


# ---------------------------------------------------------------------------
# Chunked-path carries under shard_map (regression: round-2 bug — plain
# jnp.zeros scan/fori carries are axis-invariant, loop bodies over sharded
# operands produce varying values, and the mismatch only appeared at shapes
# big enough to take the chunked paths, which golden tests never reach)
# ---------------------------------------------------------------------------

from jax.sharding import NamedSharding, PartitionSpec as P


def _row_sharded(mesh, arr, spec=None):
    return jax.device_put(arr, NamedSharding(mesh, spec or P("rows", None)))


def _per_device_x(x, p):
    """Stack 8 per-device variants of x so sharded outputs are varying."""
    return np.concatenate([
        ((x.astype(np.uint64) * (d + 1)) % p).astype(x.dtype)
        for d in range(8)])


def test_gram_scan_carry_under_shard_map(monkeypatch):
    """gram_mod's chunked lax.scan must run under shard_map (big-N path)."""
    from block_lanczos_tpu.ops import dense
    monkeypatch.setattr(dense, "_gram_chunk_rows", lambda sq: 16)
    p = 65537
    f = GFp.make(p)
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    N, a, b = 8 * 64, 8, 4  # 64 rows/device > 16-row chunks -> scan
    V = rng.integers(0, p, (N, a), dtype=np.uint64).astype(np.uint32)
    W = rng.integers(0, p, (N, b), dtype=np.uint64).astype(np.uint32)

    def local(v, w):
        return psum_mod(f, dense.gram_mod(f, v, w), "rows")

    g = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("rows", None), P("rows", None)),
                              out_specs=P(None, None)))
    got = np.asarray(g(_row_sharded(mesh, V), _row_sharded(mesh, W)))
    exp = (V.astype(object).T @ W.astype(object)) % p
    assert (got.astype(object) == exp).all()


def test_spmv_scan_fallback_under_shard_map():
    """_spmv_scan (multi-chunk COO fallback) must run under shard_map with
    a varying input block."""
    from block_lanczos_tpu.ops import spmm
    p = 65537
    f = GFp.make(p)
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    nnz, out_dim, in_dim = 64, 24, 16
    oi = np.sort(rng.integers(0, out_dim, nnz)).astype(np.int32)
    ii = rng.integers(0, in_dim, nnz).astype(np.int32)
    xv = rng.integers(1, p, nnz, dtype=np.uint64).astype(np.uint32)
    op = spmm.make_sparse_op(f, oi, ii, xv, out_dim, in_dim, chunk=8)
    op = spmm.SparseOp(op.out_dim, op.in_dim, op.nnz, op.chunk,
                       False,  # force the scan fallback
                       op.out_idx, op.in_idx, op.val_mont, op.rowptr)
    x = rng.integers(0, p, (in_dim, 4), dtype=np.uint64).astype(np.uint32)

    def local(xs):
        return spmm.spmv_block(f, op, xs)

    g = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("rows", None),),
                              out_specs=P("rows", None)))
    got = np.asarray(g(_row_sharded(mesh, _per_device_x(x, p))))
    for d in range(8):
        xd = ((x.astype(np.uint64) * (d + 1)) % p).astype(np.uint32)
        exp = spmm.spmv_reference_np(p, out_dim, oi, ii, xv, xd)
        np.testing.assert_array_equal(got[d * out_dim:(d + 1) * out_dim], exp)


def test_hybrid_fori_and_delta_under_shard_map():
    """spmv_hybrid's fori_loop slab walks (absolute + delta) under
    shard_map with a varying input block."""
    from block_lanczos_tpu.ops import spmm
    p = 65537
    f = GFp.make(p)
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    out_dim, in_dim, per = 16, 128, 40  # ell=40 > unroll limit
    oi = np.repeat(np.arange(out_dim, dtype=np.int32), per)
    ii = np.tile(np.sort(rng.choice(in_dim, per, replace=False))
                 .astype(np.int32), out_dim)
    xv = rng.integers(1, p, out_dim * per, dtype=np.uint64).astype(np.uint32)
    x = rng.integers(0, p, (in_dim, 4), dtype=np.uint64).astype(np.uint32)
    for delta in (False, True):
        op = spmm.make_hybrid_op(f, oi, ii, xv, out_dim, in_dim, ell=per,
                                 delta=delta)
        assert op.ell > spmm._ELL_UNROLL
        assert (op.dcols is not None) == delta

        def local(xs):
            return spmm.spmv_hybrid(f, op, xs)

        g = jax.jit(jax.shard_map(local, mesh=mesh,
                                  in_specs=(P("rows", None),),
                                  out_specs=P("rows", None)))
        got = np.asarray(g(_row_sharded(mesh, _per_device_x(x, p))))
        for d in range(8):
            xd = ((x.astype(np.uint64) * (d + 1)) % p).astype(np.uint32)
            exp = spmm.spmv_reference_np(p, out_dim, oi, ii, xv, xd)
            np.testing.assert_array_equal(
                got[d * out_dim:(d + 1) * out_dim], exp)


def test_gf2_gram_scan_under_shard_map(monkeypatch):
    """gram_gf2's chunked XOR scan under shard_map."""
    from block_lanczos_tpu.ops import gf2
    from block_lanczos_tpu.parallel.distributed_gf2 import pxor
    monkeypatch.setattr(gf2, "_GRAM_CHUNK", 16)
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    n, N = 32, 8 * 64
    Xb = rng.integers(0, 2, (N, n)).astype(np.uint32)
    Yb = rng.integers(0, 2, (N, n)).astype(np.uint32)

    def local(xs, ys):
        return pxor(gf2.gram_gf2(xs, ys, n), "rows")

    g = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("rows", None), P("rows", None)),
                              out_specs=P(None, None)))
    got = gf2.unpack_bits_np(np.asarray(
        g(_row_sharded(mesh, gf2.pack_bits_np(Xb)),
          _row_sharded(mesh, gf2.pack_bits_np(Yb)))), n)
    exp = (Xb.astype(np.int64).T @ Yb.astype(np.int64)) % 2
    np.testing.assert_array_equal(got.astype(np.int64), exp)


def test_wide_gram_scan_under_shard_map(monkeypatch):
    """wide gram_mod's chunked scan under shard_map."""
    from block_lanczos_tpu.ops import gfp_wide as gw, wide_ops
    from block_lanczos_tpu.parallel.collectives import psum_mod_wide
    monkeypatch.setattr(wide_ops, "_gram_chunk_rows", lambda sq: 16)
    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    p61 = (1 << 61) - 1
    fw = gw.GFpWide.make(p61)
    N, a, b = 8 * 64, 4, 3
    V = rng.integers(0, p61, (N, a), dtype=np.uint64)
    W = rng.integers(0, p61, (N, b), dtype=np.uint64)

    def local(vs, ws):
        return psum_mod_wide(fw, wide_ops.gram_mod(fw, vs, ws), "rows")

    g = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("rows", None, None),
                                        P("rows", None, None)),
                              out_specs=P(None, None, None)))
    got = gw.np_unpair(np.asarray(
        g(_row_sharded(mesh, gw.np_pair(V), P("rows", None, None)),
          _row_sharded(mesh, gw.np_pair(W), P("rows", None, None)))))
    exp = (V.astype(object).T @ W.astype(object)) % p61
    assert (got == exp).all()


def test_sharded_solve_with_chunked_gram(monkeypatch):
    """Full sharded solve with the Gram scan path forced on (end-to-end
    version of test_gram_scan_carry_under_shard_map): golden parity."""
    from block_lanczos_tpu.ops import dense
    monkeypatch.setattr(dense, "_gram_chunk_rows", lambda sq: 16)
    M, ref, prime, n, right = load_golden("left_p65537_n4")
    res = ShardedBlockLanczos(M, n=n, mesh=make_mesh(4)).solve()
    assert res.v_nonzero and res.product_zero
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref)


def test_sharded_solve_with_input_banding(monkeypatch):
    """Per-shard input banding forced on: golden parity on a 2x2 grid (the
    local ops become spmm.BandedOp; bit-exact by mod-p associativity)."""
    from block_lanczos_tpu.ops import spmm
    from block_lanczos_tpu.parallel import sharding as shard_lib
    from block_lanczos_tpu.parallel.mesh import make_mesh_grid
    monkeypatch.setattr(spmm, "band_count", lambda in_dim, n: 3)
    M, ref, prime, n, right = load_golden("left_p65537_n4")
    solver = ShardedBlockLanczos(M, n=n, mesh=make_mesh_grid(2, 2))
    assert isinstance(solver.ops.first, shard_lib._BandedStackedDir)
    res = solver.solve()
    assert res.v_nonzero and res.product_zero
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref)


def test_build_dir_mixed_seg_safe_spill_padding(monkeypatch):
    """One shard with a spill row beyond the limb-sum cap (seg_safe=False,
    chunk-multiple pad) stacked with safe shards (8-multiple pad): the
    common spill pad must land on the WORST shard's rounding policy.

    Regression: _build_dir took spill_pad from the safe shard's 8-multiple,
    build_op_arrays re-rounded the unsafe shard past it, and np.stack
    raised ValueError (262152 vs 393216 at judge-scale sizes) — the narrow
    sharded partition could not be constructed at all for such matrices.
    """
    import jax.numpy as jnp
    from block_lanczos_tpu.ops import gfp as gfp_mod, spmm
    from block_lanczos_tpu.parallel import sharding as sh

    monkeypatch.setattr(gfp_mod, "LIMB_SUM_MAX", 64)
    chunk, out_dim, p = 64, 64, 65537
    f = GFp.make(p)
    rng = np.random.default_rng(7)

    def part(counts):
        oi = np.repeat(np.arange(len(counts), dtype=np.int32),
                       counts).astype(np.int32)
        ii = rng.integers(0, out_dim, len(oi), dtype=np.int32)
        xv = rng.integers(1, p, len(oi), dtype=np.uint32)
        return oi, ii, xv

    counts_a = np.full(32, 12); counts_a[0] = 13   # safe, spread spill
    counts_b = np.full(32, 2); counts_b[0] = 200   # one >cap spill row
    parts = [part(counts_a), part(counts_b)]

    # precondition: genuinely mixed, with the LARGEST spill on the safe
    # shard and its 8-multiple pad NOT a chunk multiple (the crash shape)
    ell = spmm.choose_ell_width_multi(
        [np.bincount(oi, minlength=out_dim) for oi, _, _ in parts])
    safes, lens = [], []
    for oi, ii, xv in parts:
        _slab, spill_t, _n = spmm.build_hybrid_arrays(
            f, oi, ii, xv, out_dim, out_dim, ell, chunk=chunk)
        safes.append(spill_t[5])
        lens.append(spill_t[0].shape[0])
    assert safes == [True, False] and lens[0] > lens[1] and lens[0] % chunk

    mesh = make_mesh(2)
    nnz_sh = NamedSharding(mesh, P("rows", "cols"))
    d = sh._build_dir(f, parts, out_dim, 2, 1, nnz_sh, chunk)
    assert not d.seg_safe   # dir-level AND -> every shard takes scan path

    # the rebuilt, re-padded spills still compute the exact per-shard SpMV
    x = rng.integers(0, p, (out_dim, 4), dtype=np.uint32)
    for r, (oi, ii, xv) in enumerate(parts):
        sl = [np.asarray(leaf)[r, 0][None, None] for leaf in d.leaves()]
        op = sh._local_hybrid(d, out_dim, out_dim, chunk, sl)
        got = np.asarray(spmm.spmv_hybrid(f, op, jnp.asarray(x)))
        ref = np.zeros((out_dim, 4), np.int64)
        np.add.at(ref, oi,
                  xv.astype(np.int64)[:, None] * x[ii].astype(np.int64) % p)
        np.testing.assert_array_equal(got, ref % p)


# ---------------------------------------------------------------------------
# Round-4 vma-join regressions: loop carries seeded from the VECTOR operand
# alone mismatch when the body also reads MATRIX leaves (varying over BOTH
# mesh axes — the real solver passes them as sharded shard_map arguments,
# unlike the closed-over constants in the unit tests above).  Each test
# forces one such loop inside the FULL mesh solver and asserts bit-parity
# with the single-device solve.  Crash shape that exposed it: a 260k-row
# skewed CLI run whose spill had a >2^17-entry segment (scan fallback).
# ---------------------------------------------------------------------------

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.parallel.mesh import make_mesh_grid
from block_lanczos_tpu.utils.mmio import COOMatrix


def _skewed_coo(p, nrows=360, ncols=240, density=6, seed=13, alpha=1.4):
    from block_lanczos_tpu.utils.gen import random_sparse_skewed
    i, j, x = random_sparse_skewed(ncols, nrows, density, seed=seed,
                                   alpha=alpha)
    order = np.lexsort((i, j))
    dtype = np.uint64 if p > (1 << 32) else np.uint32
    return COOMatrix(nrows, ncols, len(x), j[order].astype(np.int32),
                     i[order].astype(np.int32),
                     (x[order] % p).astype(dtype), p)


def test_solver_spill_scan_carry_under_mesh(monkeypatch):
    """Force seg_safe=False + multi-chunk _spmv_scan inside the mesh solver
    (carry must join x's vma with val_mont's)."""
    from functools import partial as _partial

    from block_lanczos_tpu.ops import gfp as gfp_mod
    from block_lanczos_tpu.parallel import sharding as shard_lib

    p = 65537
    M = _skewed_coo(p)
    ref = BlockLanczos(M, n=4, check_invariants=False).solve()
    monkeypatch.setattr(gfp_mod, "LIMB_SUM_MAX", 16)  # chunk cap & seg cap
    orig = shard_lib.partition_matrix
    monkeypatch.setattr(shard_lib, "partition_matrix",
                        _partial(orig, chunk=16))
    got = ShardedBlockLanczos(M, n=4, mesh=make_mesh_grid(4, 2),
                              check_invariants=False).solve()
    assert not got.stopped_by_limit
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


def test_solver_slab_fori_carry_under_mesh(monkeypatch):
    """Force the (non-delta) slab fori walk inside the mesh solver."""
    from block_lanczos_tpu.ops import spmm

    p = 65537
    M = _skewed_coo(p, seed=14)
    monkeypatch.setattr(spmm, "_ELL_UNROLL", 1)
    ref = BlockLanczos(M, n=4, check_invariants=False, delta=False).solve()
    got = ShardedBlockLanczos(M, n=4, mesh=make_mesh_grid(4, 2),
                              check_invariants=False).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


def test_solver_gf2_slab_fori_carry_under_mesh(monkeypatch):
    """Force the GF(2) slab fori walk inside the GF(2) mesh solver."""
    from block_lanczos_tpu.models import lanczos_gf2 as lg
    from block_lanczos_tpu.models.lanczos_gf2 import BlockLanczosGF2
    from block_lanczos_tpu.parallel.distributed_gf2 import \
        ShardedBlockLanczosGF2

    M = _skewed_coo(2, seed=15)
    monkeypatch.setattr(lg, "_ELL_UNROLL", 1)
    ref = BlockLanczosGF2(M, n=32, check_invariants=False).solve()
    got = ShardedBlockLanczosGF2(M, n=32, mesh=make_mesh_grid(4, 2),
                                 check_invariants=False).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


def test_solver_wide_slab_fori_carry_under_mesh(monkeypatch):
    """Force the wide slab fori walk inside the wide mesh solver."""
    from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide
    from block_lanczos_tpu.ops import wide_ops
    from block_lanczos_tpu.parallel.distributed_wide import \
        ShardedBlockLanczosWide

    p = (1 << 61) - 1
    M = _skewed_coo(p, seed=16)
    monkeypatch.setattr(wide_ops, "_ELL_UNROLL", 1)
    ref = BlockLanczosWide(M, n=4, check_invariants=False).solve()
    got = ShardedBlockLanczosWide(M, n=4, mesh=make_mesh_grid(4, 2),
                                  check_invariants=False).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


# ---------------------------------------------------------------------------
# Round 4: comm/compute overlap for the GF(2) and wide fields (previously
# narrow-only; SURVEY §2 parallelism strategy 7)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("grid", [(8, 1), (2, 4)])
def test_gf2_overlap_bit_exact(grid):
    from block_lanczos_tpu.models.lanczos_gf2 import BlockLanczosGF2
    from block_lanczos_tpu.parallel.distributed_gf2 import \
        ShardedBlockLanczosGF2
    GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_p2_n32.mtx"), 2)
    ref = BlockLanczosGF2(M, n=32).solve()
    got = ShardedBlockLanczosGF2(M, n=32, mesh=make_mesh_grid(*grid),
                                 overlap=True).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


@pytest.mark.parametrize("grid", [(8, 1), (2, 4)])
def test_wide_overlap_bit_exact(grid):
    from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide
    from block_lanczos_tpu.parallel.distributed_wide import \
        ShardedBlockLanczosWide
    GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
    p = (1 << 61) - 1
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_pbig_n4.mtx"), p)
    ref = BlockLanczosWide(M, n=4).solve()
    got = ShardedBlockLanczosWide(M, n=4, mesh=make_mesh_grid(*grid),
                                  overlap=True).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations


def test_cli_overlap_routes_all_fields(tmp_path):
    """--overlap reaches the overlap mesh solver in every field; outputs
    byte-identical to the non-overlap runs."""
    from block_lanczos_tpu.utils import cli
    GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
    for mtx, prime, n, golden in [
            ("left_p65537_n4.mtx", "65537", "4", "left_p65537_n4.kernel.mtx"),
            ("left_p2_n32.mtx", "2", "32", "left_p2_n32.kernel.mtx")]:
        out = str(tmp_path / f"k_{prime}.mtx")
        rc = cli.main(["--matrix", os.path.join(GOLDEN, mtx),
                       "--prime", prime, "--n", n, "--devices", "8",
                       "--overlap", "--output-file", out, "--no-checks"])
        assert rc == 0
        with open(out, "rb") as fh, \
                open(os.path.join(GOLDEN, golden), "rb") as fg:
            assert fh.read() == fg.read()
    # wide: self-parity (no reference golden possible above its cap)
    p = str((1 << 61) - 1)
    out_o = str(tmp_path / "k_wide_o.mtx")
    out_p = str(tmp_path / "k_wide_p.mtx")
    for out, extra in [(out_o, ["--overlap"]), (out_p, [])]:
        rc = cli.main(["--matrix", os.path.join(GOLDEN, "left_pbig_n4.mtx"),
                       "--prime", p, "--n", "4", "--devices", "8",
                       "--output-file", out, "--no-checks"] + extra)
        assert rc == 0
    with open(out_o, "rb") as fa, open(out_p, "rb") as fb:
        assert fa.read() == fb.read()
