"""Bitsliced GF(2) path: kernels vs oracles, bit-exactness vs the generic
mod-p solver at p=2, end-to-end checker validation."""

import numpy as np
import pytest

import jax.numpy as jnp

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.models.lanczos_gf2 import (BlockLanczosGF2,
                                                  make_gf2_op, spmv_gf2)
from block_lanczos_tpu.ops import gf2
from block_lanczos_tpu.ops.semi_inverse import semi_inverse_np
from block_lanczos_tpu.utils import checker, mmio
from block_lanczos_tpu.utils.gen import random_sparse


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    block = rng.integers(0, 2, size=(37, 64)).astype(np.uint32)
    w = gf2.pack_bits_np(block)
    assert w.shape == (37, 2)
    np.testing.assert_array_equal(gf2.unpack_bits_np(w, 64), block)


def test_matmul_gf2_vs_numpy():
    rng = np.random.default_rng(1)
    n = 64
    X = rng.integers(0, 2, size=(100, n)).astype(np.uint32)
    B = rng.integers(0, 2, size=(n, n)).astype(np.uint32)
    got = gf2.matmul_gf2(jnp.asarray(gf2.pack_bits_np(X)),
                         jnp.asarray(gf2.pack_bits_np(B)), n)
    exp = (X @ B) % 2
    np.testing.assert_array_equal(gf2.unpack_bits_np(np.asarray(got), n), exp)


def test_gram_gf2_vs_numpy():
    rng = np.random.default_rng(2)
    n = 32
    X = rng.integers(0, 2, size=(500, n)).astype(np.uint32)
    Y = rng.integers(0, 2, size=(500, n)).astype(np.uint32)
    got = gf2.gram_gf2(jnp.asarray(gf2.pack_bits_np(X)),
                       jnp.asarray(gf2.pack_bits_np(Y)), n)
    exp = (X.T @ Y) % 2
    np.testing.assert_array_equal(gf2.unpack_bits_np(np.asarray(got), n), exp)


def test_transpose_bits():
    rng = np.random.default_rng(3)
    n = 64
    M = rng.integers(0, 2, size=(n, n)).astype(np.uint32)
    got = gf2.transpose_bits(jnp.asarray(gf2.pack_bits_np(M)), n)
    np.testing.assert_array_equal(gf2.unpack_bits_np(np.asarray(got), n), M.T)


def test_semi_inverse_gf2_vs_generic():
    rng = np.random.default_rng(4)
    n = 32
    for trial in range(4):
        A = rng.integers(0, 2, size=(n, n)).astype(np.uint32)
        U = (A + A.T) % 2
        if trial == 2:
            U[0, :] = 0
            U[:, 0] = 0
        if trial == 3:
            U[:] = 0
        W2, d2, npiv2 = gf2.semi_inverse_gf2(
            jnp.asarray(gf2.pack_bits_np(U)), n)
        Wg, dg, npivg = semi_inverse_np(2, U)
        assert int(npiv2) == npivg
        np.testing.assert_array_equal(np.asarray(d2), dg)
        np.testing.assert_array_equal(
            gf2.unpack_bits_np(np.asarray(W2), n), Wg)


def test_spmv_gf2_vs_oracle():
    rng = np.random.default_rng(5)
    nr, nc, n = 80, 60, 32
    i, j, x = random_sparse(nr, nc, 4, seed=6)
    odd = (x & 1) == 1
    i, j = i[odd], j[odd]
    op = make_gf2_op(i, j, nr, nc)
    X = rng.integers(0, 2, size=(nc + 8, n)).astype(np.uint32)
    X[nc:] = 0  # sentinel + padding rows
    y = spmv_gf2(op, jnp.asarray(gf2.pack_bits_np(X)), out_rows=nr)
    exp = np.zeros((nr, n), np.uint32)
    for a, b in zip(i, j):
        exp[a] ^= X[b]
    np.testing.assert_array_equal(
        gf2.unpack_bits_np(np.asarray(y), n), exp)


def test_gf2_solver_matches_generic_p2():
    """Bitsliced n=32 == generic mod-p solver at p=2, n=32, bit for bit."""
    i, j, x = random_sparse(96, 64, 5, seed=7)
    M = mmio.COOMatrix(96, 64, len(x), i.astype(np.int32), j.astype(np.int32),
                       (x % 2).astype(np.uint32), 2)
    rg = BlockLanczos(M, n=32, check_invariants=True).solve()
    rb = BlockLanczosGF2(M, n=32, check_invariants=True).solve()
    assert rb.iterations == rg.iterations
    np.testing.assert_array_equal(rb.kernel, rg.kernel)
    assert rb.v_nonzero and rb.product_zero


def test_gf2_end_to_end_checker(tmp_path):
    i, j, x = random_sparse(120, 80, 5, seed=8)
    M = mmio.COOMatrix(120, 80, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    res = BlockLanczosGF2(M, n=64, check_invariants=True).solve()
    assert res.v_nonzero and res.product_zero
    mtx = str(tmp_path / "m.mtx")
    kern = str(tmp_path / "k.mtx")
    mmio.write_coo_mtx(mtx, M.nrows, M.ncols, M.i, M.j, M.x)
    mmio.write_kernel_mtx(kern, res.kernel, M.nrows, 64)
    assert checker.check_kernel_file(mtx, kern, 2) is True


def test_gf2_sharded_ops_reuse_across_n(tmp_path):
    """A partition built once and passed via ops= (the bench.py at-scale
    path) yields bit-identical iterates to a per-solver build at every
    blocking n — the operator is independent of n by construction."""
    from block_lanczos_tpu.parallel.distributed_gf2 import (
        ShardedBlockLanczosGF2, partition_matrix_gf2)
    from block_lanczos_tpu.parallel.mesh import make_mesh
    from block_lanczos_tpu.parallel.multihost import put_global

    i, j, x = random_sparse(600, 400, 5, seed=21)
    M2 = mmio.COOMatrix(600, 400, len(x), i.astype(np.int32),
                        j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    mesh = make_mesh(4)
    shared = partition_matrix_gf2(M2, False, mesh)
    for n in (32, 64):
        iterates = []
        for ops in (None, shared):
            s = ShardedBlockLanczosGF2(M2, n=n, mesh=mesh,
                                       check_invariants=False, ops=ops)
            v = s.initial_block()
            p_blk = put_global(np.zeros((s.np_rows, s.W), np.uint32),
                               s._vec_sharding)
            args = s._step_args()
            v, p_blk, *_ = s._multi_step(*args, v, p_blk, np.uint32(3))
            iterates.append(np.asarray(v))
        np.testing.assert_array_equal(iterates[0], iterates[1])


def test_gf2_gram_fused_wide_block(monkeypatch):
    """n_x > _GRAM_UNROLL takes the fused single-reduce path (the n=256
    at-scale formulation); parity vs a numpy mod-2 oracle on both the
    single-chunk and scan routes."""
    import jax.numpy as jnp

    from block_lanczos_tpu.ops import gf2
    rng = np.random.default_rng(11)
    for N, chunk in ((100, 1 << 14), (300, 64)):
        monkeypatch.setattr(gf2, "_GRAM_CHUNK", chunk)
        X = rng.integers(0, 2, (N, 512)).astype(np.uint32)
        Y = rng.integers(0, 2, (N, 64)).astype(np.uint32)
        got = np.asarray(gf2.gram_gf2(jnp.asarray(gf2.pack_bits_np(X)),
                                      jnp.asarray(gf2.pack_bits_np(Y)), 512))
        want = gf2.pack_bits_np(
            (X.T.astype(np.int64) @ Y.astype(np.int64) % 2).astype(np.uint32))
        np.testing.assert_array_equal(got, want)


def test_gf2_checker_bitpacked_oracle(tmp_path):
    """The bit-packed GF(2) checker path agrees with a brute-force mod-2
    product and rejects a single flipped bit."""
    rng = np.random.default_rng(4)
    i, j, x = random_sparse(90, 60, 4, seed=4)
    mtx = str(tmp_path / "m.mtx")
    mmio.write_coo_mtx(mtx, 90, 60, i, j, x)
    # brute-force a genuine left kernel of M mod 2 via GF(2) elimination
    dense = np.zeros((90, 60), np.int64)
    dense[i, j] = x % 2
    res = BlockLanczosGF2(
        mmio.COOMatrix(90, 60, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2),
        n=32).solve()
    assert (res.kernel.T @ dense % 2 == 0).all()  # oracle agrees
    assert checker.check_kernel_block(mtx, res.kernel, 2) is True
    bad = res.kernel.copy()
    # flip one bit on a row that actually meets a nonzero mod-2 column
    r = int(i[(x % 2 == 1).argmax()])
    bad[r, 0] ^= 1
    assert (bad != 0).any()   # never silently skip the rejection check
    with pytest.raises(checker.CheckFailure):
        checker.check_kernel_block(mtx, bad, 2)


def test_gf2_checker_wide_block(tmp_path):
    """n = 96 (3 words) exercises multi-word packing in the checker; the
    kernel block comes from direct mod-2 elimination (tiny matrices at
    wide n hit the known Lanczos breakdown, so no solver here)."""
    i, j, x = random_sparse(70, 40, 4, seed=5)
    mtx = str(tmp_path / "m.mtx")
    mmio.write_coo_mtx(mtx, 70, 40, i, j, x)
    A = np.zeros((70, 40), np.uint8)
    A[i, j] ^= (x % 2).astype(np.uint8)
    # left-nullspace basis of A mod 2 by row reduction of [A | I]
    aug = np.concatenate([A, np.eye(70, dtype=np.uint8)], axis=1)
    r = 0
    for c in range(40):
        piv = np.nonzero(aug[r:, c])[0]
        if len(piv) == 0:
            continue
        p0 = r + piv[0]
        aug[[r, p0]] = aug[[p0, r]]
        elim = np.nonzero(aug[:, c])[0]
        for e in elim:
            if e != r:
                aug[e] ^= aug[r]
        r += 1
    basis = aug[r:, 40:]           # rows with A-part zeroed: x^T A = 0
    assert len(basis) >= 30
    assert (basis.astype(np.int64) @ A.astype(np.int64) % 2 == 0).all()
    # cycle the basis into a 96-wide block (3 words)
    v = basis[np.arange(96) % len(basis)].T.astype(np.uint32)
    assert checker.check_kernel_block(mtx, v, 2) is True
    bad = v.copy()
    bad[int(i[(x % 2 == 1).argmax()]), 65] ^= 1  # bit in word 3
    with pytest.raises(checker.CheckFailure):
        checker.check_kernel_block(mtx, bad, 2)


def test_gf2_right_kernel():
    # NOTE: over GF(2), tiny matrices with block width comparable to the
    # dimension frequently hit the inherent Lanczos self-orthogonality
    # breakdown (the generic solver and the reference behave identically —
    # final check reports KO); this config converges.
    i, j, x = random_sparse(256, 384, 6, seed=10)
    M = mmio.COOMatrix(256, 384, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    res = BlockLanczosGF2(M, n=32, right=True, check_invariants=True).solve()
    assert res.v_nonzero and res.product_zero


def test_gf2_requires_n_multiple_of_32():
    i, j, x = random_sparse(16, 8, 2, seed=10)
    M = mmio.COOMatrix(16, 8, len(x), i.astype(np.int32), j.astype(np.int32),
                       (x % 2).astype(np.uint32), 2)
    with pytest.raises(ValueError):
        BlockLanczosGF2(M, n=4)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_gf2_sharded_bit_exact(ndev):
    from block_lanczos_tpu.parallel.distributed_gf2 import \
        ShardedBlockLanczosGF2
    from block_lanczos_tpu.parallel.mesh import make_mesh

    i, j, x = random_sparse(192, 128, 5, seed=11)
    M = mmio.COOMatrix(192, 128, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    ref = BlockLanczosGF2(M, n=32, check_invariants=False).solve()
    got = ShardedBlockLanczosGF2(
        M, n=32, mesh=make_mesh(ndev), check_invariants=False).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)


@pytest.mark.slow
def test_gf2_sharded_2d_grid():
    from block_lanczos_tpu.parallel.distributed_gf2 import \
        ShardedBlockLanczosGF2
    from block_lanczos_tpu.parallel.mesh import make_mesh_grid

    i, j, x = random_sparse(192, 128, 5, seed=12)
    M = mmio.COOMatrix(192, 128, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    ref = BlockLanczosGF2(M, n=32, check_invariants=False).solve()
    got = ShardedBlockLanczosGF2(
        M, n=32, mesh=make_mesh_grid(2, 4), check_invariants=True).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)


def test_gf2_golden_parity_vs_reference_binary():
    """Bitsliced solver reproduces the C reference's p=2 n=32 output."""
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden")
    M = mmio.load_mtx(os.path.join(golden, "left_p2_n32.mtx"), 2)
    res = BlockLanczosGF2(M, n=32, check_invariants=True).solve()
    assert res.v_nonzero and res.product_zero
    _, _, ref = mmio.read_array_mtx(
        os.path.join(golden, "left_p2_n32.kernel.mtx"))
    np.testing.assert_array_equal(res.kernel, ref.astype(np.uint32))


def test_spmv_gf2_fori_path():
    """ell > 32 exercises the fori_loop slab with dynamic valid-bit lookup."""
    rng = np.random.default_rng(14)
    nr, nc, n = 50, 40, 32
    # dense-ish rows so a forced wide slab still has real entries
    i = np.repeat(np.arange(nr), 20)
    j = rng.integers(0, nc, size=len(i))
    key = i * nc + j
    _, idx = np.unique(key, return_index=True)
    i, j = i[idx], j[idx]
    op = make_gf2_op(i, j, nr, nc, ell=40)
    assert op.ell == 40
    X = rng.integers(0, 2, size=(nc, n)).astype(np.uint32)
    y = spmv_gf2(op, jnp.asarray(gf2.pack_bits_np(X)), out_rows=nr)
    exp = np.zeros((nr, n), np.uint32)
    for a, b in zip(i, j):
        exp[a] ^= X[b]
    np.testing.assert_array_equal(gf2.unpack_bits_np(np.asarray(y), n), exp)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_gf2_fuzz_vs_generic(seed):
    """Random shapes/orientations: bitsliced iterates == generic p=2
    iterates after a bounded number of steps."""
    rng = np.random.default_rng(seed)
    nr = int(rng.integers(48, 160))
    nc = int(rng.integers(33, nr))
    right = bool(rng.integers(0, 2))
    i, j, x = random_sparse(nr, nc, int(rng.integers(2, 6)), seed=seed)
    M = mmio.COOMatrix(nr, nc, len(x), i.astype(np.int32),
                       j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    rg = BlockLanczos(M, n=32, right=right,
                      check_invariants=False).solve(stop_after=7)
    # dedup=False: the generic solver keeps duplicate/empty lines, so
    # bit-parity needs the preprocessing off (fuzz shapes at low density
    # regularly have duplicate columns)
    rb = BlockLanczosGF2(M, n=32, right=right, dedup=False,
                         check_invariants=False).solve(stop_after=7)
    np.testing.assert_array_equal(rb.kernel, rg.kernel.astype(np.uint32))


# ---------------------------------------------------------------------------
# dedup_lines contract (ops/gf2.py): compaction ONLY when duplicates exist
# ---------------------------------------------------------------------------

def test_dedup_passthrough_empty_lines_only():
    """Instances whose only degeneracy is empty m_eff-side lines are an
    exact passthrough: no compaction, (0, 0) reported, and the solver
    stream stays bit-identical to the generic p=2 path (reference keeps
    the matrix verbatim, sequential/lanczos_modp.c:199-263)."""
    # columns 0..5 distinct nonzero patterns, columns 6..9 empty, no dups
    i = np.array([0, 1, 2, 3, 0, 4, 1, 5, 2, 6], np.int32)
    j = np.array([0, 0, 1, 1, 2, 2, 3, 4, 5, 5], np.int32)
    ri, rj, nr, nc, nd, ne = gf2.dedup_lines(i, j, 40, 10, right=False)
    assert (nd, ne) == (0, 0) and (nr, nc) == (40, 10)
    assert ri is i and rj is j   # same arrays, not copies

    x = np.ones(len(i), np.uint32)
    M = mmio.COOMatrix(40, 10, len(i), i, j, x, 2)
    a = BlockLanczosGF2(M, n=32, check_invariants=False).solve(stop_after=3)
    b = BlockLanczosGF2(M, n=32, check_invariants=False,
                        dedup=False).solve(stop_after=3)
    np.testing.assert_array_equal(a.kernel, b.kernel)


def test_dedup_all_empty_operator_passthrough():
    """Zero odd entries: nothing cancels, exact passthrough reporting
    (0, 0) — not n_empty=dim with no compaction (round-4 advisor edge)."""
    i = np.array([], np.int32)
    j = np.array([], np.int32)
    ri, rj, nr, nc, nd, ne = gf2.dedup_lines(i, j, 8, 6, right=True)
    assert (nd, ne) == (0, 0) and (nr, nc) == (8, 6)


def test_dedup_compacts_empties_with_duplicates():
    """When duplicates DO exist, empty lines are compacted away in the
    same pass and both counts report what was actually dropped."""
    # right=True dedups rows: rows 0,1 identical; row 2 distinct; rows 3,4
    # empty; 5 rows total -> keep 2, drop 1 dup + 2 empty
    i = np.array([0, 0, 1, 1, 2], np.int32)
    j = np.array([0, 3, 0, 3, 1], np.int32)
    ri, rj, nr, nc, nd, ne = gf2.dedup_lines(i, j, 5, 4, right=True)
    assert (nd, ne) == (1, 2)
    assert nr == 2 and nc == 4
    assert set(ri.tolist()) == {0, 1} and len(ri) == 3
