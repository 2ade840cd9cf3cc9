"""End-to-end tests for the wide-field (p < 2^62) solver path."""

import numpy as np
import pytest

import jax.numpy as jnp

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide
from block_lanczos_tpu.ops import gfp_wide as gw
from block_lanczos_tpu.ops import wide_ops as wo
from block_lanczos_tpu.ops.gfp_wide import GFpWide
from block_lanczos_tpu.utils import checker, mmio
from block_lanczos_tpu.utils.gen import random_sparse

P61 = (1 << 61) - 1


def make_matrix(prime, nrows=96, ncols=64, density=5, seed=7, wide_vals=False):
    i, j, x = random_sparse(nrows, ncols, density, seed=seed)
    if wide_vals:
        # values spanning the full wide range
        rng = np.random.default_rng(seed + 1)
        lo = rng.integers(0, 1 << 32, size=len(x)).astype(object)
        hi = rng.integers(0, 1 << 30, size=len(x)).astype(object)
        xv = np.asarray(((hi << 32) | lo) % prime, dtype=np.uint64)
    else:
        xv = (x % prime).astype(np.uint64)
    return mmio.COOMatrix(nrows, ncols, len(xv), i.astype(np.int32),
                          j.astype(np.int32), xv, prime)


def test_spmv_wide_vs_oracle():
    p = P61
    f = GFpWide.make(p)
    rng = np.random.default_rng(0)
    M = make_matrix(p, 60, 40, 4, wide_vals=True)
    op = wo.make_wide_hybrid_op(f, M.i, M.j, np.asarray(M.x, dtype=object),
                                M.nrows, M.ncols)
    x_obj = ((rng.integers(0, 1 << 32, size=(40, 3)).astype(object) << 30)
             | rng.integers(0, 1 << 30, size=(40, 3)).astype(object)) % p
    xd = jnp.asarray(gw.np_pair(x_obj))
    y = gw.np_unpair(np.asarray(wo.spmv_wide(f, op, xd)))
    exp = wo.spmv_wide_oracle(p, M.nrows, M.i, M.j,
                              np.asarray(M.x, dtype=object), x_obj)
    assert (y == exp).all()


def test_spmv_wide_fallback_above_limb_cap(monkeypatch):
    """ell > LIMB_SUM_MAX must take the per-slot modadd fallback (the
    deferred limb sums would overflow); force it by shrinking the cap and
    check both routes agree with the oracle."""
    p = P61
    f = GFpWide.make(p)
    rng = np.random.default_rng(5)
    M = make_matrix(p, 60, 40, 9, seed=3, wide_vals=True)
    op = wo.make_wide_hybrid_op(f, M.i, M.j, np.asarray(M.x, dtype=object),
                                M.nrows, M.ncols)
    assert op.ell > 4
    x_obj = (rng.integers(0, 1 << 60, size=(40, 3)).astype(object)) % p
    xd = jnp.asarray(gw.np_pair(x_obj))
    y_def = gw.np_unpair(np.asarray(wo.spmv_wide(f, op, xd)))
    monkeypatch.setattr(wo.gw, "LIMB_SUM_MAX", 4)
    y_fb = gw.np_unpair(np.asarray(wo.spmv_wide(f, op, xd)))
    exp = wo.spmv_wide_oracle(p, M.nrows, M.i, M.j,
                              np.asarray(M.x, dtype=object), x_obj)
    assert (y_def == exp).all() and (y_fb == exp).all()


def test_semi_inverse_wide_device_vs_host():
    p = P61
    f = GFpWide.make(p)
    rng = np.random.default_rng(1)
    for trial in range(4):
        n = 6
        A = rng.integers(0, 1 << 61, size=(n, n)).astype(object) % p
        U = (A + A.T) % p  # symmetric like a Gram matrix
        if trial == 2:
            U[:, 0] = 0
            U[0, :] = 0  # force a non-pivot column
        if trial == 3:
            U[:] = 0      # all-zero -> 0 pivots
        W, d, npiv = wo.semi_inverse_device(f, jnp.asarray(gw.np_pair(U)))
        W_h, d_h, npiv_h = wo.semi_inverse_py(p, U)
        assert int(npiv) == npiv_h
        assert (np.asarray(d) == d_h).all()
        assert (gw.np_unpair(np.asarray(W)) == W_h.astype(object)).all()


@pytest.mark.slow
def test_wide_solver_end_to_end(tmp_path):
    p = P61
    M = make_matrix(p, 96, 64, 5, wide_vals=True)
    solver = BlockLanczosWide(M, n=4, check_invariants=True)
    res = solver.solve(verbose=False)
    assert res.v_nonzero and res.product_zero
    # independent streaming checker on the written file
    mtx = str(tmp_path / "m.mtx")
    kern = str(tmp_path / "k.mtx")
    with open(mtx, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write(f"{M.nrows} {M.ncols} {M.nnz}\n")
        for a, b, c in zip(M.i, M.j, M.x):
            fh.write(f"{a+1} {b+1} {c}\n")
    mmio.write_kernel_mtx(kern, res.kernel, M.nrows, 4)
    assert checker.check_kernel_file(mtx, kern, p) is True


def test_wide_matches_narrow_for_narrow_prime():
    """Same prime through both field implementations -> identical kernel."""
    p = 65537
    i, j, x = random_sparse(80, 56, 4, seed=3)
    Mn = mmio.COOMatrix(80, 56, len(x), i.astype(np.int32),
                        j.astype(np.int32), (x % p).astype(np.uint32), p)
    Mw = mmio.COOMatrix(80, 56, len(x), i.astype(np.int32),
                        j.astype(np.int32), (x % p).astype(np.uint64), p)
    rn = BlockLanczos(Mn, n=4, check_invariants=True).solve()
    rw = BlockLanczosWide(Mw, n=4, check_invariants=True).solve()
    assert rn.iterations == rw.iterations
    np.testing.assert_array_equal(rn.kernel.astype(np.uint64), rw.kernel)


def test_wide_right_kernel():
    p = 36028797018963913  # 55-bit prime
    M = make_matrix(p, 64, 96, 5, seed=11, wide_vals=True)
    res = BlockLanczosWide(M, n=4, right=True, check_invariants=True).solve()
    assert res.v_nonzero and res.product_zero


def test_wide_load_mtx(tmp_path):
    p = P61
    mtx = str(tmp_path / "w.mtx")
    with open(mtx, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write("2 2 3\n")
        fh.write(f"1 1 {p + 5}\n")       # reduces to 5
        fh.write("1 2 -1\n")             # reduces to p - 1
        fh.write("2 2 7\n")
    M = mmio.load_mtx(mtx, p)
    assert M.x.dtype == np.uint64
    assert list(M.x) == [5, p - 1, 7]


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_wide_sharded_bit_exact(ndev):
    """Sharded wide solve == single-device wide solve, bit for bit."""
    from block_lanczos_tpu.parallel.distributed_wide import \
        ShardedBlockLanczosWide
    from block_lanczos_tpu.parallel.mesh import make_mesh

    p = P61
    M = make_matrix(p, 96, 64, 5, seed=21, wide_vals=True)
    ref = BlockLanczosWide(M, n=4, check_invariants=False).solve()
    got = ShardedBlockLanczosWide(
        M, n=4, mesh=make_mesh(ndev), check_invariants=False).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.v_nonzero and got.product_zero


@pytest.mark.slow
def test_wide_sharded_2d_grid():
    from block_lanczos_tpu.parallel.distributed_wide import \
        ShardedBlockLanczosWide
    from block_lanczos_tpu.parallel.mesh import make_mesh_grid

    p = 36028797018963913
    M = make_matrix(p, 96, 64, 5, seed=22, wide_vals=True)
    ref = BlockLanczosWide(M, n=4, check_invariants=False).solve()
    got = ShardedBlockLanczosWide(
        M, n=4, mesh=make_mesh_grid(2, 4), check_invariants=True).solve()
    assert got.iterations == ref.iterations
    np.testing.assert_array_equal(got.kernel, ref.kernel)


@pytest.mark.parametrize("p", [3, 257, 65537, 1073741789])
def test_cross_field_fuzz_narrow_vs_wide(p):
    """Random configs: both field implementations must agree bit-for-bit
    for any prime in the narrow range (they share only the xoshiro stream
    and the algorithm — the arithmetic stacks are independent)."""
    rng = np.random.default_rng(p)
    nr = int(rng.integers(40, 120))
    nc = int(rng.integers(24, nr))
    n = int(rng.choice([1, 2, 4, 8]))
    i, j, x = random_sparse(nr, nc, int(rng.integers(2, 7)), seed=p % 97)
    Mn = mmio.COOMatrix(nr, nc, len(x), i.astype(np.int32),
                        j.astype(np.int32), (x % p).astype(np.uint32), p)
    Mw = mmio.COOMatrix(nr, nc, len(x), i.astype(np.int32),
                        j.astype(np.int32), (x % p).astype(np.uint64), p)
    rn = BlockLanczos(Mn, n=n, check_invariants=False).solve(stop_after=9)
    rw = BlockLanczosWide(Mw, n=n, check_invariants=False).solve(stop_after=9)
    # compare the iterate after 9 steps (stopped runs return v as-is)
    np.testing.assert_array_equal(rn.kernel.astype(np.uint64), rw.kernel)


def test_wide_checker_limb_math_vs_oracle(tmp_path):
    """The checker's two-limb Montgomery y = x^T M must equal an exact
    object-int evaluation, including negative raw file values (which the
    MatrixMarket format allows and the reference reduces mod p —
    reference: sequential/checker_modp.c:163-196)."""
    p = 4611686018427387847  # largest prime < 2^62
    rng = np.random.default_rng(5)
    nr, nc, nnz = 70, 50, 400
    i = rng.integers(0, nr, size=nnz)
    j = rng.integers(0, nc, size=nnz)
    x = rng.integers(-(1 << 62), 1 << 62, size=nnz).astype(object)
    mtx = str(tmp_path / "m.mtx")
    with open(mtx, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write(f"{nr} {nc} {nnz}\n")
        for a, b, c in zip(i, j, x):
            fh.write(f"{a+1} {b+1} {c}\n")
    xb = ((rng.integers(0, 1 << 32, size=(nr, 3)).astype(object) << 32)
          | rng.integers(0, 1 << 32, size=(nr, 3)).astype(object)) % p
    # oracle: exact object-int y
    y = np.zeros((nc, 3), dtype=object)
    for a, b, c in zip(i, j, x):
        y[b] = (y[b] + (int(c) % p) * xb[a]) % p
    try:
        checker.check_kernel_block(mtx, np.asarray(xb, dtype=np.uint64), p)
        failed = None
    except checker.CheckFailure as e:
        failed = str(e)
    if (y != 0).any():
        # the checker reports the FIRST nonzero y entry; verify it agrees
        ii, jj = np.argwhere(y != 0)[0]
        assert failed == f"KO: y[{ii}, {jj}] == {y[ii, jj]} != 0"
    else:
        assert failed is None


def test_wide_checker_accepts_true_kernel(tmp_path):
    """A genuinely valid wide kernel passes (values near the 2^62 cap)."""
    p = 4611686018427387847
    nr, nc = 8, 5
    # build M with a known left-kernel vector k: rows 6,7 = -(k0 r0 + ...)
    rng = np.random.default_rng(9)
    rows = rng.integers(1, p, size=(6, nc), dtype=np.uint64).astype(object)
    k = rng.integers(1, p, size=6, dtype=np.uint64).astype(object)
    comb = (k[:, None] * rows).sum(axis=0) % p
    last = (-comb) % p
    M = np.vstack([rows, last[None, :], np.zeros((1, nc), dtype=object)])
    kvec = np.concatenate([k, np.ones(1, dtype=object),
                           np.zeros(1, dtype=object)])
    ii, jj = np.nonzero(M)
    mtx = str(tmp_path / "m.mtx")
    with open(mtx, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write(f"{nr} {nc} {len(ii)}\n")
        for a, b in zip(ii, jj):
            fh.write(f"{a+1} {b+1} {M[a, b]}\n")
    assert checker.check_kernel_block(
        mtx, np.asarray(kvec, dtype=np.uint64)[:, None], p) is True


def test_wide_checker_field_primitives_vs_oracle():
    """The checker's _WideField primitives (mont_mul / mulmod) against an
    exact Python-int oracle across the prime range."""
    from block_lanczos_tpu.utils.checker import _WideField
    rng = np.random.default_rng(11)
    for p in [0x3FFFFFDD + 44,  # just past the narrow cap (odd)
              (1 << 61) - 1, 4611686018427387847]:
        f = _WideField(p)
        a = rng.integers(0, p, size=4096, dtype=np.uint64)
        b = rng.integers(0, p, size=4096, dtype=np.uint64)
        rinv = pow(1 << 64, -1, p)
        got_mm = f.mont_mul(a, b).astype(object)
        exp_mm = (a.astype(object) * b.astype(object) * rinv) % p
        assert (got_mm == exp_mm).all()
        got = f.mulmod(a, b).astype(object)
        exp = (a.astype(object) * b.astype(object)) % p
        assert (got == exp).all()


def test_spmv_wide_banded_bit_exact():
    """Banded wide layout == monolithic wide layout == oracle, including
    empty bands and solver end-to-end iterates (banding is layout-only;
    mod-p sums are associative)."""
    p = P61
    f = GFpWide.make(p)
    rng = np.random.default_rng(2)
    M = make_matrix(p, 80, 64, 4, seed=11, wide_vals=True)
    x_obj = ((rng.integers(0, 1 << 32, size=(64, 3)).astype(object) << 30)
             | rng.integers(0, 1 << 30, size=(64, 3)).astype(object)) % p
    xd = jnp.asarray(gw.np_pair(x_obj))
    mono = wo.make_wide_hybrid_op(f, M.i, M.j, np.asarray(M.x, dtype=object),
                                  M.nrows, M.ncols)
    for nb in (2, 3, 5):
        band = wo.make_wide_banded_op(f, M.i, M.j,
                                      np.asarray(M.x, dtype=object),
                                      M.nrows, M.ncols, nb)
        ya = np.asarray(wo.apply_wide(f, mono, xd))
        yb = np.asarray(wo.apply_wide(f, band, xd))
        np.testing.assert_array_equal(ya, yb)

    # solver end-to-end with the banded layout forced in both directions
    solver = BlockLanczosWide(M, n=4, check_invariants=True)
    from block_lanczos_tpu.ops.spmm import band_bounds  # cut-point parity
    assert len(band_bounds(M.ncols, 3)) == 3
    ref = solver.solve(stop_after=4)
    forced = BlockLanczosWide(M, n=4, check_invariants=True)
    forced.first_op = wo.make_wide_banded_op(
        f, M.j, M.i, np.asarray(M.x, dtype=object), M.ncols, M.nrows, 3)
    forced.second_op = wo.make_wide_banded_op(
        f, M.i, M.j, np.asarray(M.x, dtype=object), M.nrows, M.ncols, 2)
    got = forced.solve(stop_after=4)
    np.testing.assert_array_equal(gw.np_unpair(np.asarray(got.kernel)),
                                  gw.np_unpair(np.asarray(ref.kernel)))


def test_wide_band_policy():
    """Policy: engages exactly when the PAIR table exceeds the budget and
    the bands stay above the wide rows floor."""
    # bench config forward direction: 200k x n=4 pairs = 6.4 MB -> banded
    assert wo.wide_band_count(200_000, 4) > 1
    # bench config backward: 300k x 4 x 8 = 9.6 MB -> banded
    assert wo.wide_band_count(300_000, 4) > 1
    # small table: monolithic
    assert wo.wide_band_count(40_000, 4) == 1
    # huge n: target band thinner than the wide rows floor -> monolithic
    assert wo.wide_band_count(3_000_000, 32) == 1
