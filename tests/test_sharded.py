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
