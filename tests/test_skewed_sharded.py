"""Skew-robust sharded partitioning (power-law matrices on the mesh).

The reference survives arbitrarily skewed matrices distributed because each
MPI rank stores raw COO triplets — no per-shard shape coupling
(reference: mpi/lanczos_modp.c:623-964).  Round 2's equal-band + max-ell
mesh partition inflated total slab slots 5.5-12.5x and put 76% of the nnz
on one shard for power-law instances; these tests pin the round-3 fix
(nnz-balanced LPT band maps + total-cost uniform ELL width,
parallel/sharding.py) to hard bounds AND bit-exact golden parity.
"""

import numpy as np
import pytest

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.parallel.distributed import ShardedBlockLanczos
from block_lanczos_tpu.parallel.mesh import make_mesh, make_mesh_grid
from block_lanczos_tpu.parallel.sharding import op_slots
from block_lanczos_tpu.utils.gen import random_sparse_skewed
from block_lanczos_tpu.utils.mmio import COOMatrix

PRIME = 1073741789


def row_skewed_matrix(nrows=6000, ncols=4000, density=9, seed=3,
                      prime=PRIME, alpha=1.2):
    """Matrix with power-law ROW weights (left-kernel dimension skewed):
    random_sparse_skewed produces Zipf column popularity; transposing makes
    the rows the heavy dimension — the shape of factorization relation
    matrices ("small prime" rows are dense)."""
    i, j, x = random_sparse_skewed(ncols, nrows, density, seed=seed,
                                   alpha=alpha)
    # transpose: (i, j) -> (j, i); rows now Zipf-weighted over nrows
    order = np.lexsort((i, j))
    return COOMatrix(nrows, ncols, len(x), j[order].astype(np.int32),
                     i[order].astype(np.int32),
                     (x[order] % prime).astype(np.uint32), prime)


def solver_slots(stats):
    return stats.total_slab_slots + stats.total_spill_slots


def single_device_slots(solver):
    a, b = op_slots(solver.first_op), op_slots(solver.second_op)
    return a[0] + a[1] + b[0] + b[1]


def test_skewed_partition_bounds_r8():
    """At R=8 on a power-law matrix: balanced bands engage, max shard nnz
    <= 2x mean, and total slot count stays within 1.5x the single-device
    layout (round 2 measured 5.5-12.5x with the naive partition)."""
    M = row_skewed_matrix()
    sharded = ShardedBlockLanczos(M, n=4, mesh=make_mesh(8))
    stats = sharded.ops.stats
    assert stats is not None and stats.row_balanced
    nnz = stats.shard_nnz.astype(float)
    assert nnz.sum() == M.nnz
    assert nnz.max() <= 2.0 * nnz.mean(), stats.summary()

    single = BlockLanczos(M, n=4)
    ratio = solver_slots(stats) / single_device_slots(single)
    assert ratio <= 1.5, (ratio, stats.summary())


def test_skewed_golden_parity_r8():
    """Balanced (permuted) layout is bit-exact with the single-device
    solver — mod-p arithmetic is layout-independent."""
    M = row_skewed_matrix()
    ref = BlockLanczos(M, n=4).solve(stop_after=4)
    res = ShardedBlockLanczos(M, n=4, mesh=make_mesh(8)).solve(stop_after=4)
    np.testing.assert_array_equal(res.kernel, ref.kernel)


def test_skewed_golden_parity_2d_grid():
    """Both axes balanced on a 4x2 grid (columns are uniform here, so the
    col map may stay identity — parity must hold either way)."""
    M = row_skewed_matrix(nrows=3000, ncols=2000, density=7, seed=5)
    ref = BlockLanczos(M, n=4).solve(stop_after=3)
    res = ShardedBlockLanczos(M, n=4,
                              mesh=make_mesh_grid(4, 2)).solve(stop_after=3)
    np.testing.assert_array_equal(res.kernel, ref.kernel)


def test_skewed_overlap_parity():
    """The comm/compute-overlap partition shares the balanced maps."""
    M = row_skewed_matrix(nrows=3000, ncols=2000, density=7, seed=5)
    ref = BlockLanczos(M, n=4).solve(stop_after=3)
    res = ShardedBlockLanczos(M, n=4, mesh=make_mesh(2),
                              overlap=True).solve(stop_after=3)
    assert res.iterations == 3
    np.testing.assert_array_equal(res.kernel, ref.kernel)


def test_skewed_gf2_parity():
    from block_lanczos_tpu.models.lanczos_gf2 import BlockLanczosGF2
    from block_lanczos_tpu.parallel.distributed_gf2 import (
        ShardedBlockLanczosGF2)
    M = row_skewed_matrix(nrows=2000, ncols=1200, density=7, seed=7, prime=2)
    sharded = ShardedBlockLanczosGF2(M, n=32, mesh=make_mesh(8))
    assert sharded.ops.stats.row_balanced
    res = sharded.solve(stop_after=3)
    ref = BlockLanczosGF2(M, n=32).solve(stop_after=3)
    np.testing.assert_array_equal(res.kernel, ref.kernel)


def test_skewed_wide_parity():
    from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide
    from block_lanczos_tpu.parallel.distributed_wide import (
        ShardedBlockLanczosWide)
    p = (1 << 61) - 1
    M = row_skewed_matrix(nrows=1200, ncols=800, density=6, seed=9, prime=p)
    sharded = ShardedBlockLanczosWide(M, n=2, mesh=make_mesh(4))
    assert sharded.ops.stats.row_balanced
    res = sharded.solve(stop_after=2)
    ref = BlockLanczosWide(M, n=2).solve(stop_after=2)
    np.testing.assert_array_equal(res.kernel, ref.kernel)


@pytest.mark.slow
def test_skewed_checkpoint_cross_layout_resume(tmp_path):
    """A checkpoint written in the PERMUTED band layout (with its rowmap)
    resumes bit-exactly in a single-device solver and in a different mesh
    shape — the rowmap round-trips the layout."""
    from block_lanczos_tpu.utils import checkpoint as ckpt

    M = row_skewed_matrix(nrows=1500, ncols=1000, density=7, seed=11)
    n = 4
    straight = BlockLanczos(M, n=n).solve(stop_after=6)

    sharded = ShardedBlockLanczos(M, n=n, mesh=make_mesh(8), sync_every=1)
    assert not sharded.row_map.identity
    saved = {}

    def save_at_3(slv, iteration, v, p_blk, start):
        if iteration == 3 and "v" not in saved:
            saved["v"], saved["p"] = np.asarray(v), np.asarray(p_blk)

    sharded.solve(stop_after=4, on_iteration=save_at_3)
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, saved["v"], saved["p"], 3, elapsed=0.0,
                         rowmap=sharded.row_map.rowmap())
    state = ckpt.load_checkpoint(d)
    assert "rowmap" in state

    resumed_single = BlockLanczos(M, n=n).solve(stop_after=6,
                                                resume_state=state)
    np.testing.assert_array_equal(resumed_single.kernel, straight.kernel)

    resumed_mesh = ShardedBlockLanczos(M, n=n, mesh=make_mesh(2)).solve(
        stop_after=6, resume_state=state)
    np.testing.assert_array_equal(resumed_mesh.kernel, straight.kernel)


def test_skewed_right_kernel_parity():
    """--right with the SKEW on the column (kernel) dimension: the
    generator's native Zipf column popularity is exactly this shape, so no
    transpose — the balanced col-side map must engage and stay bit-exact
    with the single-device right solve."""
    i, j, x = random_sparse_skewed(5000, 3000, 8, seed=11, alpha=1.2)
    order = np.lexsort((j, i))
    M = COOMatrix(5000, 3000, len(x), i[order].astype(np.int32),
                  j[order].astype(np.int32),
                  (x[order] % PRIME).astype(np.uint32), PRIME)
    ref = BlockLanczos(M, n=4, right=True).solve(stop_after=4)
    sharded = ShardedBlockLanczos(M, n=4, right=True, mesh=make_mesh(8))
    stats = sharded.ops.stats
    assert stats is not None and stats.row_balanced  # kernel dim = columns
    res = sharded.solve(stop_after=4)
    np.testing.assert_array_equal(res.kernel, ref.kernel)


def _structured_instance(tmp_path):
    """Downsized structured instance (same generator + alpha as
    benchmarks/gen_structured.py, 250x smaller, Zipf weights transposed
    onto the rows — the left-kernel dimension); returns the .mtx path."""
    from block_lanczos_tpu.utils import mmio as mm
    i, j, x = random_sparse_skewed(3008, 4000, 8, seed=9, alpha=1.2)
    order = np.lexsort((i, j))
    mtx = str(tmp_path / "structured.mtx")
    mm.write_coo_mtx(mtx, 4000, 3008, j[order], i[order], x[order])
    return mtx


def _run_cli(mtx, out, *extra):
    import os as _os
    import subprocess
    import sys as _sys
    env = {**_os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    return subprocess.run(
        [_sys.executable, "-m", "block_lanczos_tpu.utils.cli",
         "--matrix", mtx, "--prime", "2", "--n", "32",
         "--devices", "8", "--output-file", out, "--no-checks", *extra],
        cwd=repo, capture_output=True, text=True, env=env, timeout=600)


def test_structured_instance_cli_end_to_end(tmp_path):
    """CI-scale golden for the structured-instance class the chip bench
    targets (benchmarks/gen_structured.py: Zipf popularity on the kernel
    dimension, GF(2), wide blocking): downsized instance through the full
    CLI mesh solve with the balanced partitioner engaged, byte-identical
    to the sequential C reference — INCLUDING the final-check outcome.
    Byte-parity requires the reference's verbatim operator, so the solve
    runs under --no-dedup (PARITY.md 'GF(2) dedup' states the contract).
    At n=32 this instance class hits an inherent block-Lanczos breakdown
    (npiv == 0 before convergence); the reference KOs at the same
    iteration and writes the same block, so byte-parity (not checker
    success) is the oracle."""
    import subprocess
    from test_reference_fuzz import _reference_binary

    mtx = _structured_instance(tmp_path)
    binary = _reference_binary()
    if binary is None:
        pytest.skip("reference sources/binary unavailable")
    ref_out = str(tmp_path / "ref.mtx")
    r = subprocess.run([binary, "--matrix", mtx, "--prime", "2", "--n", "32",
                        "--output-file", ref_out],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0

    out = str(tmp_path / "kernel.mtx")
    r2 = _run_cli(mtx, out, "--no-dedup")
    assert r2.returncode == 0, r2.stdout[-500:] + r2.stderr[-500:]
    # the structured class engages the balanced partitioner
    assert "(balanced)" in r2.stdout
    with open(ref_out, "rb") as f:
        ref = f.read()
    with open(out, "rb") as f:
        got = f.read()
    assert got == ref


def test_structured_instance_cli_dedup_production(tmp_path):
    """The SAME structured instance under the default production contract
    (dedup on, --salvage): where the reference KOs with an unusable block,
    the CLI produces kernel vectors that pass the independent checker.
    This is the twin of the byte-parity golden above."""
    from block_lanczos_tpu.utils import checker

    mtx = _structured_instance(tmp_path)
    out = str(tmp_path / "kernel_dedup.mtx")
    r = _run_cli(mtx, out, "--salvage")
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    assert checker.check_kernel_file(mtx, out, 2) is True


def test_lpt_snake_deal_bounds_and_parity(monkeypatch):
    """The vectorized head-LPT + snake-tail deal (used above _LPT_EXACT_MAX
    indices) respects the band capacity, balances within the same bound as
    the exact deal, and the solve stays bit-exact vs single-device
    (results are layout-independent by construction)."""
    from block_lanczos_tpu.parallel import sharding as sl

    M = row_skewed_matrix(nrows=6000, ncols=4000, seed=3)
    counts = np.bincount(M.i, minlength=M.nrows).astype(np.int64)

    exact = sl.balanced_band_map(counts, 8)
    monkeypatch.setattr(sl, "_LPT_EXACT_MAX", 100)  # force the snake path
    snake = sl.balanced_band_map(counts, 8)
    assert not snake.identity and snake.band == exact.band

    for m in (exact, snake):
        shard, _ = m.shard_local(np.arange(M.nrows))
        per_bin = np.bincount(shard, minlength=8)
        assert per_bin.max() <= m.band              # capacity
        w = np.bincount(shard, weights=counts, minlength=8)
        assert w.max() <= 2.0 * w.mean()            # balance bound

    ref = BlockLanczos(M, n=4, check_invariants=False).solve()
    got = ShardedBlockLanczos(M, n=4, mesh=make_mesh(8),
                              check_invariants=False).solve()
    np.testing.assert_array_equal(got.kernel, ref.kernel)
    assert got.iterations == ref.iterations
