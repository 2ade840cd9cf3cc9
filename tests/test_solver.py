"""End-to-end solver tests: bit-exact parity with the sequential C reference.

The golden kernel blocks in tests/golden/ were produced by the reference
binary (scripts/make_goldens.py).  Exact mod-p arithmetic plus the shared
xoshiro256+ seed means OUR kernels must match BIT FOR BIT — the same
cross-variant equivalence the reference relies on (SURVEY.md section 4).
"""

import os

import numpy as np
import pytest

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.utils import checker, mmio

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def golden_configs():
    with open(os.path.join(GOLDEN, "MANIFEST.txt")) as fh:
        for line in fh:
            name, prime, n, right = line.split()
            yield name, int(prime), int(n), right == "True"


CONFIGS = list(golden_configs())


@pytest.mark.parametrize("name,prime,n,right", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_bit_exact_vs_reference(name, prime, n, right):
    mtx = os.path.join(GOLDEN, f"{name}.mtx")
    _, _, ref_kernel = mmio.read_array_mtx(
        os.path.join(GOLDEN, f"{name}.kernel.mtx"))
    M = mmio.load_mtx(mtx, prime)
    res = BlockLanczos(M, n=n, right=right).solve()
    assert res.v_nonzero and res.product_zero
    np.testing.assert_array_equal(res.kernel.astype(np.int64), ref_kernel)
    # and the independent checker agrees
    assert checker.check_kernel_block(mtx, res.kernel, prime, right=right)


def test_stop_after():
    name, prime, n, right = CONFIGS[0]
    M = mmio.load_mtx(os.path.join(GOLDEN, f"{name}.mtx"), prime)
    res = BlockLanczos(M, n=n).solve(stop_after=3)
    assert res.iterations == 3 and res.stopped_by_limit
    assert res.v_nonzero is None  # final check skipped, like the reference


def test_checker_rejects_garbage():
    name, prime, n, right = CONFIGS[0]
    mtx = os.path.join(GOLDEN, f"{name}.mtx")
    M = mmio.load_mtx(mtx, prime)
    bad = np.ones((M.nrows, n), np.uint32)
    with pytest.raises(checker.CheckFailure):
        checker.check_kernel_block(mtx, bad, prime)
    with pytest.raises(checker.CheckFailure):
        checker.check_kernel_block(mtx, np.zeros((M.nrows, n), np.uint32), prime)
    with pytest.raises(checker.CheckFailure):  # out-of-range entries
        checker.check_kernel_block(
            mtx, np.full((M.nrows, n), prime, np.uint32), prime)


def test_checker_cli_roundtrip(tmp_path):
    name, prime, n, right = CONFIGS[0]
    mtx = os.path.join(GOLDEN, f"{name}.mtx")
    M = mmio.load_mtx(mtx, prime)
    res = BlockLanczos(M, n=n).solve()
    kpath = str(tmp_path / "kernel.mtx")
    mmio.write_kernel_mtx(kpath, res.kernel, M.nrows, n)
    assert checker.main(["--matrix", mtx, "--kernel", kpath,
                         "--prime", str(prime)]) == 0
    # a corrupted kernel must fail
    _, _, data = mmio.read_array_mtx(kpath)
    data[0, 0] = (data[0, 0] + 1) % prime
    mmio.write_kernel_mtx(kpath, data.astype(np.uint32), M.nrows, n)
    assert checker.main(["--matrix", mtx, "--kernel", kpath,
                         "--prime", str(prime)]) == 1
