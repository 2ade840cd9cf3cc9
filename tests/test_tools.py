"""Tests for matrix_tool CLI and profiling helpers."""

import os

import numpy as np

from block_lanczos_tpu.utils import matrix_tool, mmio

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_generate_and_info(tmp_path, capsys):
    out = str(tmp_path / "g.mtx")
    rc = matrix_tool.main(["generate", "--out", out, "--nrows", "50",
                           "--ncols", "30", "--row-density", "4"])
    assert rc == 0
    nr, nc, nnz = mmio.read_mtx_header(out)
    assert (nr, nc) == (50, 30) and nnz > 0
    rc = matrix_tool.main(["info", "--matrix", out, "--prime", "65537"])
    assert rc == 0
    assert "nnz/row" in capsys.readouterr().out


def test_check_subcommand(tmp_path):
    mtx = os.path.join(GOLDEN, "left_p65537_n4.mtx")
    kern = os.path.join(GOLDEN, "left_p65537_n4.kernel.mtx")
    assert matrix_tool.main(["check", "--matrix", mtx, "--kernel", kern,
                             "--prime", "65537"]) == 0
    # corrupt kernel fails
    _, _, data = mmio.read_array_mtx(kern)
    bad = str(tmp_path / "bad.mtx")
    data[0, 0] = (data[0, 0] + 1) % 65537
    mmio.write_kernel_mtx(bad, data.astype(np.uint32), data.shape[0], 4)
    assert matrix_tool.main(["check", "--matrix", mtx, "--kernel", bad,
                             "--prime", "65537"]) == 1


def test_phase_timers():
    from block_lanczos_tpu.models.lanczos import BlockLanczos
    from block_lanczos_tpu.utils.profiling import phase_timers
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_p65537_n4.mtx"), 65537)
    rep = phase_timers(BlockLanczos(M, n=4), iters=1)
    assert set(rep) >= {"spmv_first_s", "gram_s", "semi_inverse_s",
                        "orthogonalize_s", "total_s", "spmv_share",
                        "spmv_nnz_per_s"}
    assert rep["total_s"] > 0 and 0 < rep["spmv_share"] < 1
