"""Checkpoint/resume and CLI end-to-end tests."""

import os

import numpy as np

from block_lanczos_tpu.models.lanczos import BlockLanczos
from block_lanczos_tpu.utils import checkpoint as ckpt
from block_lanczos_tpu.utils import cli, mmio
from block_lanczos_tpu.utils.verbosity import VerbosityEngine, format_duration

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ck")
    v = np.arange(12, dtype=np.uint32).reshape(6, 2)
    p = (v * 7) % 65537
    ckpt.save_checkpoint(d, v, p, iteration=5, elapsed=1.5,
                         meta={"prime": 65537})
    state = ckpt.load_checkpoint(d)
    np.testing.assert_array_equal(state["v"], v)
    np.testing.assert_array_equal(state["p"], p)
    assert state["iteration"] == 5 and state["prime"] == 65537
    # overwrite is atomic and versionless: a second save fully replaces
    ckpt.save_checkpoint(d, v + 1, p, iteration=6, elapsed=2.0)
    state = ckpt.load_checkpoint(d)
    assert state["iteration"] == 6
    np.testing.assert_array_equal(state["v"], v + 1)


def test_resume_matches_uninterrupted(tmp_path):
    """Solve A: run to completion.  Solve B: stop mid-way, checkpoint, resume
    in a FRESH solver.  Kernels must be bit-identical."""
    prime, n = 65537, 4
    M = mmio.load_mtx(os.path.join(GOLDEN, "left_p65537_n4.mtx"), prime)
    full = BlockLanczos(M, n=n).solve()

    # sync_every=1 -> exact per-iteration callbacks (default is blocked)
    solver_b = BlockLanczos(M, n=n, sync_every=1)
    saved = {}

    def save_at_5(slv, iteration, v, p_blk, start):
        if iteration == 5:
            saved["state"] = {"v": np.asarray(v), "p": np.asarray(p_blk),
                              "iteration": iteration}

    partial_res = solver_b.solve(stop_after=7, on_iteration=save_at_5)
    assert partial_res.iterations == 7 and "state" in saved

    d = str(tmp_path / "ck")
    st = saved["state"]
    ckpt.save_checkpoint(d, st["v"], st["p"], st["iteration"], elapsed=0.0)
    resumed = BlockLanczos(M, n=n).solve(
        resume_state=ckpt.load_checkpoint(d))
    assert resumed.iterations == full.iterations
    np.testing.assert_array_equal(resumed.kernel, full.kernel)
    assert resumed.v_nonzero and resumed.product_zero


def test_cli_end_to_end(tmp_path, capsys):
    mtx = os.path.join(GOLDEN, "left_p65537_n4.mtx")
    out = str(tmp_path / "kernel.mtx")
    rc = cli.main(["--matrix", mtx, "--prime", "65537", "--n", "4",
                   "--output-file", out, "--single"])
    assert rc == 0
    _, _, got = mmio.read_array_mtx(out)
    _, _, ref = mmio.read_array_mtx(
        os.path.join(GOLDEN, "left_p65537_n4.kernel.mtx"))
    np.testing.assert_array_equal(got, ref)


def test_cli_checkpoint_resume(tmp_path):
    mtx = os.path.join(GOLDEN, "left_p65537_n4.mtx")
    ckdir = str(tmp_path / "ck")
    # run 6 iterations with aggressive checkpointing (every 0 seconds)
    rc = cli.main(["--matrix", mtx, "--prime", "65537", "--n", "4",
                   "--stop-after", "6", "--single",
                   "--checkpoint", "0", "--checkpoint-dir", ckdir])
    assert rc == 0
    state = ckpt.load_checkpoint(ckdir)
    assert state["iteration"] == 6
    # resume to completion and verify against the golden kernel
    out = str(tmp_path / "kernel.mtx")
    rc = cli.main(["--matrix", mtx, "--prime", "65537", "--n", "4",
                   "--output-file", out, "--single",
                   "--load-checkpoint", "--checkpoint-dir", ckdir])
    assert rc == 0
    _, _, got = mmio.read_array_mtx(out)
    _, _, ref = mmio.read_array_mtx(
        os.path.join(GOLDEN, "left_p65537_n4.kernel.mtx"))
    np.testing.assert_array_equal(got, ref)


def test_cli_validation(tmp_path):
    mtx = os.path.join(GOLDEN, "left_p65537_n4.mtx")
    assert cli.main(["--matrix", mtx, "--prime", "65537",
                     "--output-file", "x", "--stop-after", "3"]) == 1
    # beyond even the wide cap (2^62) -> rejected
    assert cli.main(["--matrix", mtx, "--prime", str(2**62 + 1)]) == 1
    # 2^31 - 1 exceeds the reference's 2^30-35 cap but OUR wide path takes it
    assert cli.main(["--matrix", mtx, "--prime", str(2**31 - 1),
                     "--stop-after", "2", "--no-checks"]) == 0


def test_cli_checkpoint_meta_mismatch(tmp_path, capsys):
    """Resuming with conflicting {prime, n, right, field, shape} is refused
    with a clear error (the reference blindly trusts the files on disk,
    mpi/lanczos_modp.c:1678-1686)."""
    from block_lanczos_tpu.utils.gen import write_random_mtx

    mtx = os.path.join(GOLDEN, "left_p65537_n4.mtx")
    ckdir = str(tmp_path / "ck")
    rc = cli.main(["--matrix", mtx, "--prime", "65537", "--n", "4",
                   "--stop-after", "4", "--single",
                   "--checkpoint", "0", "--checkpoint-dir", ckdir])
    assert rc == 0
    capsys.readouterr()

    def resume(extra):
        return cli.main(["--matrix", mtx, "--single", "--load-checkpoint",
                         "--checkpoint-dir", ckdir, "--stop-after", "6",
                         *extra])

    # wrong n
    assert resume(["--prime", "65537", "--n", "8"]) == 1
    assert "n: checkpoint has 4" in capsys.readouterr().err
    # wrong prime (also flips the field for p=2... use a narrow prime)
    assert resume(["--prime", "65521", "--n", "4"]) == 1
    assert "prime: checkpoint has 65537" in capsys.readouterr().err
    # wrong kernel side
    assert resume(["--prime", "65537", "--n", "4", "--right"]) == 1
    assert "right: checkpoint has False" in capsys.readouterr().err
    # wrong matrix shape (same flags, different file)
    other = str(tmp_path / "other.mtx")
    write_random_mtx(other, 64, 48, 3, seed=9)
    rc = cli.main(["--matrix", other, "--single", "--load-checkpoint",
                   "--checkpoint-dir", ckdir, "--stop-after", "6",
                   "--prime", "65537", "--n", "4"])
    assert rc == 1
    assert "nrows: checkpoint has" in capsys.readouterr().err
    # matching config resumes fine
    assert resume(["--prime", "65537", "--n", "4"]) == 0
    # missing checkpoint dir is a clean error, not a traceback
    rc = cli.main(["--matrix", mtx, "--prime", "65537", "--n", "4",
                   "--single", "--load-checkpoint",
                   "--checkpoint-dir", str(tmp_path / "nope")])
    assert rc == 1
    assert "cannot load checkpoint" in capsys.readouterr().err


def test_cli_checkpoint_dedup_mismatch(tmp_path, capsys):
    """A GF(2) checkpoint written under one dedup setting is refused on
    resume under the other: m_eff fingerprints the effective operator, so
    continuing the recurrence under a different A is caught BEFORE any
    compute is wasted (round-4 advisor finding)."""
    from block_lanczos_tpu.utils import mmio as mm
    from block_lanczos_tpu.utils.gen import random_sparse

    # seed-9 64x96: has duplicate rows, so dedup changes m_eff (right=True)
    i, j, x = random_sparse(64, 96, 5, seed=9)
    mtx = str(tmp_path / "dup.mtx")
    mm.write_coo_mtx(mtx, 64, 96, i, j, x)
    ckdir = str(tmp_path / "ck")
    base = ["--matrix", mtx, "--prime", "2", "--n", "32", "--right",
            "--single", "--no-checks", "--checkpoint-dir", ckdir]
    rc = cli.main([*base, "--stop-after", "1", "--checkpoint", "0",
                   "--sync-every", "1"])
    assert rc == 0
    capsys.readouterr()
    # resume under the OTHER dedup setting -> refused with the hint
    rc = cli.main([*base, "--load-checkpoint", "--stop-after", "2",
                   "--no-dedup"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "m_eff: checkpoint has" in err and "--no-dedup" in err
    # matching setting resumes fine
    assert cli.main([*base, "--load-checkpoint", "--stop-after", "2"]) == 0


def test_validate_meta_ignores_unknown_and_legacy():
    """Manifests from older versions (no field/shape keys) still resume."""
    ckpt.validate_meta({"iteration": 3, "prime": 65537},
                       {"prime": 65537, "n": 4, "field": "narrow"})
    with pytest.raises(ckpt.CheckpointMismatch):
        ckpt.validate_meta({"prime": 65537}, {"prime": 2})


def test_verbosity_engine(capsys):
    eng = VerbosityEngine(100, min_interval_s=0.0)
    import time
    start = time.time() - 10.0
    eng.tick(start)
    out = capsys.readouterr().out
    assert "Expected duration" in out and "iteration 1 / 100" in out
    assert format_duration(90061) == "1 j 1 h 1 min 1 s"


def test_cli_gf2_roundtrip(tmp_path):
    """p=2 routes to the bitsliced path; output validates with the checker."""
    from block_lanczos_tpu.utils import checker
    from block_lanczos_tpu.utils.gen import write_random_mtx

    mtx = str(tmp_path / "m2.mtx")
    out = str(tmp_path / "k2.mtx")
    write_random_mtx(mtx, 200, 120, 5, seed=13)  # the golden p2_n32 config
    rc = cli.main(["--matrix", mtx, "--prime", "2", "--n", "32",
                   "--single", "--output-file", out])
    assert rc == 0
    assert checker.check_kernel_file(mtx, out, 2) is True


def test_cli_wide_roundtrip(tmp_path):
    """wide prime routes to the pair-field path; checker-validated."""
    from block_lanczos_tpu.utils import checker
    from block_lanczos_tpu.utils.gen import write_random_mtx

    p = 36028797018963913  # 55-bit prime
    mtx = str(tmp_path / "mw.mtx")
    out = str(tmp_path / "kw.mtx")
    write_random_mtx(mtx, 96, 64, 5, seed=7)
    rc = cli.main(["--matrix", mtx, "--prime", str(p), "--n", "4",
                   "--single", "--output-file", out])
    assert rc == 0
    assert checker.check_kernel_file(mtx, out, p) is True


import pytest


@pytest.mark.slow
def test_cli_sharded_field_routing(tmp_path):
    """--devices routes wide and GF(2) primes to their mesh solvers."""
    from block_lanczos_tpu.utils.gen import write_random_mtx

    mtx = str(tmp_path / "m.mtx")
    write_random_mtx(mtx, 96, 64, 4, seed=5)
    # wide prime on an 8-device mesh
    rc = cli.main(["--matrix", mtx, "--prime", "36028797018963913",
                   "--n", "4", "--devices", "8", "--stop-after", "3",
                   "--no-checks"])
    assert rc == 0
    # GF(2) on a 2x4 grid
    rc = cli.main(["--matrix", mtx, "--prime", "2", "--n", "32",
                   "--grid", "2", "4", "--stop-after", "3", "--no-checks"])
    assert rc == 0


def test_manager_request_save_bypasses_schedule(tmp_path):
    """request_save (the SIGTERM path) saves at the next callback even when
    neither the timer nor the iteration due-check would fire."""
    v = np.zeros((8, 2), np.uint32)
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"), interval_s=3600.0)
    assert mgr.maybe_save(1, v, v, 0.0) is False
    assert mgr.maybe_save(2, v, v, 0.0) is False   # sets a far next-check
    mgr.request_save()
    assert mgr.maybe_save(3, v, v, 0.0) is True    # bypasses both gates
    assert mgr.save_requested is False             # consumed
    state = ckpt.load_checkpoint(str(tmp_path / "ck"))
    assert state["iteration"] == 3
    assert mgr.maybe_save(4, v, v, 0.0) is False   # schedule resumes


def test_cli_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-solve: the CLI saves a checkpoint, exits 128+15, and a
    --load-checkpoint rerun completes with the correct kernel (validated by
    the independent checker)."""
    import signal
    import subprocess
    import sys
    import time as _time

    from block_lanczos_tpu.utils import checker
    from block_lanczos_tpu.utils.gen import write_random_mtx

    mtx = str(tmp_path / "m.mtx")
    write_random_mtx(mtx, 2000, 1500, 8, seed=7)
    ckdir = str(tmp_path / "ck")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # interval 3600 -> only the signal can trigger the save; sync-every 1
    # gives per-iteration callbacks so the save lands within one iteration
    proc = subprocess.Popen(
        [sys.executable, "-m", "block_lanczos_tpu.utils.cli",
         "--matrix", mtx, "--prime", "65537", "--n", "4", "--single",
         "--sync-every", "1", "--checkpoint", "3600",
         "--checkpoint-dir", ckdir,
         "--output-file", str(tmp_path / "k.mtx"), "--no-checks"],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    # give startup + compile a head start, then signal mid-loop (the
    # 2000x1500 solve runs ~375 iterations with per-iteration host syncs,
    # leaving a wide window; if the solve still finishes first, skip)
    for _ in range(8):
        _time.sleep(0.5)
        if proc.poll() is not None:
            break
    if proc.poll() is None:
        proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    if proc.returncode == 0:
        pytest.skip("solve finished before the signal landed")
    assert proc.returncode == 128 + 15, out[-800:]
    assert "checkpointed" in out
    state = ckpt.load_checkpoint(ckdir)
    assert state["iteration"] > 0
    # resume to completion; kernel must validate
    out_file = str(tmp_path / "k2.mtx")
    r = subprocess.run(
        [sys.executable, "-m", "block_lanczos_tpu.utils.cli",
         "--matrix", mtx, "--prime", "65537", "--n", "4", "--single",
         "--load-checkpoint", "--checkpoint-dir", ckdir,
         "--output-file", out_file, "--no-checks"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    assert checker.check_kernel_file(mtx, out_file, 65537) is True
