"""Checkpoint / resume for long solves.

The reference snapshots {v, tmp, Av, p} as one-u32-per-line text files plus
verbosity metadata, on a wall-clock timer, overwriting in place
(reference: mpi/lanczos_modp.c:1413-1522, trigger :1781-1790).  Only
{v, p, n_iterations} are mathematically required — tmp and Av are recomputed
at the top of every iteration — so that is what we save, as a compressed
.npz plus a JSON manifest.  Unlike the reference, writes are ATOMIC
(tmp file + os.rename), closing the torn-snapshot gap the course notes
flag (SURVEY.md section 5, "not atomic ... a deliberate gap to fix").
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

MANIFEST = "manifest.json"
ARRAYS = "state.npz"


def _atomic_write(path: str, write_fn):
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".ckpt_tmp_")
    try:
        with os.fdopen(fd, "wb") as fh:
            write_fn(fh)
        os.rename(tmp, path)  # atomic on POSIX
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(ckpt_dir: str, v, p_blk, iteration: int, elapsed: float,
                    meta: dict | None = None, verbose: bool = False):
    os.makedirs(ckpt_dir, exist_ok=True)
    v = np.asarray(v)
    p_blk = np.asarray(p_blk)
    _atomic_write(os.path.join(ckpt_dir, ARRAYS),
                  lambda fh: np.savez_compressed(fh, v=v, p=p_blk))
    manifest = {"iteration": int(iteration), "elapsed": float(elapsed),
                "timestamp": time.time(), "shape": list(v.shape)}
    manifest.update(meta or {})
    _atomic_write(os.path.join(ckpt_dir, MANIFEST),
                  lambda fh: fh.write(json.dumps(manifest, indent=1).encode()))
    if verbose:
        print(f"\n    >> checkpoint at iteration {iteration} -> {ckpt_dir}",
              flush=True)


def load_checkpoint(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    with np.load(os.path.join(ckpt_dir, ARRAYS)) as z:
        state = {"v": z["v"], "p": z["p"]}
    state.update(manifest)
    return state


class CheckpointMismatch(ValueError):
    """The checkpoint on disk belongs to a different problem/configuration."""


# Manifest keys that must agree with the resuming invocation.  Matrix identity
# is established by (nrows, ncols, nnz) rather than the path string, so moving
# the matrix file does not invalidate a checkpoint.  The reference blindly
# trusts whatever is on disk (mpi/lanczos_modp.c:1678-1686) — we refuse instead
# of silently producing garbage.
VALIDATED_KEYS = ("prime", "n", "right", "field", "nrows", "ncols", "nnz")


def validate_meta(state: dict, expected: dict):
    """Raise CheckpointMismatch if the manifest conflicts with `expected`.

    Only keys present in BOTH dicts are compared, so manifests written by
    older versions (without the full meta) still resume.
    """
    mismatches = []
    for k in VALIDATED_KEYS:
        if k in state and k in expected and state[k] != expected[k]:
            mismatches.append(
                f"{k}: checkpoint has {state[k]!r}, this run has "
                f"{expected[k]!r}")
    if mismatches:
        raise CheckpointMismatch(
            "checkpoint is incompatible with this invocation:\n  "
            + "\n  ".join(mismatches))


class CheckpointManager:
    """Timer-driven checkpointing (reference default: every 60 s)."""

    def __init__(self, ckpt_dir: str, interval_s: float = 60.0,
                 meta: dict | None = None, verbose: bool = False):
        self.ckpt_dir = ckpt_dir
        self.interval_s = interval_s
        self.meta = meta or {}
        self.verbose = verbose
        self._last = time.time()
        self.saves = 0

    def maybe_save(self, iteration: int, v, p_blk, start_time: float,
                   extra_time: float = 0.0):
        now = time.time()
        if now - self._last < self.interval_s:
            return False
        self._last = now
        save_checkpoint(self.ckpt_dir, v, p_blk, iteration,
                        (now - start_time) + extra_time, self.meta,
                        self.verbose)
        self.saves += 1
        return True
