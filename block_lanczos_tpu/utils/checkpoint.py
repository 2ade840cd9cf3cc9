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
                    meta: dict | None = None, verbose: bool = False,
                    rowmap: np.ndarray | None = None):
    """rowmap: padded-position -> true-row index (-1 on padding) when the
    blocks are stored in a non-identity band layout (skew-balanced mesh
    partitions, parallel/sharding.BandMap); omitted for identity layouts
    so old checkpoints stay byte-compatible."""
    os.makedirs(ckpt_dir, exist_ok=True)
    v = np.asarray(v)
    p_blk = np.asarray(p_blk)
    arrays = {"v": v, "p": p_blk}
    if rowmap is not None:
        arrays["rowmap"] = np.asarray(rowmap)
    _atomic_write(os.path.join(ckpt_dir, ARRAYS),
                  lambda fh: np.savez_compressed(fh, **arrays))
    manifest = {"iteration": int(iteration), "elapsed": float(elapsed),
                "timestamp": time.time(), "shape": list(v.shape)}
    manifest.update(meta or {})
    _atomic_write(os.path.join(ckpt_dir, MANIFEST),
                  lambda fh: fh.write(json.dumps(manifest, indent=1).encode()))
    if verbose:
        print(f"\n    >> checkpoint at iteration {iteration} -> {ckpt_dir}",
              flush=True)


def save_checkpoint_global(ckpt_dir: str, v, p_blk, iteration: int,
                           elapsed: float, meta: dict | None = None,
                           verbose: bool = False,
                           rowmap: np.ndarray | None = None):
    """Checkpoint possibly process-spanning global jax.Arrays.

    Single process: the plain {state.npz + manifest} format.  Multi-process:
    per-host shard files — each process writes only its addressable shards
    into a per-iteration step directory (SURVEY.md section 7 step 7:
    "per-host sharded snapshots ... + manifest"), a cross-process barrier
    orders every shard write before the root's atomic manifest update, so a
    crash mid-snapshot leaves the previous manifest pointing at a complete
    step directory.  Requires a shared checkpoint filesystem (like the
    reference's root-written text snapshots, mpi/lanczos_modp.c:1413-1451).
    """
    import jax
    if jax.process_count() == 1:
        save_checkpoint(ckpt_dir, v, p_blk, iteration, elapsed, meta, verbose,
                        rowmap=rowmap)
        return
    from block_lanczos_tpu.parallel import multihost
    pid = jax.process_index()
    step_dir = os.path.join(ckpt_dir, f"step_{int(iteration):09d}")
    os.makedirs(step_dir, exist_ok=True)
    payload = {"iteration": np.int64(iteration)}
    if rowmap is not None and pid == 0:
        # host-side metadata, identical on every process: root stores it once
        payload["rowmap"] = np.asarray(rowmap)
    arrays_meta = {}
    for name, arr in (("v", v), ("p", p_blk)):
        shards = multihost.addressable_shard_index_data(arr)
        for t, (idx, data) in enumerate(shards):
            starts = [0 if s.start is None else int(s.start) for s in idx]
            payload[f"{name}{t}_data"] = data
            payload[f"{name}{t}_start"] = np.asarray(starts, np.int64)
        payload[f"{name}_count"] = np.int64(len(shards))
        arrays_meta[name] = {"shape": [int(d) for d in arr.shape],
                             "dtype": str(np.dtype(arr.dtype))}
    _atomic_write(os.path.join(step_dir, f"shard_{pid}.npz"),
                  lambda fh: np.savez_compressed(fh, **payload))
    multihost.barrier(f"ckpt_shards_{iteration}")
    if pid == 0:
        manifest = {"iteration": int(iteration), "elapsed": float(elapsed),
                    "timestamp": time.time(),
                    "shape": arrays_meta["v"]["shape"],
                    "step_dir": os.path.basename(step_dir),
                    "shard_files": int(jax.process_count()),
                    "arrays": arrays_meta}
        manifest.update(meta or {})
        _atomic_write(os.path.join(ckpt_dir, MANIFEST),
                      lambda fh: fh.write(
                          json.dumps(manifest, indent=1).encode()))
        # retire superseded step directories (the manifest no longer
        # references them, so this is safe even if it is interrupted)
        for d in os.listdir(ckpt_dir):
            if (d.startswith("step_") and d != os.path.basename(step_dir)
                    and os.path.isdir(os.path.join(ckpt_dir, d))):
                import shutil
                shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
        if verbose:
            print(f"\n    >> checkpoint at iteration {iteration} "
                  f"({jax.process_count()} host shards) -> {ckpt_dir}",
                  flush=True)


def _load_sharded(ckpt_dir: str, manifest: dict) -> dict:
    """Reassemble the global {v, p} from per-host shard files."""
    step_dir = os.path.join(ckpt_dir, manifest["step_dir"])
    state = {}
    for name, am in manifest["arrays"].items():
        state[name] = np.zeros(tuple(am["shape"]), np.dtype(am["dtype"]))
    for k in range(int(manifest["shard_files"])):
        with np.load(os.path.join(step_dir, f"shard_{k}.npz")) as z:
            if int(z["iteration"]) != int(manifest["iteration"]):
                raise ValueError(
                    f"torn checkpoint: shard_{k} is at iteration "
                    f"{int(z['iteration'])}, manifest at "
                    f"{int(manifest['iteration'])}")
            if "rowmap" in z.files:
                state["rowmap"] = z["rowmap"]
            for name in manifest["arrays"]:
                for t in range(int(z[f"{name}_count"])):
                    data = z[f"{name}{t}_data"]
                    start = z[f"{name}{t}_start"]
                    sl = tuple(slice(int(s), int(s) + int(d))
                               for s, d in zip(start, data.shape))
                    state[name][sl] = data
    state.update(manifest)
    return state


def load_checkpoint(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    if "step_dir" in manifest:  # per-host sharded format
        return _load_sharded(ckpt_dir, manifest)
    with np.load(os.path.join(ckpt_dir, ARRAYS)) as z:
        state = {"v": z["v"], "p": z["p"]}
        if "rowmap" in z.files:
            state["rowmap"] = z["rowmap"]
    state.update(manifest)
    return state


class CheckpointMismatch(ValueError):
    """The checkpoint on disk belongs to a different problem/configuration."""


# Manifest keys that must agree with the resuming invocation.  Matrix identity
# is established by (nrows, ncols, nnz) rather than the path string, so moving
# the matrix file does not invalidate a checkpoint.  The reference blindly
# trusts whatever is on disk (mpi/lanczos_modp.c:1678-1686) — we refuse instead
# of silently producing garbage.  m_eff fingerprints the EFFECTIVE operator:
# it differs at equal (nrows, ncols, nnz) exactly when the GF(2) dedup
# setting changed between write and resume (ops/gf2.py::dedup_lines).
VALIDATED_KEYS = ("prime", "n", "right", "field", "nrows", "ncols", "nnz",
                  "m_eff")


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
                 meta: dict | None = None, verbose: bool = False,
                 rowmap: np.ndarray | None = None):
        self.ckpt_dir = ckpt_dir
        self.interval_s = interval_s
        self.meta = meta or {}
        self.verbose = verbose
        self.rowmap = rowmap
        self._last = time.time()
        self.saves = 0
        # Iteration-deterministic due-check schedule: processes only talk
        # when `iteration` crosses the (broadcast-agreed) target, so the
        # steady state between checkpoints costs ZERO cross-host
        # collectives even with per-iteration callbacks (sync_every=1).
        self._next_check_iter = 0
        self._iter_mark = None  # (iteration, time) of the last rate sample
        # preemption support: a signal handler calls request_save() and the
        # next callback persists the state (see cli.main's SIGTERM handler)
        self.save_requested = False

    def request_save(self):
        """Ask for a save at the next opportunity (signal-handler-safe:
        only sets a flag).  Single-process: the next callback saves
        immediately.  Multi-process: honored at the next iteration-
        deterministic due-check (a rank-local bypass would desync the
        collective save), and only the ROOT's request counts — cluster
        preemptions deliver SIGTERM everywhere, so this is the common
        case anyway."""
        self.save_requested = True

    def maybe_save(self, iteration: int, v, p_blk, start_time: float,
                   extra_time: float = 0.0):
        import jax
        multi = jax.process_count() > 1
        if iteration < self._next_check_iter and not (
                self.save_requested and not multi):
            return False
        now = time.time()
        due = (now - self._last >= self.interval_s) or self.save_requested
        # root's iteration-rate estimate -> next due-check target (approach
        # the deadline geometrically: at most ~log2 checks per interval)
        rate = None
        if self._iter_mark is not None:
            i0, t0 = self._iter_mark
            if iteration > i0 and now > t0:
                rate = (iteration - i0) / (now - t0)
        self._iter_mark = (iteration, now)
        remaining_s = (self.interval_s if due
                       else self.interval_s - (now - self._last))
        if rate is None:
            nxt = iteration + 1
        else:
            nxt = iteration + max(1, int(rate * remaining_s * 0.5))
        # Multi-process: the save is collective (every process writes its
        # shards, then a barrier), and the NEXT check target gates whether
        # processes enter this function's collective at all — both must be
        # identical everywhere, so take the root's verdict for both.
        if multi:
            from jax.experimental import multihost_utils
            out = multihost_utils.broadcast_one_to_all(
                np.asarray([int(due), int(nxt)], np.int64))
            due, nxt = bool(out[0]), int(out[1])
        self._next_check_iter = int(nxt)
        if not due:
            return False
        self._last = now
        save_checkpoint_global(self.ckpt_dir, v, p_blk, iteration,
                               (now - start_time) + extra_time, self.meta,
                               self.verbose, rowmap=self.rowmap)
        self.saves += 1
        self.save_requested = False
        return True
