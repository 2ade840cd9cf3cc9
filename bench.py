#!/usr/bin/env python
"""Benchmark: block-Lanczos SpMV throughput on one TPU chip vs the C reference.

Measures steady-state per-iteration time of the full solver (2 exact mod-p
SpMVs + 2 Gram products + semi-inverse + orthogonalize) on a generated
sparse matrix with the reference's benchmark configuration
(--prime 1073741789 --n 4; BASELINE.md), then runs the reference's
SEQUENTIAL C solver on the SAME matrix on this host for an
apples-to-apples per-iteration baseline.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s_per_chip", "value": ..., "unit": "nnz/s",
   "vs_baseline": <our iterations/s divided by sequential C iterations/s>}

Environment-survival design (round-5; the tunneled chip goes down for
hours and a dead tunnel HANGS dispatch rather than raising):
  - the watchdog probes the tunnel FAST (timeout'd jax.devices() in a
    subprocess) and falls back to the flagged cached result immediately
    instead of hanging until its own timeout;
  - the inner bench publishes INCREMENTALLY — every completed stage
    rewrites last_result.json — so a later hang still publishes the
    finished rows (flagged "partial");
  - all result/min-record caches live IN THE REPO
    (benchmarks/results/cache/), not in volatile /tmp, so they survive
    the between-rounds /tmp wipe; only regenerable matrices stay in /tmp;
  - the child's output is tee'd to a log so a timeout leaves diagnostics.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

PRIME = 1073741789
N_BLOCK = 4
NROWS, NCOLS, DENSITY, SEED = 300_000, 200_000, 15, 42
WARMUP_ITERS = 4
BENCH_ITERS = 40
REF_ITERS = 11

CACHE_DIR = "/tmp/blanczos_bench"          # regenerable matrices only
MTX = os.path.join(CACHE_DIR, f"bench_{NROWS}x{NCOLS}_d{DENSITY}_s{SEED}.mtx")

# committed caches: survive the between-rounds /tmp wipe (VERDICT r4 #2)
_REPO = os.path.dirname(os.path.abspath(__file__))
RESULT_DIR = os.path.join(_REPO, "benchmarks", "results", "cache")
LAST_RESULT = os.path.join(RESULT_DIR, "last_result.json")
GF2_SCALE_CACHE = os.path.join(RESULT_DIR, "gf2_at_scale_cache.json")
REF_CACHE = os.path.join(RESULT_DIR, "ref_cache.json")
CHILD_LOG = os.path.join(RESULT_DIR, "bench_child.log")


def _write_json(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)


def _read_json(path, default):
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return default


def ensure_matrix():
    os.makedirs(CACHE_DIR, exist_ok=True)
    if not os.path.exists(MTX):
        from block_lanczos_tpu.utils.gen import write_random_mtx
        print("generating benchmark matrix ...", file=sys.stderr)
        write_random_mtx(MTX, NROWS, NCOLS, DENSITY, seed=SEED)
    return MTX


# ---------------------------------------------------------------------------
# our measurements (one stage per config; honest per-iteration wall time:
# result arrays are MATERIALIZED to host (np.asarray) before reading the
# clock — jax.block_until_ready does not reliably await execution on
# tunneled backends, measured returning in microseconds with tens of ms of
# real work still queued)
# ---------------------------------------------------------------------------

def per_iter(M, n_blk):
    import jax.numpy as jnp

    from block_lanczos_tpu.models.lanczos import BlockLanczos
    solver = BlockLanczos(M, n=n_blk, check_invariants=False)
    v = solver.initial_block()
    p_blk = jnp.zeros_like(v)
    # warmup (includes compile)
    v, p_blk, *rest = solver._multi_step(v, p_blk, WARMUP_ITERS)
    np.asarray(v)
    t0 = time.perf_counter()
    v, p_blk, *rest = solver._multi_step(v, p_blk, BENCH_ITERS)
    np.asarray(v)
    k_done = int(rest[-1])
    return (time.perf_counter() - t0) / max(k_done, 1)


def per_iter_gf2(M, n_blk):
    import jax.numpy as jnp

    from block_lanczos_tpu.models.lanczos_gf2 import BlockLanczosGF2
    from block_lanczos_tpu.utils.mmio import COOMatrix
    M2 = COOMatrix(M.nrows, M.ncols, M.nnz, M.i, M.j,
                   (M.x % 2).astype(np.uint32), 2)
    solver = BlockLanczosGF2(M2, n=n_blk, check_invariants=False)
    v = solver.initial_block()
    p_blk = jnp.zeros_like(v)
    v, p_blk, *rest = solver._multi_step(v, p_blk, WARMUP_ITERS)
    np.asarray(v)
    t0 = time.perf_counter()
    v, p_blk, *rest = solver._multi_step(v, p_blk, BENCH_ITERS)
    np.asarray(v)
    return (time.perf_counter() - t0) / max(int(rest[-1]), 1)


def per_iter_wide(M, n_blk):
    import jax.numpy as jnp

    from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide
    from block_lanczos_tpu.utils.mmio import COOMatrix
    p61 = (1 << 61) - 1
    Mw = COOMatrix(M.nrows, M.ncols, M.nnz, M.i, M.j,
                   M.x.astype(np.uint64), p61)
    solver = BlockLanczosWide(Mw, n=n_blk, check_invariants=False)
    v = solver.initial_block()
    p_blk = jnp.zeros_like(v)
    v, p_blk, *rest = solver._multi_step(v, p_blk, WARMUP_ITERS)
    np.asarray(v)
    t0 = time.perf_counter()
    v, p_blk, *rest = solver._multi_step(v, p_blk, BENCH_ITERS // 2)
    np.asarray(v)
    return (time.perf_counter() - t0) / max(int(rest[-1]), 1)


def _gf2_code_fingerprint() -> str:
    """Hash of the sources that determine the GF(2) mesh solver's compute
    path: the at-scale min-record cache is only merged when the code that
    produced it is unchanged, so a perf regression can never hide behind a
    stale faster record (ADVICE r3)."""
    import hashlib
    pkg = os.path.join(_REPO, "block_lanczos_tpu")
    h = hashlib.sha256()
    for rel in ("ops/gf2.py", "ops/spmm.py", "models/lanczos_gf2.py",
                "parallel/distributed_gf2.py", "parallel/sharding.py",
                "parallel/collectives.py"):
        try:
            with open(os.path.join(pkg, rel), "rb") as fh:
                h.update(fh.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:16]


def bench_gf2_at_scale(on_row=None):
    """Driver-captured 51M-nnz GF(2) rows (BASELINE config-4 scale): the
    n=256 blocking's ~1.8x TTS win must survive at factorization scale —
    round 2 could not even compile that program (per-bit trace unrolls;
    fixed by the word-level gf2 kernels).  Returns {n: s_per_iteration};
    rows whose published value came from the disk cache rather than this
    run's fresh measurement are listed in the companion set (second
    return value).  `on_row(n, value, from_cache)` fires after each
    blocking completes so the caller can publish incrementally."""
    from block_lanczos_tpu.parallel.distributed_gf2 import (
        ShardedBlockLanczosGF2, partition_matrix_gf2)
    from block_lanczos_tpu.parallel.mesh import make_mesh
    from block_lanczos_tpu.parallel.multihost import put_global
    from block_lanczos_tpu.utils.gen import random_sparse
    from block_lanczos_tpu.utils.mmio import COOMatrix

    # generation is ~2 min of single-core NumPy on this host — cache the
    # triplets on disk next to the headline matrix
    npz = os.path.join(CACHE_DIR, "bench_3Mx2M_d17_s42.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        i, j, x = d["i"], d["j"], d["x"]
    else:
        os.makedirs(CACHE_DIR, exist_ok=True)
        i, j, x = random_sparse(3_000_000, 2_000_000, 17, seed=42)
        np.savez(npz, i=i, j=j, x=x)
    M2 = COOMatrix(3_000_000, 2_000_000, len(x), i.astype(np.int32),
                   j.astype(np.int32), (x % 2).astype(np.uint32), 2)
    # the 1x1-mesh program — what the CLI auto-picks at this scale
    # (expected iterations < 20k; the single driver's remote compile
    # is pathologically slow on this toolchain, PERF.md).  The partition
    # is independent of the blocking n: build once (~46 s host-side at
    # 51M nnz, measured), reuse for both widths.
    # min-record disk cache (same discipline as the reference baseline
    # cache): the 51M-nnz programs cost minutes of remote compile each, so
    # a fresh measurement can only LOWER the published number, and a prior
    # run (e.g. the measurement queue) spares the round-end bench the
    # recompiles entirely.
    fp = _gf2_code_fingerprint()
    raw = _read_json(GF2_SCALE_CACHE, {})
    # legacy flat {n: v} caches carry no fingerprint — treat as stale
    cache = ({int(k): v for k, v in raw.get("rows", {}).items()}
             if raw.get("fingerprint") == fp else {})
    if os.environ.get("BLANCZOS_AT_SCALE_CACHED_ONLY") and cache:
        if on_row:
            for k, v in cache.items():
                on_row(k, v, True)
        return cache, set(cache)

    mesh = make_mesh(1)
    ops = partition_matrix_gf2(M2, False, mesh)
    out = dict(cache)
    from_cache = set(cache)
    try:
        for n_blk in (128, 256):
            solver = ShardedBlockLanczosGF2(M2, n=n_blk, mesh=mesh,
                                            check_invariants=False, ops=ops)
            v = solver.initial_block()
            p_blk = put_global(
                np.zeros((solver.np_rows, solver.W), np.uint32),
                solver._vec_sharding)
            sargs = solver._step_args()
            v, p_blk, *rest = solver._multi_step(*sargs, v, p_blk,
                                                 np.uint32(2))
            np.asarray(v)
            t0 = time.perf_counter()
            v, p_blk, *rest = solver._multi_step(*sargs, v, p_blk,
                                                 np.uint32(8))
            np.asarray(v)
            fresh = (time.perf_counter() - t0) / max(int(rest[-1]), 1)
            out[n_blk] = min(fresh, cache.get(n_blk, float("inf")))
            if fresh <= cache.get(n_blk, float("inf")):
                from_cache.discard(n_blk)
            # persist + publish after EVERY row — a later hang (e.g. the
            # n=256 compile) must not lose this one
            cache.update(out)
            _write_json(GF2_SCALE_CACHE,
                        {"fingerprint": fp,
                         "rows": {str(k): v for k, v in cache.items()}})
            if on_row:
                on_row(n_blk, out[n_blk], n_blk in from_cache)
    except Exception as e:
        # tunnel drops mid-measurement must not lose the cached rows
        if not out:
            raise
        print(f"at-scale GF(2) partial ({e}); using cached rows",
              file=sys.stderr)
        if on_row:
            for k, v in out.items():
                on_row(k, v, k in from_cache)
    return out, from_cache


def bench_reference_seq(mtx_path, prime=PRIME, n=N_BLOCK, iters=REF_ITERS,
                        repeats=2):
    """Per-iteration time of the sequential C reference on this host."""
    build_dir = "/tmp/blanczos_refbench"
    binary = os.path.join(build_dir, "lanczos_modp")
    if not os.path.exists(binary):
        try:
            os.makedirs(build_dir, exist_ok=True)
            src = "/root/reference/sequential"
            subprocess.run(
                f"cp {src}/*.c {src}/*.h {src}/Makefile {build_dir}/ && "
                f"make -C {build_dir}", shell=True, check=True,
                capture_output=True)
        except subprocess.CalledProcessError:
            return None
    key = f"{os.path.basename(mtx_path)}|p={prime}|n={n}|it={iters}"
    cache = _read_json(REF_CACHE, {})
    # The cache keeps the MIN over all historical runs rather than
    # short-circuiting: a single-shot baseline taken under host contention
    # would otherwise be republished (inflated, flattering us) forever.
    # Every bench run still measures fresh and can only lower the record.

    def one_measurement():
        t0 = time.perf_counter()
        subprocess.run(
            [binary, "--matrix", mtx_path, "--prime", str(prime),
             "--n", str(n), "--stop-after", str(iters)],
            check=True, capture_output=True, timeout=3600)
        wall = time.perf_counter() - t0
        # subtract the load time (measured with a 0-iteration... the solver
        # has no such mode; approximate load via a 1-iteration run)
        t0 = time.perf_counter()
        subprocess.run(
            [binary, "--matrix", mtx_path, "--prime", str(prime),
             "--n", str(n), "--stop-after", "1"],
            check=True, capture_output=True, timeout=3600)
        wall1 = time.perf_counter() - t0
        return max((wall - wall1) / (iters - 1), 1e-9)

    try:
        # min over repeats: this host is shared, and contention
        # inflates the baseline (i.e. flatters us) by up to ~6x
        result = min(one_measurement() for _ in range(repeats))
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return cache.get(key)
    result = min(result, cache.get(key, float("inf")))
    cache[key] = result
    _write_json(REF_CACHE, cache)
    return result


# ---------------------------------------------------------------------------
# watchdog layer
# ---------------------------------------------------------------------------

def _probe_tunnel(budget_s: int = 150) -> bool:
    """Fast up/down check: a dead tunnel hangs jax.devices() forever, so
    probe in a KILLABLE subprocess (the chipqueue pattern) instead of
    letting the whole bench ride into its watchdog timeout."""
    code = "import jax; print(jax.devices())"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=budget_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _cached_fallback(reason: str) -> bool:
    """Republish the last real measurement, EXPLICITLY flagged as cached.

    Better a flagged stale artifact than none.  Returns False when no
    cached result exists."""
    prev = _read_json(LAST_RESULT, None)
    if prev is None:
        return False
    prev["cached"] = True
    prev["cache_reason"] = reason[:200]
    print(json.dumps(prev))
    return True


def _acquire_chip_lock(budget_s: int = 2700):
    """Serialize chip users: the detached measurement queue
    (scripts/chipqueue.sh) wraps its non-bench chip items in this flock,
    and the queue's own bench.py run holds it here — so a driver-invoked
    bench waits for the in-flight item instead of sharing the single chip
    (contended timings are garbage).  Proceeds anyway after `budget_s`."""
    import fcntl
    os.makedirs(CACHE_DIR, exist_ok=True)
    fh = open(os.path.join(CACHE_DIR, "chip.lock"), "w")
    t0 = time.perf_counter()
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fh
        except OSError:
            if time.perf_counter() - t0 > budget_s:
                print("chip lock still busy; proceeding (timings may be "
                      "contended)", file=sys.stderr)
                return fh
            time.sleep(15)


def _finish_from_last_result(run_id: str, reason: str) -> int:
    """After a child timeout/crash: publish THIS run's incremental rows if
    any stage completed (flagged partial), else the previous complete
    result (flagged cached)."""
    last = _read_json(LAST_RESULT, None)
    if last is not None and last.get("run_id") == run_id:
        if last.get("partial"):
            last["partial_reason"] = reason[:200]
        print(json.dumps(last))
        return 0
    return 0 if _cached_fallback(reason) else 1


def _tail(path, n=40) -> str:
    try:
        with open(path, errors="replace") as fh:
            return "".join(fh.readlines()[-n:])
    except OSError:
        return ""


def _watchdog_main() -> int:
    """Run the real bench in a child with a hard wall-clock bound, tee'ing
    its output to a log; publish incrementally-written rows on timeout."""
    run_id = f"{int(time.time())}-{os.getpid()}"
    if not _probe_tunnel():
        # emit the flagged fallback IMMEDIATELY instead of hanging for the
        # full budget on a dead tunnel (BENCH_r04 died this way)
        return 0 if _cached_fallback("tunnel probe failed "
                                     "(device unreachable)") else 1
    _lock = _acquire_chip_lock()  # held (open) for the watchdog's lifetime
    env = dict(os.environ)
    env["BLANCZOS_BENCH_INNER"] = "1"
    env["BLANCZOS_BENCH_RUN_ID"] = run_id
    budget = int(os.environ.get("BLANCZOS_BENCH_TIMEOUT", "5400"))
    os.makedirs(RESULT_DIR, exist_ok=True)
    with open(CHILD_LOG, "w") as log:
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=budget, stdout=log,
                               stderr=subprocess.STDOUT)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            sys.stderr.write(_tail(CHILD_LOG))
            return _finish_from_last_result(
                run_id, f"bench exceeded {budget}s (device flaked "
                        f"mid-run?); log tail in {CHILD_LOG}")
    if rc == 0:
        last = _read_json(LAST_RESULT, None)
        if last is not None and last.get("run_id") == run_id:
            print(json.dumps(last))
            return 0
    sys.stderr.write(_tail(CHILD_LOG))
    return _finish_from_last_result(run_id, f"bench failed rc={rc}; "
                                            f"log tail in {CHILD_LOG}")


# ---------------------------------------------------------------------------
# inner bench: one stage per config, publishing after every stage
# ---------------------------------------------------------------------------

def main():
    run_id = os.environ.get("BLANCZOS_BENCH_RUN_ID",
                            f"{int(time.time())}-{os.getpid()}")
    mtx = ensure_matrix()
    from block_lanczos_tpu.utils.mmio import load_mtx
    M = load_mtx(mtx, PRIME)

    d = {"nnz": M.nnz, "n": N_BLOCK, "prime": PRIME}
    result = {"metric": "spmv_nnz_per_s_per_chip", "value": None,
              "unit": "nnz/s", "vs_baseline": None, "partial": True,
              "run_id": run_id, "detail": d}

    def publish():
        _write_json(LAST_RESULT, result)

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"[stage] {name}: done in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        publish()
        return out

    # ---- chip stages (tunnel-dependent), cheapest-compile first --------
    # headline at the reference's benchmark config (n=4): min of two
    # measurements, symmetric with the reference baseline (shared host /
    # tunnel contention inflates both sides)
    ours_per_iter = stage("narrow n=4",
                          lambda: min(per_iter(M, N_BLOCK),
                                      per_iter(M, N_BLOCK)))
    d["our_s_per_iteration"] = round(ours_per_iter, 6)
    d["iterations_per_s"] = round(1.0 / ours_per_iter, 3)
    result["value"] = round(2 * M.nnz / ours_per_iter, 1)  # 2 SpMVs/iter
    publish()

    # production blocking (fewer iterations per solve; PERF.md)
    ours_n32 = stage("narrow n=32", lambda: per_iter(M, 32))
    d["n32_s_per_iteration"] = round(ours_n32, 6)
    d["n32_est_solve_speedup_vs_n4"] = round(
        ours_per_iter * 32 / (ours_n32 * N_BLOCK), 2)

    # bitsliced GF(2) (p=2 factorization config)
    ours_gf2_128 = stage("gf2 n=128", lambda: per_iter_gf2(M, 128))
    d["gf2_n128_s_per_iteration"] = round(ours_gf2_128, 6)
    # n=256 halves the iteration count again for ~1.25x the per-iteration
    # cost — the measured best GF(2) time-to-solution
    ours_gf2_256 = stage("gf2 n=256", lambda: per_iter_gf2(M, 256))
    d["gf2_n256_s_per_iteration"] = round(ours_gf2_256, 6)
    d["gf2_n256_tts_speedup_vs_n128"] = round(
        ours_gf2_128 * 256 / (ours_gf2_256 * 128), 2)

    # wide field p=2^61-1, n=4 (beyond the reference's 2^30-35 cap)
    ours_wide = stage("wide p61 n=4", lambda: per_iter_wide(M, N_BLOCK))
    d["wide_p61_s_per_iteration"] = round(ours_wide, 6)

    # ---- reference baselines (CPU-only; min-records survive in-repo) ---
    ref_per_iter = stage("reference n=4", lambda: bench_reference_seq(mtx))
    if ref_per_iter:
        d["reference_seq_s_per_iteration"] = round(ref_per_iter, 6)
        result["vs_baseline"] = round(ref_per_iter / ours_per_iter, 3)
    # same-config baselines for the production blockings: iterations scale
    # as ncols/n on BOTH sides, so the per-iteration ratio at equal n IS
    # the time-to-solution ratio (VERDICT round 1, weak item 2)
    ref_n32 = stage("reference n=32",
                    lambda: bench_reference_seq(mtx, n=32, iters=5,
                                                repeats=1))
    if ref_n32:
        d["n32_reference_s_per_iteration"] = round(ref_n32, 6)
        d["n32_vs_baseline"] = round(ref_n32 / ours_n32, 3)
    # n=128 costs the reference ~150 s/iteration — 2 iterations bounds the
    # wall clock (~7 min first run; results are cached across bench runs)
    ref_gf2_128 = stage("reference gf2 n=128",
                        lambda: bench_reference_seq(mtx, prime=2, n=128,
                                                    iters=2, repeats=1))
    if ref_gf2_128:
        d["gf2_n128_reference_s_per_iteration"] = round(ref_gf2_128, 6)
        d["gf2_n128_vs_baseline"] = round(ref_gf2_128 / ours_gf2_128, 3)

    # ---- 51M-nnz factorization scale (3M x 2M mod 2): does the n=256 ---
    # TTS win extend to scale now that the program compiles?
    def on_row(n_blk, v, from_cache):
        d[f"gf2_51m_n{n_blk}_s_per_iteration"] = round(v, 6)
        cached = set(d.get("gf2_51m_rows_from_cache", []))
        (cached.add if from_cache else cached.discard)(n_blk)
        d["gf2_51m_rows_from_cache"] = sorted(cached)
        if (d.get("gf2_51m_n128_s_per_iteration")
                and d.get("gf2_51m_n256_s_per_iteration")):
            d["gf2_51m_n256_tts_speedup_vs_n128"] = round(
                d["gf2_51m_n128_s_per_iteration"] * 256
                / (d["gf2_51m_n256_s_per_iteration"] * 128), 2)
        publish()

    try:
        stage("gf2 51M-nnz", lambda: bench_gf2_at_scale(on_row=on_row))
    except Exception as e:                # never lose the headline rows
        print(f"at-scale GF(2) bench failed: {e}", file=sys.stderr)

    result["partial"] = False
    publish()
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BLANCZOS_BENCH_INNER"):
        main()
    else:
        sys.exit(_watchdog_main())
