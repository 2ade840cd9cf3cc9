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

CACHE_DIR = "/tmp/blanczos_bench"
MTX = os.path.join(CACHE_DIR, f"bench_{NROWS}x{NCOLS}_d{DENSITY}_s{SEED}.mtx")


def ensure_matrix():
    os.makedirs(CACHE_DIR, exist_ok=True)
    if not os.path.exists(MTX):
        from block_lanczos_tpu.utils.gen import write_random_mtx
        print("generating benchmark matrix ...", file=sys.stderr)
        write_random_mtx(MTX, NROWS, NCOLS, DENSITY, seed=SEED)
    return MTX


def bench_ours(M):
    """Honest per-iteration wall time: result arrays are MATERIALIZED to
    host (np.asarray) before reading the clock — jax.block_until_ready does
    not reliably await execution on tunneled backends (measured returning
    in microseconds with tens of ms of real work still queued)."""
    import jax.numpy as jnp
    import numpy as np

    from block_lanczos_tpu.models.lanczos import BlockLanczos

    def per_iter(n_blk):
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

    def per_iter_gf2(n_blk):
        import numpy as np

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

    def per_iter_wide(n_blk):
        import numpy as np

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

    # headline at the reference's benchmark config (n=4), plus the n=32
    # production config (BASELINE.json config 3), the bitsliced GF(2)
    # factorization configs (n=128 for the vs-reference ratio; n=256 is
    # the measured best time-to-solution), and the wide-field (p=2^61-1)
    # config the reference cannot run at all.  The headline takes the min
    # of two measurements, symmetric with the reference baseline (shared
    # host / tunnel contention inflates both sides).
    return (min(per_iter(N_BLOCK), per_iter(N_BLOCK)), per_iter(32),
            per_iter_gf2(128), per_iter_gf2(256), per_iter_wide(N_BLOCK))


def _gf2_code_fingerprint() -> str:
    """Hash of the sources that determine the GF(2) mesh solver's compute
    path: the at-scale min-record cache is only merged when the code that
    produced it is unchanged, so a perf regression can never hide behind a
    stale faster record (ADVICE r3)."""
    import hashlib
    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "block_lanczos_tpu")
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


def bench_gf2_at_scale():
    """Driver-captured 51M-nnz GF(2) rows (BASELINE config-4 scale): the
    n=256 blocking's ~1.8x TTS win must survive at factorization scale —
    round 2 could not even compile that program (per-bit trace unrolls;
    fixed by the word-level gf2 kernels).  Returns {n: s_per_iteration};
    rows whose published value came from the disk cache rather than this
    run's fresh measurement are listed in the companion set (second
    return value)."""
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
    cache_path = os.path.join(CACHE_DIR, "gf2_at_scale_cache.json")
    fp = _gf2_code_fingerprint()
    try:
        with open(cache_path) as fh:
            raw = json.load(fh)
    except (OSError, ValueError):
        raw = {}
    # legacy flat {n: v} caches carry no fingerprint — treat as stale
    cache = ({int(k): v for k, v in raw.get("rows", {}).items()}
             if raw.get("fingerprint") == fp else {})
    if os.environ.get("BLANCZOS_AT_SCALE_CACHED_ONLY") and cache:
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
    except Exception as e:
        # tunnel drops mid-measurement must not lose the cached rows
        if not out:
            raise
        print(f"at-scale GF(2) partial ({e}); using cached rows",
              file=sys.stderr)
    cache.update(out)
    try:
        with open(cache_path, "w") as fh:
            json.dump({"fingerprint": fp,
                       "rows": {str(k): v for k, v in cache.items()}}, fh)
    except OSError:
        pass
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
    cache_path = os.path.join(build_dir, "ref_cache.json")
    key = f"{os.path.basename(mtx_path)}|p={prime}|n={n}|it={iters}"
    try:
        with open(cache_path) as fh:
            cache = json.load(fh)
    except (OSError, ValueError):
        cache = {}
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
    try:
        with open(cache_path, "w") as fh:
            json.dump(cache, fh)
    except OSError:
        pass
    return result


def _cached_fallback(reason: str) -> bool:
    """Republish the last real measurement, EXPLICITLY flagged as cached.

    The tunneled chip goes down for hours at a time and a dead tunnel
    HANGS dispatch rather than raising — better a flagged stale artifact
    than none.  Returns False when no cached result exists."""
    last_path = os.path.join(CACHE_DIR, "last_result.json")
    try:
        with open(last_path) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
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


def _watchdog_main() -> int:
    """Run the real bench in a child with a hard wall-clock bound; on
    timeout/crash fall back to the flagged cached result."""
    _lock = _acquire_chip_lock()  # held (open) for the watchdog's lifetime
    env = dict(os.environ)
    env["BLANCZOS_BENCH_INNER"] = "1"
    budget = int(os.environ.get("BLANCZOS_BENCH_TIMEOUT", "5400"))
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=budget, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        return 0 if _cached_fallback(f"bench exceeded {budget}s "
                                     "(device unreachable?)") else 1
    sys.stderr.write(r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    if r.returncode == 0 and lines:
        print(lines[-1])
        return 0
    return 0 if _cached_fallback(
        f"bench failed rc={r.returncode}: {lines[-1] if lines else ''}"
    ) else (r.returncode or 1)


def main():
    mtx = ensure_matrix()
    from block_lanczos_tpu.utils.mmio import load_mtx
    M = load_mtx(mtx, PRIME)

    last_path = os.path.join(CACHE_DIR, "last_result.json")
    (ours_per_iter, ours_n32, ours_gf2_128, ours_gf2_256,
     ours_wide) = bench_ours(M)
    nnz_per_s = 2 * M.nnz / ours_per_iter  # two SpMV passes per iteration

    try:
        # 51M-nnz factorization scale; rows published from a prior run's
        # min-record (same code fingerprint) are named in at_scale_cached
        at_scale, at_scale_cached = bench_gf2_at_scale()
    except Exception as e:                # never lose the headline rows
        print(f"at-scale GF(2) bench failed: {e}", file=sys.stderr)
        at_scale, at_scale_cached = {}, set()

    ref_per_iter = bench_reference_seq(mtx)
    vs_baseline = (ref_per_iter / ours_per_iter) if ref_per_iter else None
    # same-config baselines for the production blockings: iterations scale
    # as ncols/n on BOTH sides, so the per-iteration ratio at equal n IS
    # the time-to-solution ratio (VERDICT round 1, weak item 2)
    ref_n32 = bench_reference_seq(mtx, n=32, iters=5, repeats=1)
    # n=128 costs the reference ~150 s/iteration — 2 iterations bounds the
    # wall clock (~7 min first run; results are cached across bench runs)
    ref_gf2_128 = bench_reference_seq(mtx, prime=2, n=128, iters=2,
                                      repeats=1)

    result = {
        "metric": "spmv_nnz_per_s_per_chip",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {
            "nnz": M.nnz,
            "n": N_BLOCK,
            "prime": PRIME,
            "our_s_per_iteration": round(ours_per_iter, 6),
            "reference_seq_s_per_iteration":
                round(ref_per_iter, 6) if ref_per_iter else None,
            "iterations_per_s": round(1.0 / ours_per_iter, 3),
            # production blocking (fewer iterations per solve; PERF.md)
            "n32_s_per_iteration": round(ours_n32, 6),
            "n32_est_solve_speedup_vs_n4":
                round(ours_per_iter * 32 / (ours_n32 * N_BLOCK), 2),
            "n32_reference_s_per_iteration":
                round(ref_n32, 6) if ref_n32 else None,
            "n32_vs_baseline":
                round(ref_n32 / ours_n32, 3) if ref_n32 else None,
            # bitsliced GF(2) (p=2 factorization config), n=128
            "gf2_n128_s_per_iteration": round(ours_gf2_128, 6),
            "gf2_n128_reference_s_per_iteration":
                round(ref_gf2_128, 6) if ref_gf2_128 else None,
            "gf2_n128_vs_baseline":
                round(ref_gf2_128 / ours_gf2_128, 3) if ref_gf2_128 else None,
            # n=256 halves the iteration count again for ~1.25x the
            # per-iteration cost — the measured best GF(2) time-to-solution
            "gf2_n256_s_per_iteration": round(ours_gf2_256, 6),
            "gf2_n256_tts_speedup_vs_n128":
                round(ours_gf2_128 * 256 / (ours_gf2_256 * 128), 2),
            # wide field p=2^61-1, n=4 (beyond the reference's 2^30-35 cap)
            "wide_p61_s_per_iteration": round(ours_wide, 6),
            # 51M-nnz factorization scale (3M x 2M mod 2): does the n=256
            # TTS win extend to scale now that the program compiles?
            "gf2_51m_n128_s_per_iteration":
                round(at_scale[128], 6) if 128 in at_scale else None,
            "gf2_51m_n256_s_per_iteration":
                round(at_scale[256], 6) if 256 in at_scale else None,
            "gf2_51m_n256_tts_speedup_vs_n128":
                (round(at_scale[128] * 256 / (at_scale[256] * 128), 2)
                 if 128 in at_scale and 256 in at_scale else None),
            # rows above whose value is a prior run's min-record (same code
            # fingerprint) rather than this run's fresh measurement
            "gf2_51m_rows_from_cache": sorted(at_scale_cached),
        },
    }
    try:
        with open(last_path, "w") as fh:
            json.dump(result, fh)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BLANCZOS_BENCH_INNER"):
        main()
    else:
        sys.exit(_watchdog_main())
