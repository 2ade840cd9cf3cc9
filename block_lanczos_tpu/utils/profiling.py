"""Profiling / observability helpers.

The reference's performance story is offline gprof/perf (SURVEY.md section 5,
"Tracing / profiling: none in-code") plus the verbosity engine's s/iter.
Here profiling is first-class:

  * `phase_timers(solver)` — per-phase wall times (SpMV / Gram /
    semi-inverse / orthogonalize) measured with real device sync, plus
    derived nnz/s — the TPU analogue of the reference's 62/24/14% hotspot
    split (BASELINE.md).
  * `trace(path)` — context manager around jax.profiler for XLA-level
    traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

from block_lanczos_tpu.ops import dense, spmm
from block_lanczos_tpu.ops.semi_inverse import semi_inverse_device


@contextlib.contextmanager
def trace(path: str):
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _materialize(out):
    """Force execution by pulling results to host.  On tunneled backends
    jax.block_until_ready can return with work still queued; np.asarray
    cannot."""
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    return out


def _timed(fn, *args, iters: int = 5):
    out = _materialize(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _materialize(out)
    return (time.perf_counter() - t0) / iters, out


def phase_timers(solver, iters: int = 5) -> dict:
    """Per-phase timings for a BlockLanczos solver instance."""
    f = solver.f
    v = solver.initial_block()

    # ops passed as pytree args (closed-over arrays become executable
    # constants that get re-materialized per call — see models/lanczos.py)
    spmv1 = jax.jit(lambda op, v: spmm.apply_op(
        f, op, v, out_rows=solver.mp_rows))
    t_spmv1, tmp = _timed(spmv1, solver.first_op, v, iters=iters)
    spmv2 = jax.jit(lambda op, t: spmm.apply_op(
        f, op, t, out_rows=solver.np_rows))
    t_spmv2, Av = _timed(spmv2, solver.second_op, tmp, iters=iters)
    gram = jax.jit(lambda a, b: dense.gram_mod(f, a, b))
    t_gram, vtAv = _timed(gram, v, Av, iters=iters)
    semi = jax.jit(lambda u: semi_inverse_device(f, u))
    t_semi, (winv, d, npiv) = _timed(semi, vtAv, iters=iters)
    from block_lanczos_tpu.models.lanczos import orthogonalize_device
    orth = jax.jit(lambda v, Av, p, d, u, w: orthogonalize_device(
        f, v, Av, p, d, u, u, w))
    p_blk = jnp.zeros_like(v)
    t_orth, _ = _timed(orth, v, Av, p_blk, d, vtAv, winv, iters=iters)

    nnz = solver.sp.nnz if hasattr(solver, "sp") else None
    total = t_spmv1 + t_spmv2 + t_gram + t_semi + t_orth
    report = {
        "spmv_first_s": t_spmv1,
        "spmv_second_s": t_spmv2,
        "gram_s": t_gram,
        "semi_inverse_s": t_semi,
        "orthogonalize_s": t_orth,
        "total_s": total,
        "spmv_share": (t_spmv1 + t_spmv2) / total,
    }
    if nnz:
        report["spmv_nnz_per_s"] = 2 * nnz / (t_spmv1 + t_spmv2)
    return report
