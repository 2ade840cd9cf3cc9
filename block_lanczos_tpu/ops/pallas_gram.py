"""Pallas TPU kernel for the exact mod-p Gram contraction V^T @ W.

The XLA path (ops/dense.py::gram_mod) scans row chunks and materializes a
(chunk, a, b) Montgomery-product temporary per step.  This kernel fuses the
whole contraction into one pallas_call: the grid walks row blocks, each
step does the Montgomery products and 15-bit-limb accumulation in VMEM
scratch, and the final step recombines mod p — one pass over V and W with
no HBM temporaries.

Exactness argument is the same as the XLA path: products are < p < 2^30,
limbs < 2^15, and the scratch accumulators see at most grid*block rows;
callers must keep total rows <= 2^17 per accumulator window, which
gram_mod_pallas enforces by pre-reducing every ACC_WINDOW grid steps.

This is the demonstration Pallas kernel for the framework (the SpMV's
gather cannot be expressed in Mosaic on this stack — PERF.md); it is
bit-exact with gram_mod at every size.  Honest measurement on the round's
v5e-through-tunnel: 15.4 ms vs XLA's 5.7 ms in-loop at the solver's
(300k, 40)x(300k, 32) shape — XLA's fused scan wins here, so dense.gram_mod
remains the default and this kernel documents the Mosaic recipe (grid
accumulation, VMEM scratch, int32 reductions, periodic mod-p folds) for
hardware where manual control pays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from block_lanczos_tpu.ops import gfp
from block_lanczos_tpu.ops.gfp import GFp, u32

def _block_rows(a: int, b: int) -> int:
    """Row-block size bounded by a ~4MB VMEM budget for the (rows, a, b)
    Montgomery-product temporary (v5e VMEM is 16MB; the hi/lo limb splits
    roughly triple the live set)."""
    budget = (1 << 20) // max(a * b, 1)     # elements
    rows = 1 << max(3, min(11, budget.bit_length() - 1))
    return rows


def _mont_mul_kernel(f: GFp, a, b):
    """gfp.mont_mul inlined for kernel use (pure elementwise uint32 ops)."""
    return gfp.mont_mul(f, a, b)


def gram_mod_pallas(f: GFp, V, W):
    """V^T @ W mod p for (N, a), (N, b) uint32 blocks; bit-exact with
    dense.gram_mod.  N is padded to BLOCK_ROWS internally (zero rows are
    the additive identity)."""
    N, a = V.shape
    b = W.shape[1]
    Wm = gfp.to_mont(f, W)
    block_rows = _block_rows(a, b)
    pad = (-N) % block_rows
    if pad:
        V = jnp.pad(V, ((0, pad), (0, 0)))
        Wm = jnp.pad(Wm, ((0, pad), (0, 0)))
    nblocks = (N + pad) // block_rows
    # limb sums live in int32 scratch: limbs < 2^15, so at most 2^16 rows
    # may accumulate unreduced; fold into a mod-p partial every FOLD blocks
    FOLD = max((1 << 16) // block_rows, 1)

    def kernel(v_ref, w_ref, out_ref, hi_acc, lo_acc, part):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)
            part[:] = jnp.zeros_like(part)

        prod = _mont_mul_kernel(f, v_ref[:][:, :, None],
                                w_ref[:][:, None, :])    # (rows, a, b)
        hi, lo = gfp.limb_split(prod)
        # Mosaic has no unsigned reductions; limbs < 2^15 summed over
        # block_rows <= 2^11 rows stay < 2^26, exact in int32
        hi_acc[:] = hi_acc[:] + jnp.sum(hi.astype(jnp.int32), axis=0)
        lo_acc[:] = lo_acc[:] + jnp.sum(lo.astype(jnp.int32), axis=0)

        last = i == pl.num_programs(0) - 1

        @pl.when((i % FOLD == FOLD - 1) | last)
        def _():
            folded = gfp.limb_combine(f, hi_acc[:].astype(u32),
                                      lo_acc[:].astype(u32))
            part[:] = gfp.modadd(f, part[:], folded)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)

        @pl.when(last)
        def _():
            out_ref[:] = part[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a, b), u32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a, b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((a, b), jnp.int32),
            pltpu.VMEM((a, b), jnp.int32),
            pltpu.VMEM((a, b), u32),
        ],
    )(V, Wm)
