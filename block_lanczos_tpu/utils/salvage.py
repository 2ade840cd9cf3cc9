"""Salvage kernel vectors from a partially-converged Lanczos block.

Block Lanczos can terminate with `v^T M != 0` — over GF(2) especially,
where self-orthogonality makes partial convergence common.  The reference
just prints "KO" and gives up (sequential/lanczos_modp.c:560-582).  But the
final block usually still CONTAINS kernel vectors: any combination
`c in F_p^n` with `(v^T M) c = 0` gives `(v c)^T M = c^T (v^T M)^T = 0`,
i.e. `v @ C` is a block of true kernel vectors for any nullspace basis C
of the (m x n) matrix `vtM`.

Finding that nullspace exactly without reducing all m rows: sample a few
rows, take the nullspace of the small sample (superset of the true
nullspace), verify candidates against the FULL vtM exactly, and fold any
violating rows back into the sample until all candidates verify — each
round strictly shrinks the candidate space, so it terminates in <= n
rounds.

All arithmetic is exact host NumPy: products of residues < 2^30 split the
coefficient into 15-bit limbs so u64 accumulation over n <= 128 terms
cannot overflow; wide residues use Python ints.
"""

from __future__ import annotations

import numpy as np


def _nullspace_small(p: int, R: np.ndarray) -> np.ndarray:
    """Exact nullspace basis of a small (k x n) matrix mod p -> (n, dim)."""
    R = R.astype(object) % p
    k, n = R.shape
    R = R.copy()
    pivots = []  # (row, col)
    row = 0
    for col in range(n):
        piv = None
        for r in range(row, k):
            if R[r, col] % p != 0:
                piv = r
                break
        if piv is None:
            continue
        R[[row, piv]] = R[[piv, row]]
        inv = pow(int(R[row, col]), p - 2, p)
        R[row] = (R[row] * inv) % p
        for r in range(k):
            if r != row and R[r, col] % p != 0:
                R[r] = (R[r] - R[r, col] * R[row]) % p
        pivots.append((row, col))
        row += 1
        if row == k:
            break
    pivot_cols = {c for _, c in pivots}
    free_cols = [c for c in range(n) if c not in pivot_cols]
    basis = np.zeros((n, len(free_cols)), dtype=object)
    for bi, fc in enumerate(free_cols):
        basis[fc, bi] = 1
        for (r, c) in pivots:
            basis[c, bi] = (-R[r, fc]) % p
    return basis


def _matmul_exact(p: int, A: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(m, n) @ (n, k) mod p, exact.  u64 limb path for p < 2^30."""
    if p < (1 << 30):
        A64 = A.astype(np.uint64)
        C64 = C.astype(object) % p
        C64 = np.array(C64, dtype=np.uint64)
        hi, lo = C64 >> 15, C64 & np.uint64(0x7FFF)
        # products < 2^30 * 2^15 = 2^45; sums over n <= 2^18 terms fit u64
        out = ((A64 @ hi) % p * ((1 << 15) % p) + (A64 @ lo) % p) % p
        return out.astype(object)
    Ao = A.astype(object)
    Co = C.astype(object) % p
    return (Ao @ Co) % p


def salvage_kernel(kernel: np.ndarray, vtM: np.ndarray, p: int,
                   max_rounds: int | None = None):
    """Extract true kernel vectors from a partially-converged block.

    kernel: (N, n) final block v; vtM: (m, n) = v^T M (the solver's last
    `tmp`).  Returns (N, k) with k >= 0 columns, each verified to satisfy
    column^T M == 0 exactly; k == n means the block already converged.
    """
    kernel = np.asarray(kernel)
    vtM = np.asarray(vtM)
    m, n = vtM.shape
    rng = np.random.default_rng(0)
    take = min(m, 2 * n)
    sample_idx = list(rng.choice(m, size=take, replace=False)) if m else []
    rounds = max_rounds if max_rounds is not None else n + 1
    C = None
    for _ in range(rounds):
        R = vtM[sample_idx] if sample_idx else np.zeros((1, n), vtM.dtype)
        C = _nullspace_small(p, R)
        if C.shape[1] == 0:
            return np.zeros((kernel.shape[0], 0), kernel.dtype)
        resid = _matmul_exact(p, vtM, C)       # (m, k)
        bad_rows = np.nonzero((resid != 0).any(axis=1))[0]
        if len(bad_rows) == 0:
            break
        sample_idx.extend(bad_rows[:2 * n].tolist())
    else:
        # keep only the columns that fully verify
        resid = _matmul_exact(p, vtM, C)
        good = np.nonzero(~(resid != 0).any(axis=0))[0]
        C = C[:, good]
        if C.shape[1] == 0:
            return np.zeros((kernel.shape[0], 0), kernel.dtype)

    out = _matmul_exact(p, kernel, C)          # (N, k)
    # drop all-zero columns (v @ c == 0 is a trivial kernel vector)
    nz = np.nonzero((out != 0).any(axis=0))[0]
    out = out[:, nz]
    return np.array(out, dtype=kernel.dtype if p < (1 << 32) else np.uint64)
