"""MatrixMarket IO — the reference's mmio layer rebuilt for this framework.

Supports exactly what the reference supports (reference: sequential/mmio.c:28-171
and sequential/lanczos_modp.c:199-263): sparse "coordinate integer general"
matrices for input, dense "array integer general" blocks for kernel output.
Coefficients are reduced mod p at load time, with the reference's exact
semantics for negative entries (cast through uint32, then % p).

Fast path: the whole file is read into memory and triplets parsed by the
native C helper; fallback is a NumPy split-based parser (exact, slower).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from block_lanczos_tpu import native


@dataclasses.dataclass
class COOMatrix:
    """Triplet storage, 0-based indices, coefficients already reduced mod p."""
    nrows: int
    ncols: int
    nnz: int
    i: np.ndarray   # int32
    j: np.ndarray   # int32
    x: np.ndarray   # uint32, in [0, p)
    prime: int


def _read_banner_and_size(f):
    """Parse the %%MatrixMarket banner + size line from an open binary file.

    Returns (object, format, field, symmetry, size_fields, data_offset).
    """
    banner = f.readline().decode("ascii", "replace")
    if not banner.startswith("%%MatrixMarket"):
        raise ValueError("Could not process Matrix Market banner")
    parts = banner.strip().split()
    if len(parts) < 5:
        raise ValueError("Could not process Matrix Market banner")
    mm_object, mm_format, mm_field, mm_symmetry = [p.lower() for p in parts[1:5]]
    while True:
        pos = f.tell()
        line = f.readline()
        if not line:
            raise ValueError("Cannot read matrix size")
        s = line.decode("ascii", "replace").strip()
        if s and not s.startswith("%"):
            size_fields = s.split()
            return mm_object, mm_format, mm_field, mm_symmetry, size_fields, f.tell(), pos


def read_mtx_header(path: str):
    """Header-only read: (nrows, ncols, nnz) of a sparse integer matrix."""
    with open(path, "rb") as f:
        obj, fmt, field, sym, size, _, _ = _read_banner_and_size(f)
    _validate_sparse(obj, fmt, field, sym)
    nrows, ncols, nnz = int(size[0]), int(size[1]), int(size[2])
    return nrows, ncols, nnz


def _validate_sparse(obj, fmt, field, sym):
    if obj != "matrix" or fmt != "coordinate":
        raise ValueError(
            f"Matrix Market type [{obj} {fmt}] not supported "
            "(only sparse matrices are OK)")
    if sym != "general" or field != "integer":
        raise ValueError(
            f"Matrix type [{field} {sym}] not supported "
            "(only integer general are OK)")


def _validate_indices(mi: np.ndarray, mj: np.ndarray, nrows: int, ncols: int):
    """Range-check parsed 0-based indices before any layout build touches them.

    The native coo_to_csr writes through rowptr[i+1] / cols[dst] without bounds
    checks, so a malformed file with ids outside [1, nrows] x [1, ncols] must be
    rejected here (and an id of 0 would otherwise wrap to -1 silently in the
    NumPy fallback paths).
    """
    if mi.size == 0:
        return
    bad_i = (mi < 0) | (mi >= nrows)
    if bad_i.any():
        k = int(np.argmax(bad_i))
        raise ValueError(
            f"matrix entry {k + 1}: row index {int(mi[k]) + 1} outside "
            f"[1, {nrows}]")
    bad_j = (mj < 0) | (mj >= ncols)
    if bad_j.any():
        k = int(np.argmax(bad_j))
        raise ValueError(
            f"matrix entry {k + 1}: column index {int(mj[k]) + 1} outside "
            f"[1, {ncols}]")


def load_mtx(path: str, prime: int, verbose: bool = False) -> COOMatrix:
    """Load a sparse MatrixMarket file as COO, coefficients reduced mod prime."""
    if verbose:
        print(f"Loading matrix from {path}", flush=True)
    with open(path, "rb") as f:
        obj, fmt, field, sym, size, offset, _ = _read_banner_and_size(f)
        _validate_sparse(obj, fmt, field, sym)
        nrows, ncols, nnz = int(size[0]), int(size[1]), int(size[2])
        if verbose:
            print(f"  - [{field} {sym}] {nrows} x {ncols} with {nnz} nz",
                  flush=True)
        buf = f.read()

    if prime > 0x3FFFFFDD:  # wide prime: uint64 coefficients
        parsed = native.parse_triplets_mod64(buf, nnz, prime)
        if parsed is not None:
            mi, mj, mx = parsed
        else:
            toks = buf.split()
            if len(toks) < 3 * nnz:
                raise ValueError(f"parse error: expected {nnz} triplets, "
                                 f"found {len(toks)//3}")
            arr = np.array(toks[:3 * nnz], dtype=np.int64).reshape(nnz, 3)
            # validate on the int64 values BEFORE the int32 narrowing —
            # ids >= 2^31+1 would otherwise wrap back into range silently
            _validate_indices(arr[:, 0] - 1, arr[:, 1] - 1, nrows, ncols)
            mi = (arr[:, 0] - 1).astype(np.int32)
            mj = (arr[:, 1] - 1).astype(np.int32)
            # mathematical v mod p (int64 % positive -> non-negative)
            mx = (arr[:, 2] % np.int64(prime)).astype(np.uint64)
        _validate_indices(mi, mj, nrows, ncols)
        return COOMatrix(nrows=nrows, ncols=ncols, nnz=nnz,
                         i=mi, j=mj, x=mx, prime=int(prime))

    parsed = None
    try:
        parsed = native.parse_triplets_mod(buf, nnz, prime)
    except ValueError:
        raise
    if parsed is not None:
        mi, mj, mx = parsed
    else:
        toks = buf.split()
        if len(toks) < 3 * nnz:
            raise ValueError(
                f"parse error: expected {nnz} triplets, found {len(toks)//3}")
        arr = np.array(toks[:3 * nnz], dtype=np.int64).reshape(nnz, 3)
        # validate on the int64 values BEFORE the int32 narrowing —
        # ids >= 2^31+1 would otherwise wrap back into range silently
        _validate_indices(arr[:, 0] - 1, arr[:, 1] - 1, nrows, ncols)
        mi = (arr[:, 0] - 1).astype(np.int32)
        mj = (arr[:, 1] - 1).astype(np.int32)
        # reference semantics: value scanned into u32 (two's complement for
        # negatives), then reduced mod p as a u64
        mx = ((arr[:, 2].astype(np.int64).astype(np.uint32)).astype(np.uint64)
              % np.uint64(prime)).astype(np.uint32)
    _validate_indices(mi, mj, nrows, ncols)
    return COOMatrix(nrows=nrows, ncols=ncols, nnz=nnz,
                     i=mi, j=mj, x=mx, prime=int(prime))


def iter_mtx_triplets(path: str, chunk: int = 1 << 20):
    """Stream (i, j, raw_value) triplet chunks without materializing the matrix.

    Used by the independent checker (reference: sequential/checker_modp.c:163-196
    streams the product from disk).  Yields int64 arrays (i, j, x) with 1-based
    indices already shifted to 0-based; values are raw (not reduced).
    """
    with open(path, "rb") as f:
        obj, fmt, field, sym, size, _, _ = _read_banner_and_size(f)
        _validate_sparse(obj, fmt, field, sym)
        nrows, ncols, nnz = int(size[0]), int(size[1]), int(size[2])
        remaining = nnz
        pending: list = []   # whole tokens not yet consumed
        tail = b""           # possibly-partial trailing token bytes
        at_eof = False
        while remaining > 0:
            # Yields are capped at `chunk` triplets: downstream
            # overflow-safety arguments (checker accumulators) are stated
            # in terms of the chunk size, and a 32-byte/triplet read can
            # tokenize to far more than `chunk` triplets on short-token
            # files.  Surplus tokens stay in `pending` (no byte re-joining
            # — re-splitting them each round would go quadratic).
            need = 3 * min(remaining, chunk)
            while len(pending) < need and not at_eof:
                block = f.read(32 * chunk)
                if not block:
                    at_eof = True
                    if tail.strip():
                        pending.extend(tail.split())
                    tail = b""
                    break
                data = tail + block
                # keep a partial trailing token for the next round
                cut = max(data.rfind(b"\n"), data.rfind(b" "),
                          data.rfind(b"\t"))
                if cut <= 0:
                    tail = data
                    continue
                head, tail = data[:cut], data[cut:]
                pending.extend(head.split())
            take = min(remaining, chunk, len(pending) // 3)
            if take == 0:
                raise ValueError("unexpected EOF while streaming triplets")
            arr = np.array(pending[:3 * take],
                           dtype=np.int64).reshape(take, 3)
            del pending[:3 * take]
            yield arr[:, 0] - 1, arr[:, 1] - 1, arr[:, 2]
            remaining -= take
        # nnz == 0 files yield nothing


def write_kernel_mtx(path: str, v: np.ndarray, nrows: int, n: int,
                     comment: str = "block of left-kernel vector computed by lanczos_modp"):
    """Write the kernel block in MatrixMarket array format, column-major.

    Layout matches the reference exactly (sequential/lanczos_modp.c:673-686):
    v is the row-major (nrows x n) block, emitted one entry per line, j-outer.
    """
    v = np.asarray(v).reshape(-1)
    block = v[:nrows * n].reshape(nrows, n)
    col_major = np.ascontiguousarray(block.T).reshape(-1)
    with open(path, "wb") as f:
        f.write(b"%%MatrixMarket matrix array integer general\n")
        f.write(f"%{comment}\n".encode())
        f.write(f"{nrows} {n}\n".encode())
        # column-major emission; native formatter is ~6x np.savetxt
        data = native.format_u64_lines(col_major.astype(np.uint64))
        if data is not None:
            f.write(data)
        else:
            np.savetxt(f, col_major.reshape(-1, 1), fmt="%d")


def read_array_mtx(path: str):
    """Read a dense MatrixMarket array integer file (column-major).

    Returns (nrows, ncols, data) where data is the row-major (nrows x ncols)
    int64 array.  Used by the checker to load kernel blocks.
    """
    with open(path, "rb") as f:
        obj, fmt, field, sym, size, _, _ = _read_banner_and_size(f)
        if obj != "matrix" or fmt != "array":
            raise ValueError(
                f"Matrix Market type [{obj} {fmt}] not supported "
                "(only dense matrices are OK)")
        if sym != "general" or field != "integer":
            raise ValueError(
                f"Matrix type [{field} {sym}] not supported "
                "(only integer general are OK)")
        nrows, ncols = int(size[0]), int(size[1])
        vals = np.array(f.read().split(), dtype=np.int64)
    if vals.size != nrows * ncols:
        raise ValueError("dense matrix file has wrong number of entries")
    return nrows, ncols, vals.reshape(ncols, nrows).T.copy()


def write_coo_mtx(path: str, nrows: int, ncols: int, i, j, x,
                  comment: str = "generated by block_lanczos_tpu"):
    """Write a sparse integer general matrix (1-based output indices)."""
    i = np.asarray(i, np.int64) + 1
    j = np.asarray(j, np.int64) + 1
    x = np.asarray(x, np.int64)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"%{comment}\n")
        f.write(f"{nrows} {ncols} {len(x)}\n")
        np.savetxt(f, np.stack([i, j, x], axis=1), fmt="%d")
