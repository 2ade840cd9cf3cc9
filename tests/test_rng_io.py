"""Tests for xoshiro256+ exactness and MatrixMarket IO round-trips."""

import numpy as np
import pytest

from block_lanczos_tpu import native
from block_lanczos_tpu.utils import gen, mmio
from block_lanczos_tpu.utils.rng import DEFAULT_SEED, MASK64, Xoshiro256Plus


def xoshiro_oracle(count, prime, seed=DEFAULT_SEED):
    """Independent Python-int transcription of the C reference's generator."""
    s = list(seed)

    def rotl(x, k):
        return ((x << k) | (x >> (64 - k))) & MASK64

    out = []
    for _ in range(count):
        result = (rotl((s[0] + s[3]) & MASK64, 23) + s[0]) & MASK64
        t = (s[1] << 17) & MASK64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = rotl(s[3], 45)
        out.append(result % prime)
    return np.array(out, np.uint32)


@pytest.mark.parametrize("prime", [2, 65537, 1073741789])
def test_xoshiro_python_path(prime):
    g = Xoshiro256Plus()
    got = np.array([g.next64() % prime for _ in range(200)], np.uint32)
    np.testing.assert_array_equal(got, xoshiro_oracle(200, prime))


@pytest.mark.parametrize("prime", [65537, 1073741789])
def test_xoshiro_fill_native_matches_oracle(prime):
    g = Xoshiro256Plus()
    got = g.fill_mod(1000, prime)
    np.testing.assert_array_equal(got, xoshiro_oracle(1000, prime))
    # stream continues across calls with correct state
    got2 = g.fill_mod(100, prime)
    np.testing.assert_array_equal(
        np.concatenate([got, got2]), xoshiro_oracle(1100, prime))


def test_native_lib_builds():
    assert native.get_lib() is not None, "native helper failed to build"


def test_mtx_roundtrip(tmp_path):
    p = 65537
    path = str(tmp_path / "m.mtx")
    gen.write_random_mtx(path, 60, 40, 5, seed=3)
    M = mmio.load_mtx(path, p)
    assert M.nrows == 60 and M.ncols == 40
    assert M.nnz == len(M.i) == len(M.j) == len(M.x)
    assert M.x.dtype == np.uint32 and (M.x < p).all()
    hdr = mmio.read_mtx_header(path)
    assert hdr == (60, 40, M.nnz)


def test_mtx_negative_values_reference_semantics(tmp_path):
    """Negative entries go through uint32 two's complement then % p."""
    p = 1073741789
    path = str(tmp_path / "neg.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write("2 2 3\n")
        f.write("1 1 -5\n1 2 7\n2 2 -1\n")
    M = mmio.load_mtx(path, p)
    want = [( (1 << 32) - 5) % p, 7, ((1 << 32) - 1) % p]
    np.testing.assert_array_equal(M.x, np.array(want, np.uint32))


def test_mtx_python_fallback_matches_native(tmp_path, monkeypatch):
    p = 1073741789
    path = str(tmp_path / "m.mtx")
    gen.write_random_mtx(path, 50, 30, 4, seed=9)
    M1 = mmio.load_mtx(path, p)
    monkeypatch.setattr(native, "parse_triplets_mod", lambda *a, **k: None)
    M2 = mmio.load_mtx(path, p)
    np.testing.assert_array_equal(M1.i, M2.i)
    np.testing.assert_array_equal(M1.j, M2.j)
    np.testing.assert_array_equal(M1.x, M2.x)


def test_kernel_block_roundtrip(tmp_path):
    path = str(tmp_path / "k.mtx")
    v = np.arange(24, dtype=np.uint32).reshape(6, 4)
    mmio.write_kernel_mtx(path, v, 6, 4)
    nr, nc, data = mmio.read_array_mtx(path)
    assert (nr, nc) == (6, 4)
    np.testing.assert_array_equal(data, v.astype(np.int64))


def test_stream_triplets(tmp_path):
    p = 65537
    path = str(tmp_path / "m.mtx")
    gen.write_random_mtx(path, 80, 50, 6, seed=5)
    M = mmio.load_mtx(path, p)
    ii, jj, xx = [], [], []
    for a, b, c in mmio.iter_mtx_triplets(path, chunk=7):
        ii.append(a); jj.append(b); xx.append(c)
    np.testing.assert_array_equal(np.concatenate(ii), M.i.astype(np.int64))
    np.testing.assert_array_equal(np.concatenate(jj), M.j.astype(np.int64))
    np.testing.assert_array_equal(
        np.concatenate(xx).astype(np.uint64) % p, M.x.astype(np.uint64))


def test_coo_to_csr_native():
    rng = np.random.default_rng(0)
    nnz, nrows = 5000, 300
    mi = rng.integers(0, nrows, nnz).astype(np.int32)
    mj = rng.integers(0, 200, nnz).astype(np.int32)
    mx = rng.integers(0, 1 << 30, nnz).astype(np.uint32)
    out = native.coo_to_csr(nrows, mi, mj, mx)
    assert out is not None
    rowptr, cols, vals = out
    assert rowptr[0] == 0 and rowptr[-1] == nnz
    order = np.argsort(mi, kind="stable")
    np.testing.assert_array_equal(cols, mj[order])
    np.testing.assert_array_equal(vals, mx[order])
    counts = np.bincount(mi, minlength=nrows)
    np.testing.assert_array_equal(np.diff(rowptr), counts)
