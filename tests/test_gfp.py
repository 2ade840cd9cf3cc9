"""Property tests for the exact GF(p) primitives vs Python-int oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from block_lanczos_tpu.ops import gfp
from block_lanczos_tpu.ops.gfp import GFp

PRIMES = [2, 3, 65537, 1073741789, 0x3FFFFFDD]  # incl. reference bench prime & cap


def rand_residues(rng, p, shape):
    return rng.integers(0, p, size=shape, dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("p", PRIMES)
def test_mulhi32(rng, p):
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(gfp.mulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_addsub_neg(rng, p):
    f = GFp.make(p)
    a = rand_residues(rng, p, 512)
    b = rand_residues(rng, p, 512)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(gfp.modadd(f, ja, jb)),
        ((a.astype(np.uint64) + b) % p).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(gfp.modsub(f, ja, jb)),
        ((a.astype(np.int64) - b.astype(np.int64)) % p).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(gfp.modneg(f, ja)),
        ((-a.astype(np.int64)) % p).astype(np.uint32))


@pytest.mark.parametrize("p", PRIMES)
def test_mont_roundtrip_and_mul(rng, p):
    f = GFp.make(p)
    a = rand_residues(rng, p, 512)
    b = rand_residues(rng, p, 512)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    # to/from Montgomery round-trips
    np.testing.assert_array_equal(
        np.asarray(gfp.from_mont(f, gfp.to_mont(f, ja))), a)
    # plain modular product
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) % p).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(gfp.modmul(f, ja, jb)), want)
    # mont_mul with one pre-converted operand == plain product
    got = gfp.mont_mul(f, ja, gfp.to_mont(f, jb))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("p", [3, 65537, 1073741789])
def test_modinv_device(rng, p):
    f = GFp.make(p)
    a = rand_residues(rng, p, 257)
    a[a == 0] = 1
    inv = np.asarray(gfp.modinv_device(f, jnp.asarray(a)))
    np.testing.assert_array_equal(
        (a.astype(np.uint64) * inv.astype(np.uint64)) % p,
        np.ones_like(a, np.uint64))
    for x, i in zip(a[:16].tolist(), inv[:16].tolist()):
        assert i == f.invmod(x)


@pytest.mark.parametrize("p", PRIMES)
@pytest.mark.parametrize("n", [1, 7, 1000, (1 << 17) + 3])
def test_sum_mod(rng, p, n):
    f = GFp.make(p)
    x = rand_residues(rng, p, n)
    got = int(gfp.sum_mod(f, jnp.asarray(x), axis=0))
    assert got == int(x.astype(object).sum() % p)


@pytest.mark.parametrize("p", [2, 65537, 1073741789])
def test_sum_mod_axis(rng, p):
    f = GFp.make(p)
    x = rand_residues(rng, p, (33, 17))
    got = np.asarray(gfp.sum_mod(f, jnp.asarray(x), axis=1))
    want = (x.astype(object).sum(axis=1) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [2, 3, 1073741789])
def test_segment_sum_mod(rng, p):
    f = GFp.make(p)
    x = rand_residues(rng, p, 5000)
    ids = np.sort(rng.integers(0, 37, size=5000)).astype(np.int32)
    got = np.asarray(gfp.segment_sum_mod(f, jnp.asarray(x), jnp.asarray(ids), 37))
    want = np.zeros(37, object)
    for v, i in zip(x.tolist(), ids.tolist()):
        want[i] = (want[i] + v) % p
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_prime_cap():
    with pytest.raises(ValueError):
        GFp.make(0x3FFFFFDD + 2)
    with pytest.raises(ValueError):
        GFp.make(4)


@pytest.mark.parametrize("p", [65537, 1073741789])
def test_jit_and_grad_free(rng, p):
    """Ops must be jittable with the GFp context closed over statically."""
    f = GFp.make(p)
    fn = jax.jit(lambda a, b: gfp.modmul(f, a, b))
    a = rand_residues(rng, p, 64)
    b = rand_residues(rng, p, 64)
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) % p).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(fn(jnp.asarray(a), jnp.asarray(b))), want)
