"""Property tests: wide-field (p < 2^62) arithmetic vs Python-int oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from block_lanczos_tpu.ops import gfp_wide as gw
from block_lanczos_tpu.ops.gfp_wide import GFpWide

# 2^61 - 1 is a Mersenne prime; the middle one is a random 55-bit prime;
# the small one checks the narrow end keeps working through the wide path.
WIDE_PRIMES = [(1 << 61) - 1, 23384026197294446691, 1073741789, 65537]
WIDE_PRIMES[1] = 36028797018963913  # 2^55 + 73 (prime)


def rand_vals(rng, p, shape):
    """Uniform values in [0, p) as object ints."""
    lo = rng.integers(0, 1 << 32, size=shape).astype(object)
    hi = rng.integers(0, 1 << 32, size=shape).astype(object)
    return ((hi << 32) | lo) % p


@pytest.mark.parametrize("p", WIDE_PRIMES)
def test_add_sub_neg(p):
    f = GFpWide.make(p)
    rng = np.random.default_rng(0)
    a = rand_vals(rng, p, (257,))
    b = rand_vals(rng, p, (257,))
    ad, bd = jnp.asarray(gw.np_pair(a)), jnp.asarray(gw.np_pair(b))
    assert (gw.np_unpair(np.asarray(gw.modadd(f, ad, bd))) == (a + b) % p).all()
    assert (gw.np_unpair(np.asarray(gw.modsub(f, ad, bd))) == (a - b) % p).all()
    assert (gw.np_unpair(np.asarray(gw.modneg(f, ad))) == (-a) % p).all()


@pytest.mark.parametrize("p", WIDE_PRIMES)
def test_mont_mul(p):
    f = GFpWide.make(p)
    rng = np.random.default_rng(1)
    a = rand_vals(rng, p, (511,))
    b = rand_vals(rng, p, (511,))
    am = (a << 64) % p  # host to_mont
    ad = jnp.asarray(gw.np_pair(am))
    bd = jnp.asarray(gw.np_pair(b))
    # mont_mul(aR, b) == a*b mod p
    got = gw.np_unpair(np.asarray(gw.mont_mul(f, ad, bd)))
    assert (got == (a * b) % p).all()


@pytest.mark.parametrize("p", WIDE_PRIMES)
def test_mont_roundtrip_and_modmul(p):
    f = GFpWide.make(p)
    rng = np.random.default_rng(2)
    a = rand_vals(rng, p, (129,))
    ad = jnp.asarray(gw.np_pair(a))
    rt = gw.np_unpair(np.asarray(gw.from_mont(f, gw.to_mont(f, ad))))
    assert (rt == a).all()
    b = rand_vals(rng, p, (129,))
    bd = jnp.asarray(gw.np_pair(b))
    got = gw.np_unpair(np.asarray(gw.modmul(f, ad, bd)))
    assert (got == (a * b) % p).all()


@pytest.mark.parametrize("p", WIDE_PRIMES)
def test_modinv_device(p):
    f = GFpWide.make(p)
    rng = np.random.default_rng(3)
    a = rand_vals(rng, p, (65,))
    a[a == 0] = 1
    ad = jnp.asarray(gw.np_pair(a))
    inv = gw.np_unpair(np.asarray(gw.modinv_device(f, ad)))
    assert ((inv * a) % p == 1).all()


@pytest.mark.parametrize("p", WIDE_PRIMES)
def test_limb_split_combine_sum(p):
    f = GFpWide.make(p)
    rng = np.random.default_rng(4)
    a = rand_vals(rng, p, (1000, 3))
    ad = jnp.asarray(gw.np_pair(a))
    limbs = np.asarray(gw.limb_split(ad))
    recon = sum(limbs[..., k].astype(object) << (15 * k) for k in range(5))
    assert (recon == a).all()
    s = gw.np_unpair(np.asarray(gw.sum_mod(f, ad, axis=0)))
    assert (s == a.sum(axis=0) % p).all()


def test_sum_mod_long_chunked():
    p = (1 << 61) - 1
    f = GFpWide.make(p)
    rng = np.random.default_rng(5)
    n = (1 << 17) + 1234  # force the chunked path
    a = rand_vals(rng, p, (n,))
    ad = jnp.asarray(gw.np_pair(a))
    s = gw.np_unpair(np.asarray(gw.sum_mod(f, ad, axis=0)))
    assert s == int(a.sum() % p)


def test_cap_and_validation():
    with pytest.raises(ValueError):
        GFpWide.make(1 << 63)
    with pytest.raises(ValueError):
        GFpWide.make(4)  # even
    f = GFpWide.make((1 << 61) - 1)
    assert f.from_mont_int(f.to_mont_int(12345)) == 12345
