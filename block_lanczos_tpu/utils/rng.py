"""xoshiro256+ PRNG — bit-exact reproduction of the reference's generator.

The reference seeds one global xoshiro256+ with a fixed seed and draws
`random64() % prime` row-major over the initial vector block
(reference: sequential/lanczos_modp.c:67-87 and :624-625).  Matching that
stream exactly is the anchor for bit-identical iterates across the whole
solve, so this implementation is tested word-for-word against the C
semantics.  Large fills go through the native C helper; the Python-int
fallback is exact but slower.
"""

from __future__ import annotations

import numpy as np

from block_lanczos_tpu import native

MASK64 = (1 << 64) - 1

# The reference's fixed seed ("this is bad" — but it is the reproducibility
# anchor; reference: sequential/lanczos_modp.c:67).
DEFAULT_SEED = (0x1415926535, 0x8979323846, 0x2643383279, 0x5028841971)


class Xoshiro256Plus:
    def __init__(self, seed=DEFAULT_SEED):
        self.state = np.array(seed, dtype=np.uint64)

    def _next_py(self) -> int:
        s = [int(v) for v in self.state]
        result = (self._rotl((s[0] + s[3]) & MASK64, 23) + s[0]) & MASK64
        t = (s[1] << 17) & MASK64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = self._rotl(s[3], 45)
        self.state = np.array(s, dtype=np.uint64)
        return result

    @staticmethod
    def _rotl(x: int, k: int) -> int:
        return ((x << k) | (x >> (64 - k))) & MASK64

    def next64(self) -> int:
        return self._next_py()

    def fill_mod(self, count: int, prime: int) -> np.ndarray:
        """Draw `count` values of random64() % prime as uint32."""
        out = native.xoshiro_fill_mod(self.state, prime, count)
        if out is not None:
            return out  # state was advanced in place by the C code
        out = np.empty(count, np.uint32)
        for k in range(count):
            out[k] = self._next_py() % prime
        return out

    def fill_mod64(self, count: int, prime: int) -> np.ndarray:
        """Same stream, uint64 output — for wide primes (p < 2^62)."""
        out = native.xoshiro_fill_mod64(self.state, prime, count)
        if out is not None:
            return out
        out = np.empty(count, np.uint64)
        for k in range(count):
            out[k] = self._next_py() % prime
        return out
