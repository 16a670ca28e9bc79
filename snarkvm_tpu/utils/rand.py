"""Deterministic test RNG (utilities/src/rand.rs:41 analog).

The reference's `TestRng` wraps `XorShiftRng` (rand_xorshift 0.3) and
prints its seed so failures are reproducible. This is a test-only
utility — nothing consensus-critical derives from it (consensus
randomness is ChaCha20, utils/chacha.py).

`seed_from_u64` reproduces rand_core 0.6's default `SeedableRng::
seed_from_u64` (a PCG32 output stream filling the 16-byte seed), so a
Rust `XorShiftRng::seed_from_u64(s)` and this class emit identical
streams for the same `s`.
"""
from __future__ import annotations

import random as _pyrandom

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _pcg_fill(state: int, nbytes: int) -> bytes:
    """rand_core SeedableRng::seed_from_u64 seed expansion (PCG32)."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    out = bytearray()
    while len(out) < nbytes:
        state = (state * MUL + INC) & _M64
        xorshifted = (((state >> 18) ^ state) >> 27) & _M32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & _M32
        out += x.to_bytes(4, "little")
    return bytes(out[:nbytes])


class XorShiftRng:
    """xorshift128 (rand_xorshift 0.3 semantics, u32 lanes)."""

    def __init__(self, x: int, y: int, z: int, w: int):
        if not (x | y | z | w):
            raise ValueError("XorShiftRng seed must be non-zero")
        self.x, self.y, self.z, self.w = x & _M32, y & _M32, z & _M32, w & _M32

    @classmethod
    def from_seed(cls, seed: bytes) -> "XorShiftRng":
        assert len(seed) == 16
        vals = [int.from_bytes(seed[i:i + 4], "little") for i in range(0, 16, 4)]
        return cls(*vals)

    @classmethod
    def seed_from_u64(cls, state: int) -> "XorShiftRng":
        return cls.from_seed(_pcg_fill(state & _M64, 16))

    def next_u32(self) -> int:
        x = self.x
        t = (x ^ (x << 11)) & _M32
        self.x, self.y, self.z = self.y, self.z, self.w
        w = self.w
        self.w = (w ^ (w >> 19) ^ (t ^ (t >> 8))) & _M32
        return self.w

    def next_u64(self) -> int:
        lo = self.next_u32()
        return lo | (self.next_u32() << 32)

    def next_bytes(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            out += self.next_u32().to_bytes(4, "little")
        return bytes(out[:n])

    # rand 0.8 Standard-distribution helpers (mirror chacha.ChaCha20Rng)
    def gen_bool(self) -> bool:
        return self.next_u32() >> 31 == 1

    def gen_uint(self, bits: int) -> int:
        if bits <= 32:
            return self.next_u32() & ((1 << bits) - 1)
        if bits == 64:
            return self.next_u64()
        return self.next_u64() | (self.next_u64() << 64)

    def gen_range(self, n: int) -> int:
        """Uniform [0, n) via 64-bit widening-multiply rejection."""
        assert 0 < n <= 1 << 64
        if n == 1 << 64:
            return self.next_u64()
        zone = ((n << (64 - n.bit_length())) - 1) & _M64
        while True:
            v = self.next_u64()
            prod = v * n
            if prod & _M64 <= zone:
                return prod >> 64


class TestRng(XorShiftRng):
    """utilities/src/rand.rs TestRng: prints its seed for reproducibility."""

    __test__ = False  # not a pytest class

    def __init__(self, seed: int | None = None, quiet: bool = False):
        if seed is None:
            seed = _pyrandom.getrandbits(64)
        if not quiet:
            print(f"\nInitializing 'TestRng' with seed '{seed}'\n")
        self.seed = seed
        src = XorShiftRng.seed_from_u64(seed)
        super().__init__(src.x, src.y, src.z, src.w)

    @classmethod
    def fixed(cls, seed: int) -> "TestRng":
        return cls(seed, quiet=True)
