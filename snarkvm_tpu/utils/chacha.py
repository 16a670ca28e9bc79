"""ChaCha20 RNG matching rand_chacha::ChaCha20Rng stream semantics, plus the
rand-crate distribution algorithms snarkVM consumes through it.

Used by the finalize `rand.chacha` command (command/rand_chacha.rs:78) and the
epoch puzzle sampler (ledger/puzzle/epoch/src/synthesis/helpers/mod.rs:40).

Parity notes (rand 0.8 / rand_chacha 0.3, the reference's pinned versions):
- ChaCha20Rng::from_seed(seed32): djb ChaCha20 (64-bit block counter in words
  12-13, 64-bit nonce in 14-15), counter and nonce zero. rand_core's BlockRng
  hands out the keystream as consecutive LE u32 words, so with u32/u64-sized
  reads the stream is exactly the byte stream.
- SeedableRng::seed_from_u64: PCG32 expansion of the u64 state into the
  32-byte seed (rand_core/src/lib.rs seed_from_u64).
- Standard distribution: bool = MSB of next_u32; u8/u16/u32 = next_u32
  truncated; u64 = next_u64; u128 = lo u64 then hi u64 (LE halves).
- Fp::rand (snarkvm-fields): sample 64-bit limbs LE, shave the top
  REPR_SHAVE_BITS, reject >= modulus; the accepted repr IS the Montgomery
  representation, so the canonical value is repr * R^-1 mod p.
- WeightedIndex<u16>::sample: uniform draw in [0, total) via the u32
  widening-multiply sampler, then partition_point over cumulative weights.
"""
from __future__ import annotations

import struct

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x, n):
    return ((x << n) | (x >> (32 - n))) & _M32


def _quarter(state, a, b, c, d):
    state[a] = (state[a] + state[b]) & _M32
    state[d] = _rotl(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & _M32
    state[b] = _rotl(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b]) & _M32
    state[d] = _rotl(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & _M32
    state[b] = _rotl(state[b] ^ state[c], 7)


def chacha20_block(key: bytes, counter: int, nonce: bytes = b"\0" * 12) -> bytes:
    ks = struct.unpack("<8I", key)
    ns = struct.unpack("<3I", nonce)
    init = list(_CONSTANTS) + list(ks) + [counter & _M32] + list(ns)
    state = init[:]
    for _ in range(10):
        _quarter(state, 0, 4, 8, 12)
        _quarter(state, 1, 5, 9, 13)
        _quarter(state, 2, 6, 10, 14)
        _quarter(state, 3, 7, 11, 15)
        _quarter(state, 0, 5, 10, 15)
        _quarter(state, 1, 6, 11, 12)
        _quarter(state, 2, 7, 8, 13)
        _quarter(state, 3, 4, 9, 14)
    out = [(s + i) & _M32 for s, i in zip(state, init)]
    return struct.pack("<16I", *out)


def seed_bytes_from_u64(state: int) -> bytes:
    """rand_core SeedableRng::seed_from_u64: PCG32 over the u64 state."""
    mul = 6364136223846793005
    inc = 11634580027462260723
    out = bytearray()
    for _ in range(8):
        state = (state * mul + inc) & _M64
        xorshifted = ((state >> 18) ^ state) >> 27 & _M32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << (32 - rot & 31))) & _M32
        out += struct.pack("<I", x)
    return bytes(out)


class ChaCha20Rng:
    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = seed
        self.counter = 0
        self.buffer = b""

    @classmethod
    def seed_from_u64(cls, state: int) -> "ChaCha20Rng":
        return cls(seed_bytes_from_u64(state))

    def _refill(self):
        self.buffer += chacha20_block(self.key, self.counter)
        self.counter += 1

    def next_bytes(self, n: int) -> bytes:
        while len(self.buffer) < n:
            self._refill()
        out, self.buffer = self.buffer[:n], self.buffer[n:]
        return out

    def next_u32(self) -> int:
        return int.from_bytes(self.next_bytes(4), "little")

    def next_u64(self) -> int:
        return int.from_bytes(self.next_bytes(8), "little")

    # ---- rand 0.8 Standard distribution ----

    def gen_bool(self) -> bool:
        """Standard for bool: sign bit of next_u32."""
        return self.next_u32() >> 31 == 1

    def gen_uint(self, bits: int) -> int:
        """Standard for u8/u16/u32/u64/u128."""
        if bits <= 32:
            return self.next_u32() & ((1 << bits) - 1)
        if bits == 64:
            return self.next_u64()
        lo = self.next_u64()
        hi = self.next_u64()
        return (hi << 64) | lo

    def gen_int(self, bits: int) -> int:
        v = self.gen_uint(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def gen_range_u32(self, n: int) -> int:
        """UniformInt sample over [0, n) with u32 internals (covers the u8/
        u16/u32 UniformSampler::new(0, n) path, e.g. WeightedIndex<u16>)."""
        assert 0 < n <= 1 << 32
        ints_to_reject = ((1 << 32) - n) % n
        zone = _M32 - ints_to_reject
        while True:
            v = self.next_u32()
            prod = v * n
            if prod & _M32 <= zone:
                return prod >> 32

    def gen_range_u64_inclusive(self, low: int, high: int) -> int:
        """rand 0.8 UniformInt::<u64>::sample_single_inclusive(low, high):
        the `Rng::gen_range(low..=high)` path for usize/u64 — zone is the
        range shifted to the top 64 bits, accept when the LOW half of the
        widening multiply lands under it, result is the HIGH half."""
        rng_size = (high - low + 1) & ((1 << 64) - 1)
        if rng_size == 0:          # full u64 range
            return self.next_u64()
        lz = 64 - rng_size.bit_length()
        zone = ((rng_size << lz) - 1) & ((1 << 64) - 1)
        while True:
            v = self.next_u64()
            prod = v * rng_size
            if prod & ((1 << 64) - 1) <= zone:
                return low + (prod >> 64)

    def rand_field(self, modulus: int, shave_bits: int, num_limbs: int = 4) -> int:
        """Fp::rand: the canonical value of a uniformly-sampled Montgomery
        repr (repr < p after shaving) — i.e. repr * R^-1 mod p."""
        mask = (1 << (64 * num_limbs - shave_bits)) - 1
        r_inv = pow(1 << (64 * num_limbs), -1, modulus)
        while True:
            v = 0
            for i in range(num_limbs):
                v |= self.next_u64() << (64 * i)
            v &= mask
            if v < modulus:
                return v * r_inv % modulus

    def rand_bool(self) -> bool:  # legacy alias
        return self.gen_bool()


class WeightedIndex:
    """rand 0.8 WeightedIndex over u16 weights (zero weights allowed)."""

    def __init__(self, weights):
        if not weights:
            raise ValueError("no weights")
        if any(w < 0 or w > 0xFFFF for w in weights):
            raise ValueError("weight out of u16 range")
        # rand stores cumulative sums EXCLUDING the final total: entry i holds
        # sum(weights[..=i]); length n-1, with the grand total kept separately.
        acc = 0
        self.cumulative = []
        for w in weights[:-1]:
            acc += w
            self.cumulative.append(acc)
        self.total = acc + weights[-1]
        if self.total == 0 or self.total > 0xFFFF:
            raise ValueError("total weight must be a nonzero u16")

    def sample(self, rng: ChaCha20Rng) -> int:
        chosen = rng.gen_range_u32(self.total)
        # partition_point(|w| w <= chosen)
        lo, hi = 0, len(self.cumulative)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.cumulative[mid] <= chosen:
                lo = mid + 1
            else:
                hi = mid
        return lo
