"""ChaCha20 RNG matching rand_chacha::ChaCha20Rng stream semantics
(used by the finalize `rand.chacha` command, command/rand_chacha.rs:78).

ChaCha20Rng::from_seed(seed32): stream of 64-byte blocks, block counter
starting at 0, nonce zero; next_u64 = 8 bytes LE from the stream.
"""
from __future__ import annotations

import struct

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
_M32 = 0xFFFFFFFF


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


class ChaCha20Rng:
    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = seed
        self.counter = 0
        self.buffer = b""

    def _refill(self):
        self.buffer += chacha20_block(self.key, self.counter)
        self.counter += 1

    def next_bytes(self, n: int) -> bytes:
        while len(self.buffer) < n:
            self._refill()
        out, self.buffer = self.buffer[:n], self.buffer[n:]
        return out

    def next_u64(self) -> int:
        return int.from_bytes(self.next_bytes(8), "little")

    def rand_field(self, modulus: int, shave_bits: int, num_limbs: int = 4) -> int:
        """arkworks-style Fp::rand: fill u64 limbs, shave top bits, reject >= p."""
        while True:
            v = 0
            for i in range(num_limbs):
                v |= self.next_u64() << (64 * i)
            v &= (1 << (64 * num_limbs - shave_bits)) - 1
            if v < modulus:
                return v

    def rand_bool(self) -> bool:
        return self.next_bytes(4)[0] & 1 == 1
