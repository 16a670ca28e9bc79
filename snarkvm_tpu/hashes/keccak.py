"""Keccak-f[1600] sponge: Keccak{224,256,384,512} (pad 0x01) and
SHA3-{224,256,384,512} (pad 0x06), byte-oriented, mirroring
console/algorithms/src/keccak/ (which defers to tiny-keccak).

Console semantics (keccak/hash.rs): input bits -> LE bytes -> digest ->
LE bits. SHA3 variants verified against hashlib; Keccak against known
vectors.
"""
from __future__ import annotations

import hashlib as _hashlib

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_M64 = (1 << 64) - 1


def _rol(x, n):
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


def keccak_f1600(A):
    for rc in _RC:
        # theta
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rol(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[x][y] ^= D[x]
        # rho + pi
        B = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rol(A[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                A[x][y] = B[x][y] ^ ((~B[(x + 1) % 5][y]) & B[(x + 2) % 5][y] & _M64)
        # iota
        A[0][0] ^= rc
    return A


def _sponge(data: bytes, rate_bytes: int, out_len: int, pad_byte: int) -> bytes:
    A = [[0] * 5 for _ in range(5)]
    # pad
    padded = bytearray(data)
    padded.append(pad_byte)
    while len(padded) % rate_bytes:
        padded.append(0)
    padded[-1] ^= 0x80
    # absorb
    for off in range(0, len(padded), rate_bytes):
        block = padded[off : off + rate_bytes]
        for i in range(rate_bytes // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            A[i % 5][i // 5] ^= lane
        keccak_f1600(A)
    # squeeze
    out = b""
    while len(out) < out_len:
        for i in range(rate_bytes // 8):
            out += A[i % 5][i // 5].to_bytes(8, "little")
            if len(out) >= out_len:
                break
        if len(out) < out_len:
            keccak_f1600(A)
    return out[:out_len]


def keccak(data: bytes, variant: int = 256) -> bytes:
    """Original Keccak (pad 0x01)."""
    rate = (1600 - 2 * variant) // 8
    return _sponge(data, rate, variant // 8, 0x01)


def sha3(data: bytes, variant: int = 256) -> bytes:
    """FIPS-202 SHA3 (pad 0x06)."""
    rate = (1600 - 2 * variant) // 8
    return _sponge(data, rate, variant // 8, 0x06)


def bits_le_to_bytes(bits):
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def bytes_to_bits_le(data: bytes):
    return [(byte >> i) & 1 == 1 for byte in data for i in range(8)]


def hash_bits(kind: str, variant: int, input_bits):
    """Console Keccak/SHA3 hash: bits -> LE bytes -> digest -> LE bits."""
    data = bits_le_to_bytes(list(input_bits))
    if kind == "keccak":
        digest = keccak(data, variant)
    else:
        # hashlib's sha3 (OpenSSL) computes the same FIPS-202 function as the
        # pure-Python sponge below; use it on the hot path (puzzle Merkle
        # trees hash ~40k leaves per solution check).
        digest = _hashlib.new(f"sha3_{variant}", data).digest()
    return bytes_to_bits_le(digest)
