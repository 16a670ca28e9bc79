"""Blake2s + Blake2Xs (XOF) in pure Python.

Needed because the reference derives all BHP/Pedersen base generators via
Blake2Xs hash-to-curve (console/algorithms/src/blake2xs/mod.rs), with
Blake2X tree parameters (fanout=0, depth=0) that hashlib refuses.
Used only at setup time — speed is irrelevant, exactness is everything.
Verified against the reference's checked-in blake2-kat.json vectors.
"""
from __future__ import annotations

import struct

_IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]

_M32 = 0xFFFFFFFF


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & _M32


def _compress(h, block, t, last):
    m = struct.unpack("<16I", block)
    v = h[:] + _IV[:]
    v[12] ^= t & _M32
    v[13] ^= (t >> 32) & _M32
    if last:
        v[14] ^= _M32

    def G(a, b, c, d, x, y):
        v[a] = (v[a] + v[b] + x) & _M32
        v[d] = _rotr(v[d] ^ v[a], 16)
        v[c] = (v[c] + v[d]) & _M32
        v[b] = _rotr(v[b] ^ v[c], 12)
        v[a] = (v[a] + v[b] + y) & _M32
        v[d] = _rotr(v[d] ^ v[a], 8)
        v[c] = (v[c] + v[d]) & _M32
        v[b] = _rotr(v[b] ^ v[c], 7)

    for r in range(10):
        s = _SIGMA[r]
        G(0, 4, 8, 12, m[s[0]], m[s[1]])
        G(1, 5, 9, 13, m[s[2]], m[s[3]])
        G(2, 6, 10, 14, m[s[4]], m[s[5]])
        G(3, 7, 11, 15, m[s[6]], m[s[7]])
        G(0, 5, 10, 15, m[s[8]], m[s[9]])
        G(1, 6, 11, 12, m[s[10]], m[s[11]])
        G(2, 7, 8, 13, m[s[12]], m[s[13]])
        G(3, 4, 9, 14, m[s[14]], m[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def blake2s(
    data: bytes,
    digest_size: int = 32,
    fanout: int = 1,
    depth: int = 1,
    leaf_size: int = 0,
    node_offset: int = 0,
    node_depth: int = 0,
    inner_size: int = 0,
    salt: bytes = b"",
    person: bytes = b"",
    last_node: bool = False,
) -> bytes:
    """Unkeyed Blake2s with full tree parameters (no range limits)."""
    if (fanout == 1 and depth == 1 and not leaf_size and not node_offset
            and not node_depth and not inner_size and not last_node):
        # sequential-mode parameters: identical to hashlib's blake2s
        # (OpenSSL-speed; the pure sponge below is the Blake2X tree path)
        import hashlib
        return hashlib.blake2s(data, digest_size=digest_size,
                               salt=salt, person=person).digest()
    param = struct.pack(
        "<BBBBIIHBB8s8s",
        digest_size,
        0,                 # key length
        fanout,
        depth,
        leaf_size,
        node_offset & 0xFFFFFFFF,
        (node_offset >> 32) & 0xFFFF,
        node_depth,
        inner_size,
        salt.ljust(8, b"\0"),
        person.ljust(8, b"\0"),
    )
    h = [_IV[i] ^ struct.unpack("<8I", param)[i] for i in range(8)]
    # process blocks
    if len(data) == 0:
        blocks = [b"\0" * 64]
    else:
        blocks = [data[i : i + 64] for i in range(0, len(data), 64)]
    t = 0
    for i, blk in enumerate(blocks):
        is_last = i == len(blocks) - 1
        t += len(blk)
        h = _compress(h, blk.ljust(64, b"\0"), t if not (len(data) == 0) else 0, is_last)
    return struct.pack("<8I", *h)[:digest_size]


def blake2xs(data: bytes, xof_digest_length: int, persona: bytes = b"") -> bytes:
    """Blake2Xs XOF exactly as the reference uses it (blake2xs/mod.rs:evaluate)."""
    assert xof_digest_length > 0
    node_off = xof_digest_length << 32
    root = blake2s(data, digest_size=32, node_offset=node_off, person=persona)
    out = b""
    rounds = (xof_digest_length + 31) // 32
    for i in range(rounds):
        dl = xof_digest_length % 32 if (i == rounds - 1 and xof_digest_length % 32 != 0) else 32
        out += blake2s(
            root,
            digest_size=dl,
            fanout=0,
            depth=0,
            leaf_size=32,
            node_offset=node_off | i,
            inner_size=32,
            person=persona,
        )
    return out
