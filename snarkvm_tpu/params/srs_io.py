"""SRS artifact IO (.usrs): the on-disk format of Aleo's universal SRS
(parameters/src/mainnet/powers.rs + resources/*.usrs).

Layout per element (CanonicalSerialize uncompressed for SW affine):
  G1: x (48 bytes LE) || y (48 bytes LE, flags in the top byte:
      bit6 = infinity, bit7 = y-sign [unused uncompressed])
  G2: x.c0 || x.c1 || y.c0 || y.c1 (4 x 48 bytes LE, flags on the last)

`powers-of-beta-{15..28}.usrs` shards hold consecutive G1 powers;
`neg-powers-of-beta` a u64-len-prefixed map degree_bound -> G2 point;
`beta-h` a single G2 point. This module reads/writes that layout so the
framework can consume Aleo's shipped artifacts when present (zero-egress
here, so tests round-trip our own test SRS through the same format).
"""
from __future__ import annotations

import struct

from . import bls12_377 as P


def _write_fq(v: int) -> bytes:
    return (v % P.Q).to_bytes(48, "little")


def _read_fq(b: bytes) -> int:
    return int.from_bytes(b, "little")


def write_g1(pt) -> bytes:
    """pt: (x, y) canonical ints or None (infinity)."""
    if pt is None:
        out = bytearray(96)
        out[95] |= 0x40
        return bytes(out)
    return _write_fq(pt[0]) + _write_fq(pt[1])


def read_g1(b: bytes):
    flags = b[95]
    if flags & 0x40:
        return None
    x = _read_fq(b[0:48])
    y = _read_fq(bytes(b[48:95]) + bytes([b[95] & 0x3F]))
    return (x, y)


def write_g2(pt) -> bytes:
    """pt: (Fq2 x, Fq2 y) with .c tuples, or ((c0,c1),(c0,c1)) ints."""
    x, y = pt
    xc = x.c if hasattr(x, "c") else x
    yc = y.c if hasattr(y, "c") else y
    return _write_fq(xc[0]) + _write_fq(xc[1]) + _write_fq(yc[0]) + _write_fq(yc[1])


def read_g2(b: bytes):
    return ((_read_fq(b[0:48]), _read_fq(b[48:96])),
            (_read_fq(b[96:144]), _read_fq(bytes(b[144:191]) + bytes([b[191] & 0x3F]))))


def write_powers_file(path: str, points):
    """Write consecutive G1 powers (a powers-of-beta shard)."""
    with open(path, "wb") as f:
        for pt in points:
            f.write(write_g1(pt))


def read_powers_file(path: str):
    out = []
    with open(path, "rb") as f:
        while True:
            chunk = f.read(96)
            if len(chunk) < 96:
                break
            out.append(read_g1(chunk))
    return out


def write_neg_powers_file(path: str, mapping: dict):
    """mapping: degree_bound -> G2 point."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(mapping)))
        for k in sorted(mapping):
            f.write(struct.pack("<Q", k))
            f.write(write_g2(mapping[k]))


def read_neg_powers_file(path: str) -> dict:
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            (k,) = struct.unpack("<Q", f.read(8))
            out[k] = read_g2(f.read(192))
    return out
