"""CanonicalSerialize analogs: compressed/uncompressed curve points.

snarkVM (arkworks-style) point wire format
(curves/src/templates/macros.rs:67-106, utilities/src/serialize/flags.rs):

  G1 compressed   = 48-byte LE x, flags in the top byte:
                    bit7 = PositiveY (y > -y), bit6 = Infinity
  G1 uncompressed = 48-byte LE x || 48-byte LE y (flags on y's top byte)
  G2 compressed   = x.c0 || x.c1 (96 bytes), flags on the last byte
  G2 uncompressed = x.c0 || x.c1 || y.c0 || y.c1 (192 bytes)

Fields serialize as LE canonical integers (not Montgomery), flags OR'd
into the final byte. BLS12-377: G1 is y^2 = x^3 + 1; G2 twist
y^2 = x^3 + B2 over Fq2.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..fields.scalar import Fq, Fq2

Q = P.Q

FLAG_INFINITY = 1 << 6
FLAG_POSITIVE_Y = 1 << 7

# G2 coefficient b' for the (M-)twist used by BLS12-377:
# b2 = b * (1/u) in Fq2 with Fq2 = Fq[u]/(u^2+5). Derived once from the
# generator; validated below.
def _derive_b2():
    x = Fq2(P.G2_GENERATOR_X_C0, P.G2_GENERATOR_X_C1)
    y = Fq2(P.G2_GENERATOR_Y_C0, P.G2_GENERATOR_Y_C1)
    return y * y - x * x * x


_B2 = _derive_b2()


def write_g1_compressed(pt) -> bytes:
    """pt: (x, y) canonical affine ints, or None for infinity."""
    if pt is None:
        out = bytearray(48)
        out[47] |= FLAG_INFINITY
        return bytes(out)
    x, y = pt
    out = bytearray(int(x).to_bytes(48, "little"))
    if y > Q - y:
        out[47] |= FLAG_POSITIVE_Y
    return bytes(out)


def read_g1_compressed(b: bytes):
    """48 bytes -> (x, y) or None. Recovers y from x (y^2 = x^3 + 1)."""
    flags = b[47]
    if flags & FLAG_INFINITY:
        return None
    x = int.from_bytes(bytes(b[:47]) + bytes([b[47] & 0x3F]), "little")
    y2 = (x * x % Q * x + 1) % Q
    y = Fq(y2).sqrt()
    if y is None:
        raise ValueError("x-coordinate not on curve")
    y = y.v
    neg = Q - y
    # Select the lexicographically-largest y iff PositiveY
    # (affine.rs from_x_coordinate: greatest <=> flag set).
    greatest = max(y, neg)
    smallest = min(y, neg)
    y = greatest if (flags & FLAG_POSITIVE_Y) else smallest
    return (x, y)


def write_g1_uncompressed(pt) -> bytes:
    if pt is None:
        out = bytearray(96)
        out[95] |= FLAG_INFINITY
        return bytes(out)
    x, y = pt
    return int(x).to_bytes(48, "little") + int(y).to_bytes(48, "little")


def read_g1_uncompressed(b: bytes):
    flags = b[95]
    if flags & FLAG_INFINITY:
        return None
    x = int.from_bytes(b[0:48], "little")
    y = int.from_bytes(bytes(b[48:95]) + bytes([b[95] & 0x3F]), "little")
    return (x, y)


def write_g2_uncompressed(pt) -> bytes:
    """pt: ((x0,x1),(y0,y1)) or None."""
    if pt is None:
        out = bytearray(192)
        out[191] |= FLAG_INFINITY
        return bytes(out)
    (x0, x1), (y0, y1) = pt
    return (int(x0).to_bytes(48, "little") + int(x1).to_bytes(48, "little")
            + int(y0).to_bytes(48, "little") + int(y1).to_bytes(48, "little"))


def read_g2_uncompressed(b: bytes):
    flags = b[191]
    if flags & FLAG_INFINITY:
        return None
    x0 = int.from_bytes(b[0:48], "little")
    x1 = int.from_bytes(b[48:96], "little")
    y0 = int.from_bytes(b[96:144], "little")
    y1 = int.from_bytes(bytes(b[144:191]) + bytes([b[191] & 0x3F]), "little")
    return ((x0, x1), (y0, y1))


def _fq2_gt(a: Fq2, b: Fq2) -> bool:
    """Fq2 lexicographic order (c1 first, then c0) — fields/src/fp2.rs Ord."""
    if a.c[1] != b.c[1]:
        return a.c[1] > b.c[1]
    return a.c[0] > b.c[0]


def write_g2_compressed(pt) -> bytes:
    if pt is None:
        out = bytearray(96)
        out[95] |= FLAG_INFINITY
        return bytes(out)
    (x0, x1), (y0, y1) = pt
    out = bytearray(int(x0).to_bytes(48, "little") + int(x1).to_bytes(48, "little"))
    y = Fq2(y0, y1)
    if _fq2_gt(y, -y):
        out[95] |= FLAG_POSITIVE_Y
    return bytes(out)


def read_g2_compressed(b: bytes):
    flags = b[95]
    if flags & FLAG_INFINITY:
        return None
    x0 = int.from_bytes(b[0:48], "little")
    x1 = int.from_bytes(bytes(b[48:95]) + bytes([b[95] & 0x3F]), "little")
    x = Fq2(x0, x1)
    y2 = x * x * x + _B2
    y = y2.sqrt()
    if y is None:
        raise ValueError("G2 x-coordinate not on curve")
    neg = -y
    greatest = y if _fq2_gt(y, neg) else neg
    smallest = neg if _fq2_gt(y, neg) else y
    y = greatest if (flags & FLAG_POSITIVE_Y) else smallest
    return ((x.c[0], x.c[1]), (y.c[0], y.c[1]))
