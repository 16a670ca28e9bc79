"""Blake2Xs try-and-increment hash-to-curve (base generator derivation).

Mirrors console/algorithms/src/blake2xs/hash_to_curve.rs:
  digest = Blake2Xs(msg, compressed_size, persona="AleoHtC0")
  -> field x from LE bytes with flag bits masked off (Fp from_random_bytes)
  -> recover y by flag, multiply by cofactor, reject zero; else k+1.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..utils.blake2xs import blake2xs
from ..fields.scalar import Fq, Fr, Fq2
from . import edwards as ed
from . import sw

_PERSONA = b"AleoHtC0"


def _try_edwards(message: str):
    digest = blake2xs(message.encode(), 32, _PERSONA)
    v = int.from_bytes(digest, "little")
    positive = (digest[31] >> 7) & 1 == 1        # EdwardsFlags: 1 bit
    x = v & ((1 << 253) - 1)                      # mask to MODULUS_BITS (shave 3)
    if x >= P.R:
        return None
    if x == 0:
        return None  # parses as infinity -> zero after cofactor; rejected
    # y^2 = (a x^2 - 1)/(d x^2 - 1), a = -1
    x2 = x * x % P.R
    num = (P.R - x2 - 1) % P.R
    den = (P.EDWARDS_D * x2 - 1) % P.R
    if den == 0:
        return None
    y2 = Fr(num * pow(den, -1, P.R))
    y = y2.sqrt()
    if y is None:
        return None
    negy = (P.R - y.v) % P.R
    yv = y.v if ((y.v < negy) ^ positive) else negy
    pt = (x, yv)
    assert ed.is_on_curve(pt)
    g = ed.mul(pt, ed.COFACTOR)
    if g == ed.IDENTITY_AFFINE:
        return None
    return g


def hash_to_curve_edwards(input_msg: str):
    """Returns (point, message, k) like the reference."""
    for k in range(128):
        message = f"{input_msg} in {k}"
        g = _try_edwards(message)
        if g is not None:
            return g, message, k
    raise ValueError(f"unable to hash to curve on {input_msg}")


def _try_g1(message: str):
    digest = blake2xs(message.encode(), 48, _PERSONA)
    v = int.from_bytes(digest, "little")
    top = digest[47]
    x_sign = (top >> 7) & 1 == 1
    infinity = (top >> 6) & 1 == 1               # SWFlags: 2 bits
    if x_sign and infinity:
        return None
    x = v & ((1 << 377) - 1)                      # Fq MODULUS_BITS 377 (shave 7)
    if x >= P.Q:
        return None
    if infinity:
        return None
    # y^2 = x^3 + 1
    y2 = Fq(x * x % P.Q * x % P.Q + 1)
    y = y2.sqrt()
    if y is None:
        return None
    negy = (P.Q - y.v) % P.Q
    yv = y.v if ((y.v < negy) ^ x_sign) else negy
    pt = (Fq(x), Fq(yv))
    assert sw.G1.is_on_curve(pt)
    g = sw.G1.mul(pt, P.G1_COFACTOR)
    if g is None:
        return None
    return g


def hash_to_curve_g1(input_msg: str):
    for k in range(128):
        message = f"{input_msg} in {k}"
        g = _try_g1(message)
        if g is not None:
            return g, message, k
    raise ValueError(f"unable to hash to curve on {input_msg}")
