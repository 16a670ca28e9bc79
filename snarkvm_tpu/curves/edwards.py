"""Edwards-BLS12: twisted Edwards curve -x^2 + y^2 = 1 + d x^2 y^2 over Fr.

Host-side scalar implementation on raw ints (extended twisted Edwards
coordinates, a = -1 unified formulas). This is the embedded curve used by
the Aleo console `Group` type; its base field is BLS12-377's Fr.
Ref behavior: curves/src/templates/twisted_edwards_extended/ and
curves/src/edwards_bls12/parameters.rs (a=-1, d=3021, cofactor 4).
"""
from __future__ import annotations

from ..params import bls12_377 as P

R = P.R
D = P.EDWARDS_D
ORDER = P.S          # prime subgroup order
COFACTOR = 4

# Affine points are (x, y) int tuples; identity is (0, 1).
# Extended coordinates: (X, Y, T, Z) with x=X/Z, y=Y/Z, T=XY/Z.
IDENTITY_AFFINE = (0, 1)
IDENTITY_EXT = (0, 1, 0, 1)

GENERATOR = (P.EDWARDS_GENERATOR_X, P.EDWARDS_GENERATOR_Y)


def is_on_curve(pt) -> bool:
    x, y = pt
    x2, y2 = x * x % R, y * y % R
    return (-x2 + y2) % R == (1 + D * x2 % R * y2) % R


def to_extended(pt):
    x, y = pt
    return (x, y, x * y % R, 1)


def to_affine(e):
    X, Y, T, Z = e
    zinv = pow(Z, -1, R)
    return (X * zinv % R, Y * zinv % R)


def ext_add(p, q):
    """Unified addition, a=-1 (HWCD08 'add-2008-hwcd-3')."""
    X1, Y1, T1, Z1 = p
    X2, Y2, T2, Z2 = q
    A = (Y1 - X1) * (Y2 - X2) % R
    B = (Y1 + X1) * (Y2 + X2) % R
    C = 2 * D * T1 % R * T2 % R
    Dd = 2 * Z1 * Z2 % R
    E = B - A
    F = Dd - C
    G = Dd + C
    H = B + A
    X3 = E * F % R
    Y3 = G * H % R
    T3 = E * H % R
    Z3 = F * G % R
    return (X3, Y3, T3, Z3)


def ext_double(p):
    """dbl-2008-hwcd for a=-1."""
    X1, Y1, _, Z1 = p
    A = X1 * X1 % R
    B = Y1 * Y1 % R
    C = 2 * Z1 * Z1 % R
    Dd = (-A) % R
    t = (X1 + Y1)
    E = (t * t - A - B) % R
    G = (Dd + B) % R
    F = (G - C) % R
    H = (Dd - B) % R
    X3 = E * F % R
    Y3 = G * H % R
    T3 = E * H % R
    Z3 = F * G % R
    return (X3, Y3, T3, Z3)


def ext_neg(p):
    X, Y, T, Z = p
    return ((-X) % R, Y, (-T) % R, Z)


def affine_neg(pt):
    return ((-pt[0]) % R, pt[1])


def mul(pt, k: int):
    """Affine * integer -> affine (double-and-add). No modular reduction:
    callers reduce mod ORDER only for subgroup points (cofactor muls need
    the raw integer)."""
    if k < 0:
        return mul(affine_neg(pt), -k)
    if k == 0:
        return IDENTITY_AFFINE
    acc = IDENTITY_EXT
    add = to_extended(pt)
    while k > 0:
        if k & 1:
            acc = ext_add(acc, add)
        add = ext_double(add)
        k >>= 1
    return to_affine(acc)


def add(p, q):
    """Affine + affine -> affine."""
    return to_affine(ext_add(to_extended(p), to_extended(q)))


def x_recover_y(x: int, want_positive_or_flag=None):
    """Given x, solve y^2 = (1 + x^2) / (1 - d x^2) ... from -x^2+y^2 = 1+d x^2 y^2:
    y^2 (1 - d x^2) = 1 + x^2  =>  y^2 = (1 + x^2)/(1 - d x^2)."""
    from ..fields.scalar import Fr

    x2 = x * x % R
    num = (1 + x2) % R
    den = (1 - D * x2) % R
    y2 = num * pow(den, -1, R) % R
    y = Fr(y2).sqrt()
    if y is None:
        return None
    return y.v
