"""Short-Weierstrass curve groups (BLS12-377 G1 over Fq, G2 over Fq2).

Host-side scalar implementation in Jacobian coordinates, generic over the
base-field element type (Fq or Fq2 from snarkvm_tpu.fields.scalar).
Mirrors the behavior of curves/src/templates/short_weierstrass_jacobian/
(reference), re-derived from standard formulas (a = 0 for BLS12-377).
"""
from __future__ import annotations

from ..fields.scalar import Fq, Fq2
from ..params import bls12_377 as P


class SWCurve:
    """y^2 = x^3 + b over field F (class with zero/one/arith)."""

    def __init__(self, F, b, gen_x, gen_y, cofactor: int, order: int):
        self.F = F
        self.b = b
        self.generator = (gen_x, gen_y)
        self.cofactor = cofactor
        self.order = order

    # ---- affine ----
    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        return y.square() == x.square() * x + self.b

    def affine_neg(self, pt):
        if pt is None:
            return None
        return (pt[0], -pt[1])

    # ---- jacobian: (X, Y, Z); affine = (X/Z^2, Y/Z^3); infinity Z=0 ----
    def to_jacobian(self, pt):
        if pt is None:
            return (self.F.one(), self.F.one(), self.F.zero())
        return (pt[0], pt[1], self.F.one())

    def to_affine(self, j):
        X, Y, Z = j
        if Z.is_zero():
            return None
        zinv = Z.inverse()
        z2 = zinv.square()
        return (X * z2, Y * z2 * zinv)

    def jac_double(self, j):
        X1, Y1, Z1 = j
        if Z1.is_zero():
            return j
        # dbl-2009-l (a=0)
        A = X1.square()
        B = Y1.square()
        C = B.square()
        t = (X1 + B).square() - A - C
        D = t + t                    # 2*((X1+B)^2 - A - C)
        E = A + A + A
        F_ = E.square()
        X3 = F_ - (D + D)
        C8 = C + C
        C8 = C8 + C8
        C8 = C8 + C8
        Y3 = E * (D - X3) - C8
        Z3 = Y1 * Z1
        Z3 = Z3 + Z3
        return (X3, Y3, Z3)

    def jac_add(self, j1, j2):
        X1, Y1, Z1 = j1
        X2, Y2, Z2 = j2
        if Z1.is_zero():
            return j2
        if Z2.is_zero():
            return j1
        # add-2007-bl
        Z1Z1 = Z1.square()
        Z2Z2 = Z2.square()
        U1 = X1 * Z2Z2
        U2 = X2 * Z1Z1
        S1 = Y1 * Z2 * Z2Z2
        S2 = Y2 * Z1 * Z1Z1
        if U1 == U2:
            if S1 == S2:
                return self.jac_double(j1)
            return (self.F.one(), self.F.one(), self.F.zero())
        H = U2 - U1
        I = (H + H).square()
        J = H * I
        r = S2 - S1
        r = r + r
        V = U1 * I
        X3 = r.square() - J - (V + V)
        S1J = S1 * J
        Y3 = r * (V - X3) - (S1J + S1J)
        Z3 = ((Z1 + Z2).square() - Z1Z1 - Z2Z2) * H
        return (X3, Y3, Z3)

    def jac_add_affine(self, j, pt):
        """Mixed addition (Z2 = 1)."""
        return self.jac_add(j, self.to_jacobian(pt))

    # ---- scalar multiplication ----
    def mul(self, pt, k: int):
        """Affine point times integer -> affine. No modular reduction (the
        cofactor-clearing path multiplies non-subgroup points by integers
        larger than the subgroup order)."""
        if k < 0:
            return self.mul(self.affine_neg(pt), -k)
        if pt is None or k == 0:
            return None
        acc = (self.F.one(), self.F.one(), self.F.zero())
        add = self.to_jacobian(pt)
        while k > 0:
            if k & 1:
                acc = self.jac_add(acc, add)
            add = self.jac_double(add)
            k >>= 1
        return self.to_affine(acc)

    def msm_naive(self, points, scalars):
        """Reference MSM (for tests): sum_i scalars[i] * points[i]."""
        acc = (self.F.one(), self.F.one(), self.F.zero())
        for pt, k in zip(points, scalars):
            q = self.mul(pt, k)
            acc = self.jac_add_affine(acc, q)
        return self.to_affine(acc)


# BLS12-377 G1: y^2 = x^3 + 1 over Fq. Ref: curves/src/bls12_377/g1.rs.
G1 = SWCurve(
    Fq,
    Fq(1),
    Fq(P.G1_GENERATOR_X),
    Fq(P.G1_GENERATOR_Y),
    P.G1_COFACTOR,
    P.R,
)

# BLS12-377 G2: y^2 = x^3 + b' over Fq2 with b' = b/u = 1/u = -u/5 ... computed
# exactly as WEIERSTRASS_B of g2.rs: b/u where u^2 = -5 => 1/u = u/(-5).
_B2 = Fq2(0, 1).inverse()  # 1/u
G2 = SWCurve(
    Fq2,
    _B2,
    Fq2(P.G2_GENERATOR_X_C0, P.G2_GENERATOR_X_C1),
    Fq2(P.G2_GENERATOR_Y_C0, P.G2_GENERATOR_Y_C1),
    P.G2_COFACTOR,
    P.R,
)
