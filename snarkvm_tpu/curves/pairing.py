"""BLS12-377 optimal ate pairing (host-side scalar implementation).

e(P, Q) = f_{X,ψ(Q)}(P) ^ ((q^12 - 1)/r), X = 9586122913090633729 (positive).
D-type twist: ψ(x, y) = (x·w², y·w³) maps E'(Fq2) → E(Fq12), w² = v, w⁶ = u.

Behavioral parity target: curves/src/templates/bls12/bls12.rs (reference);
algorithm re-derived from the standard affine Miller loop. Used by KZG /
Varuna verification (`product_of_pairings` — ref curves/src/traits/
pairing_engine.rs). Perf is irrelevant host-side; the prover never pairs.
"""
from __future__ import annotations

from ..fields.scalar import Fq2, Fq6, Fq12
from ..params import bls12_377 as P

_Q = P.Q
_FINAL_EXP = (P.Q**12 - 1) // P.R


def _untwist(q_pt):
    """E'(Fq2) affine -> E(Fq12) affine."""
    x, y = q_pt
    X = Fq12(Fq6((((0, 0)), x.c, (0, 0))), Fq6.zero())       # x * w^2 (w^2 = v)
    Y = Fq12(Fq6.zero(), Fq6(((0, 0), y.c, (0, 0))))         # y * w^3 (w^3 = v*w)
    return (X, Y)


def _embed_g1(p_pt):
    x, y = p_pt
    return (
        Fq12(Fq6(((x.v % _Q, 0), (0, 0), (0, 0))), Fq6.zero()),
        Fq12(Fq6(((y.v % _Q, 0), (0, 0), (0, 0))), Fq6.zero()),
    )


def _line_eval(T, Qp, xP, yP):
    """Evaluate the line through T and Qp (or tangent if T==Qp) at (xP, yP).
    Returns (value, T') where T' = T+Qp (or 2T). All in E(Fq12) affine."""
    xT, yT = T
    xQ, yQ = Qp
    if xT == xQ and yT == yQ:
        lam = (xT * xT) * Fq12(Fq6(((3, 0), (0, 0), (0, 0))), Fq6.zero()) * (yT + yT).inverse()
    else:
        if xT == xQ:
            # vertical line: x - xT
            return (xP - xT, None)
        lam = (yQ - yT) * (xQ - xT).inverse()
    val = yP - yT - lam * (xP - xT)
    x3 = lam * lam - xT - xQ
    y3 = lam * (xT - x3) - yT
    return (val, (x3, y3))


def miller_loop(p_pt, q_pt) -> Fq12:
    """f_{X,ψ(Q)}(P) for affine P in G1 (Fq tuple) and Q in G2 (Fq2 tuple)."""
    if p_pt is None or q_pt is None:
        return Fq12.one()
    Qp = _untwist(q_pt)
    xP, yP = _embed_g1(p_pt)
    f = Fq12.one()
    T = Qp
    x_bits = bin(P.BLS_X)[3:]  # skip leading 1
    for bit in x_bits:
        f = f.square()
        val, T = _line_eval(T, T, xP, yP)
        f = f * val
        if bit == "1":
            val, T = _line_eval(T, Qp, xP, yP)
            f = f * val
    return f


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((q^12-1)/r) with the easy part done via Frobenius."""
    # easy part: f^(q^6 - 1) = conj(f) * f^-1, then ^(q^2 + 1)
    f1 = f.conjugate() * f.inverse()
    f2 = f1.frobenius(2) * f1
    # hard part: ^((q^4 - q^2 + 1)/r)
    hard = (P.Q**4 - P.Q**2 + 1) // P.R
    return f2.pow(hard)


def pairing(p_pt, q_pt) -> Fq12:
    return final_exponentiation(miller_loop(p_pt, q_pt))


def product_of_pairings(pairs) -> Fq12:
    """prod e(P_i, Q_i). pairs: iterable of (G1 affine, G2 affine)."""
    f = Fq12.one()
    for p_pt, q_pt in pairs:
        f = f * miller_loop(p_pt, q_pt)
    return final_exponentiation(f)
