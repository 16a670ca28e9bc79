"""Circuit Elligator2 encode + HashToGroup
(circuit/algorithms/src/elligator2/encode.rs,
circuit/algorithms/src/poseidon/hash_to_group.rs).

Mirrors the reference encode exactly: the legendre symbol is computed
IN-CIRCUIT as `w^((p-1)/2)` (constant-exponent pow), the square root is
an even-root witness bound by `y^2 == rhs`, and the result is validated
as a Weierstrass, Montgomery, and twisted-Edwards element before
cofactor clearing. Unlike the console encode, the circuit encode does
not produce the sign bit (encode.rs:21 note).
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..console import network as N
from ..curves import edwards as ed
from .builder import CircuitBuilder, LinearCombination, PRIVATE
from .types import CField, CBool, CGroup

R = P.R
_HALF = pow(2, -1, R)
_MMODT = (R - 1) // 2     # MODULUS_MINUS_ONE_DIV_TWO


def _assert_neq_zero(builder, f: CField):
    """E::assert_neq(f, 0) (environment.rs:87): witness the inverse as
    `multiplier` and enforce (f - 0) * multiplier == 1."""
    v = f.value
    mult = CField.new(builder, PRIVATE, pow(v, -1, R) if v else 0)
    builder.enforce(f.lc, mult.lc, LinearCombination(1))


def elligator2_gadget(builder: CircuitBuilder, r: CField):
    """Returns (CGroup subgroup point, console sign_high bool).

    The sign bit is the CONSOLE value only (no circuit constraints) —
    the reference circuit encode does not compute it; callers that need
    an in-circuit sign must derive it themselves."""
    b_inv = pow(N.MONTGOMERY_B, -1, R)
    a = N.MONTGOMERY_A * b_inv % R
    a_half = a * _HALF % R
    b = b_inv * b_inv % R

    # console values drive the witnesses
    pt_c, sign_c = N.elligator2_encode(r.value)

    # Ensure the input is nonzero (encode.rs:26).
    _assert_neq_zero(builder, r)

    # ur2 = D * input^2; assert A^2*ur2 != B*(1+ur2)^2 (encode.rs:55-58)
    ur2 = r.square().scale_const(P.EDWARDS_D)
    one_plus_ur2 = ur2.add_const(1)
    lhs = ur2.scale_const(a * a % R)
    rhs_sq = one_plus_ur2.square().scale_const(b)
    diff = lhs - rhs_sq
    _assert_neq_zero(builder, diff)

    # v = -A / (1 + ur2): constant numerator, one inverse constraint
    v = CField.constant(builder, (R - a) % R).div(one_plus_ur2)

    # e = legendre(v^3 + A v^2 + B v) via pow((p-1)/2) (encode.rs:64-65)
    v2 = v.square()
    w = (v2 * v) + v2.scale_const(a) + v.scale_const(b)
    e = w.pow_const(_MMODT)

    # x = e*v - (1 - e) * A/2  (encode.rs:68)
    ev = e * v
    x = CField(builder, ev.lc.add(
        LinearCombination((R - a_half) % R).add(e.lc, a_half)))

    # rhs = x^3 + A x^2 + B x
    x2 = x.square()
    x3 = x2 * x
    rhs = x3 + x2.scale_const(a) + x.scale_const(b)

    # even square root witness (encode.rs:76-93)
    from ..fields.scalar import Fr
    s = Fr(rhs.value).sqrt()
    sv = 0
    if s is not None:
        sv = s.v if (s.v & 1) == 0 else (R - s.v) % R
    root = CField.new(builder, PRIVATE, sv)
    root_bits = root.to_bits_le()
    # Verify that the square root is even.
    (~root_bits[0]).assert_true()

    # y = -e * root  (encode.rs:95)
    y = CField(builder, e.lc.scale(R - 1)) * root

    # Ensure v * e * x * y != 0 (encode.rs:98)
    vex = (v * e) * x
    vexy = vex * y
    _assert_neq_zero(builder, vexy)

    # Ensure y^2 == rhs (encode.rs:101-102) — binds the root witness
    y2 = y.square()
    builder.assert_eq(y2.lc, rhs.lc)

    # Weierstrass -> Montgomery (scales) + validity (encode.rs:105-112)
    u_m = x.scale_const(N.MONTGOMERY_B)
    v_m = y.scale_const(N.MONTGOMERY_B)
    b2 = N.MONTGOMERY_B * N.MONTGOMERY_B % R
    b3 = b2 * N.MONTGOMERY_B % R
    u2 = x2.scale_const(b2)
    u3 = x3.scale_const(b3)
    v2m = y2.scale_const(b3)
    builder.assert_eq(v2m.lc,
                      u3.lc.add(u2.lc, N.MONTGOMERY_A).add(u_m.lc))

    # Montgomery -> twisted Edwards: x = u/v, y = (u-1)/(u+1)
    ex = u_m.div(v_m)
    ey = CField(builder, u_m.lc.add(LinearCombination(R - 1))).div(
        CField(builder, u_m.lc.add(LinearCombination(1))))
    pt = CGroup(builder, ex, ey)
    pt.assert_on_curve()
    # cofactor clear (x4)
    g = pt.double().double()
    assert g.value == pt_c, "elligator gadget/console divergence"
    return g, sign_c


def hash_to_group_gadget(builder: CircuitBuilder, rate: int, inputs):
    """HashToGroup_psd{rate} (hash_to_group.rs:25): hash_many(2) ->
    MapToGroup(h1) + MapToGroup(h0)."""
    from . import poseidon_gadget
    h0, h1 = poseidon_gadget.hash_psd(builder, rate, inputs, num_outputs=2)
    p1, _ = elligator2_gadget(builder, h1)
    p0, _ = elligator2_gadget(builder, h0)
    return p1 + p0
