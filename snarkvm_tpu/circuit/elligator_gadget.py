"""Circuit Elligator2 encode + HashToGroup
(circuit/algorithms/src/elligator2/encode.rs,
circuit/algorithms/src/poseidon/hash_to_group.rs).

The legendre branch is a witnessed bit pinned by satisfiability: exactly
one of curve(v), curve(-v-a) is a square on the Montgomery curve, and
the even-square-root gadget (s*s = rhs, lsb(s) = 0) is only satisfiable
on the square branch — no in-circuit legendre computation needed.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..console import network as N
from ..curves import edwards as ed
from .builder import CircuitBuilder, LinearCombination, PRIVATE
from .types import CField, CBool, CGroup, _assert_bits_lte_const

R = P.R


def elligator2_gadget(builder: CircuitBuilder, r: CField):
    """Returns (CGroup subgroup point, sign_high CBool) for nonzero r."""
    b_inv = pow(N.MONTGOMERY_B, -1, R)
    a = N.MONTGOMERY_A * b_inv % R
    b = b_inv * b_inv % R

    # console values drive the witnesses
    pt_c, sign_c = N.elligator2_encode(r.value)

    # sign_high = r > -r  <=>  r >= (R+1)/2  <=>  NOT(r <= (R-1)/2)
    rbits = r.to_bits_le(253, canonical=True)
    sign_high = ~_bits_lte_const_bool(builder, rbits, (R - 1) // 2)
    assert sign_high.value == sign_c

    ur2 = r.square().scale_const(P.EDWARDS_D)
    one_plus = ur2.add_const(1)
    # v = -a / (1 + ur2)   (div enforces the denominator nonzero)
    v = CField.constant(builder, (R - a) % R).div(one_plus)
    v2 = v.square()
    w = v2 * v + v2.scale_const(a) + v.scale_const(b)

    # branch bit: x = e ? v : (-v - a)
    e_val = N._legendre(w.value) == 1
    e = CBool.new(builder, PRIVATE, e_val)
    neg_va = CField(builder, v.lc.scale(R - 1).add(LinearCombination((R - a) % R)))
    x = v.ternary(e, neg_va)
    x2 = x.square()
    rhs = x2 * x + x2.scale_const(a) + x.scale_const(b)
    value = rhs.even_sqrt()          # unsatisfiable on the non-square branch
    y = (-value).ternary(e, value)

    u_m = x.scale_const(N.MONTGOMERY_B)
    v_m = y.scale_const(N.MONTGOMERY_B)
    # Montgomery -> Edwards: (u/v, (u-1)/(u+1))
    ex = u_m.div(v_m)
    ey = CField(builder, u_m.lc.add(LinearCombination(R - 1))).div(
        CField(builder, u_m.lc.add(LinearCombination(1))))
    pt = CGroup(builder, ex, ey)
    # cofactor clear (x4)
    g = pt.double().double()
    assert g.value == pt_c, "elligator gadget/console divergence"
    return g, sign_high


def _bits_lte_const_bool(builder, bits, bound: int) -> CBool:
    """bits <= bound as a CBool (LSB->MSB fold, constant bound)."""
    lte = CBool.constant(builder, True)
    for i, this in enumerate(bits):
        if (bound >> i) & 1:
            lte = ~this | lte
        else:
            lte = ~this & lte
    return lte


def hash_to_group_gadget(builder: CircuitBuilder, rate: int, inputs):
    """HashToGroup_psd{rate}: hash_many(2) -> Elligator2 each -> add."""
    from . import poseidon_gadget
    h0, h1 = poseidon_gadget.hash_psd(builder, rate, inputs, num_outputs=2)
    p0, _ = elligator2_gadget(builder, h0)
    p1, _ = elligator2_gadget(builder, h1)
    return p0 + p1
