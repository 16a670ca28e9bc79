"""Circuit BHP hasher (circuit/algorithms/src/bhp/ mirror).

Per 3-bit chunk (b0, b1, b2) against the window's base table
[G, 2G, 3G, 4G]: bilinear select of the magnitude point
  x = x1 + b0(x2-x1) + b1(x3-x1) + b0·b1(x4-x3-x2+x1)
then conditional x-negation by b2 (Edwards negation flips x), and a
complete Edwards add into the accumulator.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..hashes.bhp import BHP, VARIANTS, CHUNK, FIELD_DATA_BITS
from ..console import network as N
from .builder import CircuitBuilder, LinearCombination, PRIVATE
from .types import CField, CBool, CGroup

R = P.R


# Montgomery form of the Edwards curve (curves/src/edwards_bls12/
# parameters.rs:65): the BHP hasher accumulates on the Montgomery curve
# B*v^2 = u^3 + A*u^2 + u with incomplete 3-constraint adds
MONTGOMERY_A = 3990301581132929505568273333084066329187552697088022219156688740916631500114
MONTGOMERY_B = 4454160168295440918680551605697480202188346638066041608778544715000777738925
_HALF = pow(2, -1, R)


def _to_montgomery(pt):
    """Edwards (x, y) -> Montgomery (u, v): u = (1+y)/(1-y), v = u/x
    (circuit/algorithms/src/bhp/hasher/mod.rs:79-81)."""
    x, y = pt
    u = (1 + y) * pow((1 - y) % R, -1, R) % R
    v = u * pow(x, -1, R) % R
    return u, v


def _chunk_tables(bhp: BHP):
    """Per window per chunk: MONTGOMERY [(u,v)] for multiples 1..4 of
    the base (BHP_LOOKUP_SIZE = 4)."""
    tables = []
    for window in bhp.bases:
        wt = []
        for base_ext in window:
            base = ed.to_affine(base_ext)
            mults = [base]
            for _ in range(3):
                mults.append(ed.add(mults[-1], base))
            wt.append([_to_montgomery(m) for m in mults])
        tables.append(wt)
    return tables


def bhp_hash_gadget(builder: CircuitBuilder, variant: int, domain: str, bits):
    """bits: list of CBool. Returns the digest CField (x-coordinate)."""
    return bhp_hash_point_gadget(builder, variant, domain, bits).x


def _montgomery_add(builder, this, that):
    """Incomplete Montgomery addition, 3 constraints
    (bhp/hasher/hash_uncompressed.rs:70-97): witness lambda, sum_x,
    sum_y with
      (that_x - this_x) * lambda = (that_y - this_y)
      (B * lambda) * lambda      = (A + this_x + that_x + sum_x)
      (this_x - sum_x) * lambda  = (this_y + sum_y)"""
    this_x, this_y = this
    that_x, that_y = that
    x1v, y1v = this_x.value, this_y.value
    x2v, y2v = that_x.value, that_y.value
    lam_v = (y2v - y1v) * pow((x2v - x1v) % R, -1, R) % R
    if (this_x.is_constant() and this_y.is_constant()
            and that_x.is_constant() and that_y.is_constant()):
        # all-constant add folds away (witnesses allocate in Constant
        # mode; every row is all-constant and dropped)
        sx = (MONTGOMERY_B * lam_v % R * lam_v - MONTGOMERY_A - x1v - x2v) % R
        sy = (-(y1v + lam_v * (sx - x1v))) % R
        return CField.constant(builder, sx), CField.constant(builder, sy)
    lam = CField.new(builder, PRIVATE, lam_v)
    builder.enforce(that_x.lc.add(this_x.lc, R - 1), lam.lc,
                    that_y.lc.add(this_y.lc, R - 1))
    sum_x_v = (MONTGOMERY_B * lam_v % R * lam_v - MONTGOMERY_A - x1v - x2v) % R
    sum_x = CField.new(builder, PRIVATE, sum_x_v)
    builder.enforce(lam.lc.scale(MONTGOMERY_B), lam.lc,
                    LinearCombination(MONTGOMERY_A).add(this_x.lc)
                    .add(that_x.lc).add(sum_x.lc))
    sum_y_v = (-(y1v + lam_v * (sum_x_v - x1v))) % R
    sum_y = CField.new(builder, PRIVATE, sum_y_v)
    builder.enforce(this_x.lc.add(sum_x.lc, R - 1), lam.lc,
                    this_y.lc.add(sum_y.lc))
    return sum_x, sum_y


def _hasher_gadget(builder: CircuitBuilder, bhp, tables, preimage) -> CGroup:
    """One BHP hasher block over an already-assembled preimage bit list
    (bhp/hasher/hash_uncompressed.rs:31): per 3-bit chunk, a bilinear
    Montgomery-point select (1 AND constraint), a 1-constraint
    conditional y-negation, and a 3-constraint incomplete Montgomery
    add; per window, a 2-constraint Montgomery->Edwards conversion and a
    complete Edwards add into the accumulator."""
    assert bhp.min_bits < len(preimage) <= bhp.max_bits, "hasher block size"
    preimage = list(preimage)
    while len(preimage) % CHUNK:
        preimage.append(CBool.constant(builder, False))

    acc = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    per_window = bhp.window_size * CHUNK
    for w in range(0, len(preimage), per_window):
        wbits = preimage[w : w + per_window]
        sum_xy = None
        for i in range(0, len(wbits), CHUNK):
            b0 = wbits[i]
            b1 = wbits[i + 1] if i + 1 < len(wbits) else CBool.constant(builder, False)
            b2 = wbits[i + 2] if i + 2 < len(wbits) else CBool.constant(builder, False)
            mults = tables[w // per_window][i // CHUNK]
            (x1, y1), (x2, y2), (x3, y3), (x4, y4) = mults
            b01 = b0 & b1                              # 1 constraint
            # bilinear Montgomery select (linear in b0, b1, b01)
            mx_lc = LinearCombination(x1)
            mx_lc = mx_lc.add(b0.lc, (x2 - x1) % R)
            mx_lc = mx_lc.add(b1.lc, (x3 - x1) % R)
            mx_lc = mx_lc.add(b01.lc, (x4 - x3 - x2 + x1) % R)
            y_lc = LinearCombination(y1)
            y_lc = y_lc.add(b0.lc, (y2 - y1) % R)
            y_lc = y_lc.add(b1.lc, (y3 - y1) % R)
            y_lc = y_lc.add(b01.lc, (y4 - y3 - y2 + y1) % R)
            mx = CField(builder, mx_lc)
            y_sel = CField(builder, y_lc)
            # conditional negation as a custom 1-constraint witness
            # (hash_uncompressed.rs:136): (-2y) * (b2 - 1/2) = my
            y_v = y_sel.value
            my_v = (R - y_v) % R if b2.value else y_v
            if y_sel.is_constant() and b2.is_constant():
                my = CField.constant(builder, my_v)
            else:
                my = CField.new(builder, PRIVATE, my_v)
                builder.enforce(y_lc.scale(R - 2),
                                b2.lc.add(LinearCombination((R - _HALF) % R)),
                                my.lc)
            if sum_xy is None:
                sum_xy = (mx, my)
            else:
                sum_xy = _montgomery_add(builder, sum_xy, (mx, my))
        # Montgomery -> twisted Edwards (hash_uncompressed.rs:170):
        # edwards_x = sum_x / sum_y, edwards_y = (sum_x - 1)/(sum_x + 1),
        # one div_unchecked constraint each: (quotient, divisor, dividend)
        sum_x, sum_y = sum_xy
        sxv, syv = sum_x.value, sum_y.value
        ex_v = sxv * pow(syv, -1, R) % R
        den = (sxv + 1) % R
        ey_v = (sxv - 1) % R * pow(den if den else 1, -1, R) % R
        if sum_x.is_constant() and sum_y.is_constant():
            ex = CField.constant(builder, ex_v)
            ey = CField.constant(builder, ey_v)
        else:
            ex = CField.new(builder, PRIVATE, ex_v)
            builder.enforce(ex.lc, sum_y.lc, sum_x.lc)
            ey = CField.new(builder, PRIVATE, ey_v)
            builder.enforce(ey.lc, sum_x.lc.add(LinearCombination(1)),
                            sum_x.lc.add(LinearCombination(R - 1)))
        acc = acc + CGroup(builder, ex, ey)
    return acc


def bhp_hash_point_gadget(builder: CircuitBuilder, variant: int, domain: str,
                          bits) -> CGroup:
    """Point-valued BHP hash (hash_uncompressed) with MULTI-BLOCK
    chaining: block 0 hashes domain ++ u64 length ++ data; block i>0
    hashes the previous digest-x's low FIELD_DATA_BITS bits ++ data
    (circuit/algorithms/src/bhp/hash_uncompressed.rs)."""
    bhp = N._bhp(variant)
    tables = _chunk_tables(bhp)
    max_input_per_iter = bhp.max_bits - FIELD_DATA_BITS
    bits = list(bits)
    chunks = [bits[i : i + max_input_per_iter]
              for i in range(0, max(len(bits), 1), max_input_per_iter)]
    digest = None
    for i, input_bits in enumerate(chunks):
        if i == 0:
            preimage = [CBool.constant(builder, b) for b in bhp.domain_bits]
            preimage += [CBool.constant(builder, (len(bits) >> j) & 1 == 1)
                         for j in range(64)]
            preimage += input_bits
        else:
            xbits = digest.x.to_bits_le(253, canonical=True)
            preimage = xbits[:FIELD_DATA_BITS] + input_bits
        digest = _hasher_gadget(builder, bhp, tables, preimage)
    return digest


def bhp_hash_gadget_check(builder, variant, domain, bit_values):
    """Convenience: inject bits privately and return (gadget_out, console_out)."""
    bits = [CBool.new(builder, PRIVATE, b) for b in bit_values]
    out = bhp_hash_gadget(builder, variant, domain, bits)
    console = N.hash_bhp(variant, list(bit_values))
    return out, console
