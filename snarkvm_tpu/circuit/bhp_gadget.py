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


def _chunk_tables(bhp: BHP):
    """Per window per chunk: affine [(x,y)] for multiples 1..4 of the base."""
    tables = []
    for window in bhp.bases:
        wt = []
        for base_ext in window:
            base = ed.to_affine(base_ext)
            mults = [base]
            for _ in range(3):
                mults.append(ed.add(mults[-1], base))
            wt.append(mults)
        tables.append(wt)
    return tables


def bhp_hash_gadget(builder: CircuitBuilder, variant: int, domain: str, bits):
    """bits: list of CBool. Returns the digest CField (x-coordinate)."""
    return bhp_hash_point_gadget(builder, variant, domain, bits).x


def bhp_hash_point_gadget(builder: CircuitBuilder, variant: int, domain: str,
                          bits) -> CGroup:
    """Point-valued BHP hash (hash_uncompressed): the commit gadget adds
    the randomizer term onto this. Single-iteration inputs only
    (<= max_bits - data bits), like the first block of
    BHP::hash_uncompressed."""
    bhp = N._bhp(variant)
    tables = _chunk_tables(bhp)
    # preimage = domain bits ++ u64 length ++ input bits (as constants + vars)
    preimage = [CBool.constant(builder, b) for b in bhp.domain_bits]
    length = len(bits)
    preimage += [CBool.constant(builder, (length >> i) & 1 == 1) for i in range(64)]
    preimage += list(bits)
    assert bhp.min_bits < len(preimage) <= bhp.max_bits, "BHP gadget single-block input"
    # pad to chunk multiple
    while len(preimage) % CHUNK:
        preimage.append(CBool.constant(builder, False))

    acc = None
    per_window = bhp.window_size * CHUNK
    for w in range(0, len(preimage), per_window):
        wbits = preimage[w : w + per_window]
        for i in range(0, len(wbits), CHUNK):
            b0, b1 = wbits[i], wbits[i + 1] if i + 1 < len(wbits) else CBool.constant(builder, False)
            b2 = wbits[i + 2] if i + 2 < len(wbits) else CBool.constant(builder, False)
            mults = tables[w // per_window][i // CHUNK]
            (x1, y1), (x2, y2), (x3, y3), (x4, y4) = mults
            b01 = b0 & b1
            # bilinear selects (linear in b0, b1, b01)
            x_lc = LinearCombination(x1)
            x_lc = x_lc.add(b0.lc, (x2 - x1) % R)
            x_lc = x_lc.add(b1.lc, (x3 - x1) % R)
            x_lc = x_lc.add(b01.lc, (x4 - x3 - x2 + x1) % R)
            y_lc = LinearCombination(y1)
            y_lc = y_lc.add(b0.lc, (y2 - y1) % R)
            y_lc = y_lc.add(b1.lc, (y3 - y1) % R)
            y_lc = y_lc.add(b01.lc, (y4 - y3 - y2 + y1) % R)
            x_sel = CField(builder, x_lc)
            y_sel = CField(builder, y_lc)
            # conditional negate: x' = x_sel * (1 - 2*b2)
            sign = CField(builder, LinearCombination(1).add(b2.lc, R - 2))
            x_fin = x_sel * sign
            pt = CGroup(builder, x_fin, y_sel)
            acc = pt if acc is None else acc + pt
    return acc


def bhp_hash_gadget_check(builder, variant, domain, bit_values):
    """Convenience: inject bits privately and return (gadget_out, console_out)."""
    bits = [CBool.new(builder, PRIVATE, b) for b in bit_values]
    out = bhp_hash_gadget(builder, variant, domain, bits)
    console = N.hash_bhp(variant, list(bit_values))
    return out, console
