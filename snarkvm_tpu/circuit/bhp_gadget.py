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


def _hasher_gadget(builder: CircuitBuilder, bhp, tables, preimage) -> CGroup:
    """One BHP hasher block over an already-assembled preimage bit list."""
    assert bhp.min_bits < len(preimage) <= bhp.max_bits, "hasher block size"
    preimage = list(preimage)
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
