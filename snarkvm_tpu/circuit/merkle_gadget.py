"""Circuit Merkle path verification (circuit/collections/src/merkle_path/)
over the BHP gadget — the building block of the inclusion circuit
(circuit/program/src/state_path/verify.rs).

Path walk: at level i, (left, right) = index_bit ? (sibling, node)
: (node, sibling); node' = BHP512([1] ++ bits(left) ++ bits(right)).
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..console import network as N
from .builder import CircuitBuilder, PRIVATE
from .types import CField, CBool
from .bhp_gadget import bhp_hash_gadget

R = P.R


def _hash_children_gadget(builder, left: CField, right: CField) -> CField:
    bits = [CBool.constant(builder, True)]
    bits += left.to_bits_le(253)
    bits += right.to_bits_le(253)
    # children hash uses BHP512 with a leading true bit but WITHOUT the
    # domain/length preamble being re-applied per node? The console
    # PathHash hashes through BHP::hash (domain + length + input), so the
    # gadget mirrors bhp_hash_gadget which prepends both.
    return bhp_hash_gadget(builder, 512, "AleoBHP512", bits)


def verify_merkle_path_gadget(builder, leaf_hash: CField, index_bits, siblings,
                              expected_root: CField):
    """index_bits: CBool list (LSB first); siblings: CField list.
    Constrains the walk to reach expected_root.

    The condition is the NEGATED index bit, as in the reference
    (merkle_tree/verify.rs:43 `indicators = bits.map(|b| !b)`): the
    `!bit` LC spans {one, bit}, so each ternary contributes TWO B-side
    nz entries — load-bearing for matrix parity with shipped keys."""
    node = leaf_hash
    for bit, sib in zip(index_bits, siblings):
        indicator = ~bit
        left = node.ternary(indicator, sib)
        right = sib.ternary(indicator, node)
        node = _hash_children_gadget(builder, left, right)
    node.assert_eq(expected_root)
    return node


def hash_leaf_gadget(builder, leaf_bits) -> CField:
    """BHP1024 leaf hash: [0] ++ bits."""
    bits = [CBool.constant(builder, False)] + list(leaf_bits)
    return bhp_hash_gadget(builder, 1024, "AleoBHP1024", bits)
