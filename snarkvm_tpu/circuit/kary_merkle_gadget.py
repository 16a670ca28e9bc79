"""Circuit K-ary Merkle path verification
(circuit/collections/src/kary_merkle_tree/verify.rs) over the Sha3
gadget — the puzzle's proof-target tree is
KaryMerkleTree<Sha3_256, Sha3_256, DEPTH=9?, ARITY=8>
(ledger/puzzle/src/lib.rs:70).

Per level: the leaf position's 3 bits (arity 8) mux the current digest
into its slot of the witnessed child group (the mux output is asserted
bit-equal to the current digest — binding group[pos] == current), then
the whole group hashes via sha3([true] ++ concat children bits).
"""
from __future__ import annotations

from .builder import CircuitBuilder
from .types import CBool, _bool_select
from .keccak_gadget import keccak_hash_gadget


def _mux(builder, pos_bits, options):
    """Select options[pos] (list of CBool digests) with a mux tree."""
    level = list(options)
    for bit in pos_bits:
        nxt = []
        for i in range(0, len(level), 2):
            a, b = level[i], level[i + 1] if i + 1 < len(level) else level[i]
            nxt.append([_bool_select(builder, bit, y, x)
                        for x, y in zip(a, b)])
        level = nxt
    return level[0]


def sha3_leaf_gadget(builder, leaf_bits, variant: int = 256):
    """Sha3Hasher.hash_leaf: sha3([false] ++ leaf bits)."""
    return keccak_hash_gadget(builder, "sha3", variant,
                              [CBool.constant(builder, False)] + list(leaf_bits))


def sha3_children_gadget(builder, children, variant: int = 256):
    """Sha3Hasher.hash_children: sha3([true] ++ concat children)."""
    bits = [CBool.constant(builder, True)]
    for child in children:
        bits.extend(child)
    return keccak_hash_gadget(builder, "sha3", variant, bits)


def verify_kary_merkle_path_gadget(builder: CircuitBuilder, leaf_bits,
                                   pos_bits_per_level, sibling_groups,
                                   root_bits, arity: int = 8,
                                   variant: int = 256):
    """leaf_bits: CBool list; pos_bits_per_level: per level, the leaf
    position's log2(arity) CBools (LSB first); sibling_groups: per
    level, `arity` witnessed digests (CBool lists) INCLUDING the self
    slot; root_bits: expected root digest CBools. Constrains the walk:
    group[pos] == current at every level and the final hash == root."""
    cur = sha3_leaf_gadget(builder, leaf_bits, variant)
    for pos_bits, group in zip(pos_bits_per_level, sibling_groups):
        assert len(group) == arity, "sibling group arity"
        sel = _mux(builder, pos_bits, group)
        for sb, cb in zip(sel, cur):
            builder.assert_eq(sb.lc, cb.lc)
        cur = sha3_children_gadget(builder, group, variant)
    for rb, cb in zip(root_bits, cur):
        builder.assert_eq(rb.lc, cb.lc)
    return cur
