"""Binary Merkle tree (console/collections/src/merkle_tree/) over BHP or
Poseidon hashers, with paths and DEPTH-padding semantics matching the
reference exactly (empty hash = H(0,0); root padded with empty hashes).
"""
from __future__ import annotations

from . import network as N
from .types import int_to_bits_le, FIELD_BITS


class BHPHasher:
    """LeafHash+PathHash over BHP{variant} (leaf: [false]+bits; children:
    [true]+left+right bits)."""

    def __init__(self, leaf_variant=1024, path_variant=512):
        self.leaf_variant = leaf_variant
        self.path_variant = path_variant

    def hash_leaf(self, leaf_bits):
        return N.hash_bhp(self.leaf_variant, [False] + list(leaf_bits))

    def hash_children(self, left: int, right: int):
        bits = [True] + int_to_bits_le(left, FIELD_BITS) + int_to_bits_le(right, FIELD_BITS)
        return N.hash_bhp(self.path_variant, bits)


class PoseidonHasher:
    """LeafHash+PathHash over Poseidon{rate} (leaf: [0]+fields; children: [1,l,r])."""

    def __init__(self, leaf_rate=4, path_rate=2):
        self.leaf_rate = leaf_rate
        self.path_rate = path_rate

    def hash_leaf(self, leaf_fields):
        return N.hash_psd(self.leaf_rate, [0] + list(leaf_fields))

    def hash_children(self, left: int, right: int):
        return N.hash_psd(self.path_rate, [1, left, right])


class MerkleTree:
    def __init__(self, depth: int, hasher, leaves):
        """leaves: list of leaf inputs (bit lists for BHP, field lists for Poseidon)."""
        assert 0 < depth <= 64
        self.depth = depth
        self.hasher = hasher
        self.number_of_leaves = len(leaves)
        max_leaves = 1 if not leaves else 1 << max(0, (len(leaves) - 1)).bit_length()
        assert max_leaves <= (1 << depth), "too many leaves for depth"
        num_nodes = max_leaves - 1
        tree_depth = max_leaves.bit_length() - 1
        padding_depth = depth - tree_depth
        self.empty_hash = hasher.hash_children(0, 0)

        hashed = [hasher.hash_leaf(l) for l in leaves]
        # pad hashed leaves to even count within the allocated level
        level = hashed + [self.empty_hash] * (max_leaves - len(hashed))
        levels = [level]
        while len(level) > 1:
            level = [hasher.hash_children(level[i], level[i + 1]) for i in range(0, len(level), 2)]
            levels.append(level)
        self.levels = levels  # levels[0] = leaf hashes ... levels[-1] = [subroot]
        root = level[0] if level else self.empty_hash
        for _ in range(padding_depth):
            root = hasher.hash_children(root, self.empty_hash)
        self.root = root
        self.padding_depth = padding_depth

    def prove(self, index: int):
        """Returns (leaf_index, siblings bottom-up incl. padding levels)."""
        assert index < max(self.number_of_leaves, 1)
        siblings = []
        i = index
        for level in self.levels[:-1]:
            sib = i ^ 1
            siblings.append(level[sib] if sib < len(level) else self.empty_hash)
            i >>= 1
        siblings += [self.empty_hash] * self.padding_depth
        return index, siblings

    def verify(self, index: int, siblings, leaf, root=None) -> bool:
        h = self.hasher.hash_leaf(leaf)
        i = index
        for sib in siblings:
            h = self.hasher.hash_children(h, sib) if i % 2 == 0 else self.hasher.hash_children(sib, h)
            i >>= 1
        return h == (root if root is not None else self.root)
