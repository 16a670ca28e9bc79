"""K-ary Merkle tree (console/collections/src/kary_merkle_tree/) — used by
the puzzle as KaryMerkleTree<Sha3_256, Sha3_256, DEPTH=9, ARITY=8>.

SHA3 hashers: leaf = sha3([false] ++ leaf_bits), children =
sha3([true] ++ concat(child_bits)); hashes are 256-bit LE bit vectors.
"""
from __future__ import annotations

from ..hashes import keccak as kk


class Sha3Hasher:
    def __init__(self, variant: int = 256):
        self.variant = variant

    def hash_leaf(self, leaf_bits):
        return tuple(kk.hash_bits("sha3", self.variant, [False] + list(leaf_bits)))

    def hash_children(self, children):
        bits = [True]
        for child in children:
            bits.extend(child)
        return tuple(kk.hash_bits("sha3", self.variant, bits))

    def empty(self, arity: int):
        zero = tuple([False] * self.variant)
        return self.hash_children([zero] * arity)


class KaryMerkleTree:
    def __init__(self, depth: int, arity: int, hasher, leaves):
        assert 0 < depth <= 64 and arity > 1
        self.depth = depth
        self.arity = arity
        self.hasher = hasher
        self.number_of_leaves = len(leaves)
        # max_leaves = next power of arity >= len(leaves)
        max_leaves = 1
        while max_leaves < max(1, len(leaves)):
            max_leaves *= arity
        assert max_leaves <= arity ** depth
        self.empty_hash = hasher.empty(arity)
        hashed = [hasher.hash_leaf(l) for l in leaves]
        level = hashed + [self.empty_hash] * (max_leaves - len(hashed))
        levels = [level]
        while len(level) > 1:
            level = [hasher.hash_children(level[i : i + arity])
                     for i in range(0, len(level), arity)]
            levels.append(level)
        self.levels = levels
        tree_depth = 0
        n = max_leaves
        while n > 1:
            n //= arity
            tree_depth += 1
        root = level[0]
        for _ in range(depth - tree_depth):
            root = hasher.hash_children([root] + [self.empty_hash] * (arity - 1))
        self.root = root

    def prove(self, index: int):
        """Returns sibling groups bottom-up (each a list of arity hashes incl. self slot)."""
        sibs = []
        i = index
        for level in self.levels[:-1]:
            base = (i // self.arity) * self.arity
            group = [level[j] if j < len(level) else self.empty_hash
                     for j in range(base, base + self.arity)]
            sibs.append((i % self.arity, group))
            i //= self.arity
        return sibs

    def verify(self, index: int, siblings, leaf) -> bool:
        h = self.hasher.hash_leaf(leaf)
        for pos, group in siblings:
            if group[pos] != h:
                return False
            h = self.hasher.hash_children(group)
        # account for padding levels
        extra = self.depth - len(siblings)
        for _ in range(extra):
            h = self.hasher.hash_children([h] + [self.empty_hash] * (self.arity - 1))
        return h == self.root
