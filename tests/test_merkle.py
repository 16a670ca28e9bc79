"""Merkle tree semantics (console/collections)."""
import random

from snarkvm_tpu.console.merkle import MerkleTree, BHPHasher, PoseidonHasher
from snarkvm_tpu.console.types import int_to_bits_le

rng = random.Random(3)


def test_poseidon_tree_roundtrip():
    h = PoseidonHasher()
    leaves = [[rng.randrange(1000)] for _ in range(5)]
    t = MerkleTree(8, h, leaves)
    for i in range(5):
        idx, sibs = t.prove(i)
        assert len(sibs) == 8
        assert t.verify(idx, sibs, leaves[i])
        assert not t.verify(idx, sibs, [[999999]][0])


def test_bhp_tree():
    h = BHPHasher()
    leaves = [int_to_bits_le(rng.randrange(1 << 64), 64) for _ in range(3)]
    t = MerkleTree(4, h, leaves)
    for i in range(3):
        idx, sibs = t.prove(i)
        assert t.verify(idx, sibs, leaves[i])


def test_depth_padding_changes_root():
    h = PoseidonHasher()
    leaves = [[1], [2]]
    t4 = MerkleTree(4, h, leaves)
    t8 = MerkleTree(8, h, leaves)
    assert t4.root != t8.root
