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


def test_state_path_roundtrip():
    from snarkvm_tpu.console.state_path import build_state_path
    leaf = 12345
    # five levels: transition -> transaction -> transactions -> header -> blocks
    sp = build_state_path(leaf, [
        ([leaf, 2, 3], 0),
        (None, 0),  # placeholder; patched below
        (None, 0),
        (None, 0),
        (None, 0),
    ]) if False else None
    # build level-by-level with real parent values
    from snarkvm_tpu.console.state_path import (
        MerkleTree, _BHP, _field_leaf, MerklePathStep, StatePath,
        TRANSITION_DEPTH, TRANSACTION_DEPTH, TRANSACTIONS_DEPTH, HEADER_DEPTH, BLOCKS_DEPTH)
    depths = [TRANSITION_DEPTH, TRANSACTION_DEPTH, TRANSACTIONS_DEPTH, HEADER_DEPTH, BLOCKS_DEPTH]
    values = [leaf]
    steps = []
    for d in depths:
        leaves = [values[-1], 7, 8]
        tree = MerkleTree(d, _BHP, [_field_leaf(l) for l in leaves])
        idx, sibs = tree.prove(0)
        steps.append(MerklePathStep(idx, sibs))
        values.append(tree.root)
    sp = StatePath(values[5], values[0], steps[0], values[1], steps[1],
                   values[2], steps[2], values[3], steps[3], values[4], steps[4])
    assert sp.verify()
    sp.transition_leaf = (leaf + 1)
    assert not sp.verify()
