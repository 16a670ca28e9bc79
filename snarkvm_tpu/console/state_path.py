"""StatePath: Merkle inclusion from the global state root down to a
transition output (console/program/src/state_path/).

Tree depths (state_path/configuration/mod.rs:30-67):
  BLOCKS_DEPTH=32, HEADER_DEPTH=3, RATIFICATIONS_DEPTH=16,
  TRANSACTIONS_DEPTH=20, TRANSACTION_DEPTH=5, TRANSITION_DEPTH=5,
  SUBDAG_CERTIFICATES_DEPTH=16.

verify: transition leaf -> transaction tree -> transactions tree ->
block header tree -> block-hash path -> global state root, with the
`is_global` switch for local roots (state_path/verify.rs semantics;
the in-circuit version is the inclusion circuit).
"""
from __future__ import annotations

from dataclasses import dataclass

from .merkle import MerkleTree, BHPHasher
from .types import int_to_bits_le

BLOCKS_DEPTH = 32
HEADER_DEPTH = 3
RATIFICATIONS_DEPTH = 16
TRANSACTIONS_DEPTH = 20
TRANSACTION_DEPTH = 5
TRANSITION_DEPTH = 5
SUBDAG_CERTIFICATES_DEPTH = 16

_BHP = BHPHasher(1024, 512)


def _field_leaf(v: int):
    return int_to_bits_le(v, 253)


@dataclass
class MerklePathStep:
    index: int
    siblings: list


@dataclass
class StatePath:
    global_state_root: int
    # per-level (leaf_value, path) bottom-up
    transition_leaf: int
    transition_path: MerklePathStep
    transaction_id: int
    transaction_path: MerklePathStep
    transactions_root: int
    transactions_path: MerklePathStep
    header_root: int
    header_path: MerklePathStep
    block_hash: int
    block_path: MerklePathStep

    def verify(self, is_global: bool = True, local_root: int = 0) -> bool:
        def check(depth, leaf_value, step, expected_root):
            h = _BHP.hash_leaf(_field_leaf(leaf_value))
            i = step.index
            for sib in step.siblings:
                h = (_BHP.hash_children(h, sib) if i % 2 == 0
                     else _BHP.hash_children(sib, h))
                i >>= 1
            return len(step.siblings) == depth and h == expected_root

        if not check(TRANSITION_DEPTH, self.transition_leaf, self.transition_path,
                     self.transaction_id):
            return False
        if not check(TRANSACTION_DEPTH, self.transaction_id, self.transaction_path,
                     self.transactions_root):
            return False
        if not check(TRANSACTIONS_DEPTH, self.transactions_root, self.transactions_path,
                     self.header_root):
            return False
        if not check(HEADER_DEPTH, self.header_root, self.header_path, self.block_hash):
            return False
        if is_global:
            return check(BLOCKS_DEPTH, self.block_hash, self.block_path,
                         self.global_state_root)
        return self.transaction_id == local_root or self.global_state_root == local_root


def build_state_path(transition_leaf_value: int, tree_specs) -> StatePath:
    """Construct a StatePath from per-level trees; tree_specs is a list of
    (leaves, index) bottom-up for the 5 levels."""
    values = [transition_leaf_value]
    steps = []
    for leaves, index in tree_specs:
        depth = [TRANSITION_DEPTH, TRANSACTION_DEPTH, TRANSACTIONS_DEPTH,
                 HEADER_DEPTH, BLOCKS_DEPTH][len(steps)]
        tree = MerkleTree(depth, _BHP, [_field_leaf(l) for l in leaves])
        idx, sibs = tree.prove(index)
        steps.append(MerklePathStep(idx, sibs))
        values.append(tree.root)
    return StatePath(
        global_state_root=values[5],
        transition_leaf=values[0], transition_path=steps[0],
        transaction_id=values[1], transaction_path=steps[1],
        transactions_root=values[2], transactions_path=steps[2],
        header_root=values[3], header_path=steps[3],
        block_hash=values[4], block_path=steps[4],
    )
