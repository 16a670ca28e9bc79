"""The coinbase puzzle (ledger/puzzle/): solver incentive machinery.

Exact pieces:
  * SolutionID = sha256d(epoch_hash_bytes[0..8] || address_x || counter) -> u64
    (solution_id/mod.rs:40);
  * leaves -> KaryMerkleTree<Sha3_256, Sha3_256, DEPTH=9, ARITY=8> -> root;
    proof_target = u64::MAX / u64(root bits 0..64 BE) (lib.rs:262);
  * check_solutions: epoch hash match + per-solution target >= proof target.

The leaves function is pluggable (PuzzleTrait). `SimpleSynthesisPuzzle`
runs a small deterministic program through the circuit layer and uses all
variable values as leaves (the reference's EpochProgram samples a
pseudo-random instruction sequence from the epoch hash —
puzzle/epoch/src/synthesis/; the exact sampling tables are a round-2
parity item, tracked in ROADMAP.md).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..console.kary_merkle import KaryMerkleTree, Sha3Hasher
from ..console.types import int_to_bits_le

DEPTH = 9
ARITY = 8
U64_MAX = (1 << 64) - 1


def sha256d_to_u64(data: bytes) -> int:
    d = hashlib.sha256(hashlib.sha256(data).digest()).digest()
    return int.from_bytes(d[0:8], "little")


def solution_id(epoch_hash: int, address_x: int, counter: int) -> int:
    data = (epoch_hash.to_bytes(32, "little")[0:8]
            + address_x.to_bytes(32, "little")
            + counter.to_bytes(8, "little"))
    return sha256d_to_u64(data)


@dataclass(frozen=True)
class PartialSolution:
    epoch_hash: int
    address_x: int
    counter: int

    @property
    def id(self) -> int:
        return solution_id(self.epoch_hash, self.address_x, self.counter)


@dataclass(frozen=True)
class Solution:
    partial: PartialSolution
    target: int


def leaves_to_proof_target(leaves) -> int:
    tree = KaryMerkleTree(DEPTH, ARITY, Sha3Hasher(256), leaves)
    root_bits = tree.root  # LE bit tuple (256)
    # u64 from the first 64 bits interpreted big-endian (lib.rs:265)
    v = 0
    for b in root_bits[0:64]:
        v = (v << 1) | int(b)
    return U64_MAX if v == 0 else U64_MAX // v


class SimpleSynthesisPuzzle:
    """Deterministic stand-in synthesis: a fixed arithmetic program whose
    inputs derive from the solution ID; leaves = all circuit variable values
    (public then private), padded to a power of 8 with 254 zero bits."""

    def to_leaves(self, partial: PartialSolution):
        from ..circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
        from ..circuit.types import CField
        from ..params import bls12_377 as P

        sid = partial.id
        b = CircuitBuilder()
        x = CField.new(b, PUBLIC, sid)
        y = CField.new(b, PRIVATE, partial.epoch_hash % P.R)
        acc = x
        for i in range(16):
            acc = acc * y
            acc = acc + CField.constant(b, i + 1)
            y = y.square()
        assert b.is_satisfied()
        leaves = [int_to_bits_le(v, 253) for v in b.public + b.private]
        n = 1
        while n < len(leaves):
            n *= ARITY
        leaves += [[False] * 254] * (n - len(leaves))
        return leaves


class Puzzle:
    def __init__(self, synthesis=None):
        self.synthesis = synthesis or SimpleSynthesisPuzzle()
        self._cache = {}

    def get_proof_target(self, partial: PartialSolution) -> int:
        key = partial.id
        if key not in self._cache:
            self._cache[key] = leaves_to_proof_target(self.synthesis.to_leaves(partial))
        return self._cache[key]

    def prove(self, epoch_hash: int, address_x: int, counter: int,
              minimum_proof_target: int | None = None) -> Solution:
        partial = PartialSolution(epoch_hash, address_x, counter)
        target = self.get_proof_target(partial)
        if minimum_proof_target is not None and target < minimum_proof_target:
            raise ValueError(f"solution below minimum proof target ({target})")
        return Solution(partial, target)

    def check_solution(self, solution: Solution, expected_epoch_hash: int,
                       expected_proof_target: int) -> bool:
        if solution.partial.epoch_hash != expected_epoch_hash:
            return False
        target = self.get_proof_target(solution.partial)
        return target == solution.target and target >= expected_proof_target
