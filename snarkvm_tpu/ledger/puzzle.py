"""The coinbase puzzle (ledger/puzzle/): solver incentive machinery.

Exact pieces:
  * SolutionID = sha256d(epoch_hash_bytes[0..8] || address_x || counter) -> u64
    (solution_id/mod.rs:40);
  * leaves -> KaryMerkleTree<Sha3_256, Sha3_256, DEPTH=9, ARITY=8> -> root;
    proof_target = u64::MAX / u64(root bits 0..64 BE) (lib.rs:262);
  * check_solutions: epoch hash match + per-solution target >= proof target.

The leaves function is pluggable (PuzzleTrait, lib.rs:80). The default is
`SynthesisPuzzle` (puzzle_synthesis.py): the EpochProgram sampled from the
epoch hash, executed on inputs drawn from ChaChaRng::seed_from_u64(
solution_id) (lib.rs:106), with all circuit variable values as leaves.
`SimpleSynthesisPuzzle` remains as a cheap fixed-program stand-in for
tests that don't need the sampled programs.
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


class SynthesisPuzzle:
    """puzzle/epoch SynthesisPuzzle (synthesis/mod.rs:24): sampled
    EpochProgram per epoch hash (LRU-cached), inputs drawn from the
    per-solution ChaCha rng."""

    def __init__(self, cache_size: int = 16):
        self._programs = {}
        self._cache_size = cache_size

    def get_epoch_program(self, epoch_hash: int):
        from .puzzle_synthesis import EpochProgram
        if epoch_hash not in self._programs:
            if len(self._programs) >= self._cache_size:
                self._programs.pop(next(iter(self._programs)))
            self._programs[epoch_hash] = EpochProgram(epoch_hash)
        return self._programs[epoch_hash]

    def to_leaves(self, partial: PartialSolution):
        from ..utils.chacha import ChaCha20Rng
        program = self.get_epoch_program(partial.epoch_hash)
        rng = ChaCha20Rng.seed_from_u64(partial.id)
        return program.to_leaves(program.construct_inputs(rng))


class MerklePuzzle:
    """puzzle/epoch/src/merkle/mod.rs:36 — the pre-synthesis puzzle
    variant: leaves are uniformly random Fr elements (253 bits each).
    The leaf COUNT is an epoch constant drawn from ChaChaRng seeded by
    the first 8 LE bytes of the epoch hash, gen_range(100_000..=200_000)
    (merkle/mod.rs:70-79); leaf VALUES come from the per-solution rng."""

    MIN_NUMBER_OF_LEAVES = 100_000
    MAX_NUMBER_OF_LEAVES = 200_000

    def num_leaves(self, epoch_hash: int) -> int:
        from ..utils.chacha import ChaCha20Rng
        seed = int.from_bytes(epoch_hash.to_bytes(32, "little")[0:8], "little")
        rng = ChaCha20Rng.seed_from_u64(seed)
        return rng.gen_range_u64_inclusive(
            self.MIN_NUMBER_OF_LEAVES, self.MAX_NUMBER_OF_LEAVES)

    def to_leaves(self, partial: PartialSolution):
        from ..utils.chacha import ChaCha20Rng
        from ..params import bls12_377 as P
        n = self.num_leaves(partial.epoch_hash)
        rng = ChaCha20Rng.seed_from_u64(partial.id)
        # Field::<N>::rand = uniform Fp256 (4 u64 limbs, 3 shave bits)
        leaves = []
        for _ in range(n):
            v = rng.rand_field(P.R, 3)
            leaves.append(int_to_bits_le(v, 253))
        return leaves


MAX_SOLUTIONS = 4                  # console/network/src/lib.rs MAX_SOLUTIONS


class Puzzle:
    def __init__(self, synthesis=None, cache_size: int = 1 << 10):
        self.synthesis = synthesis or SynthesisPuzzle()
        # LRU proof-target cache (puzzle/src/lib.rs:87 LruCache)
        from collections import OrderedDict
        self._cache = OrderedDict()
        self._cache_size = cache_size

    def get_proof_target(self, partial: PartialSolution) -> int:
        key = partial.id
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        target = leaves_to_proof_target(self.synthesis.to_leaves(partial))
        self._cache[key] = target
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return target

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

    def check_solutions(self, solutions, expected_epoch_hash: int,
                        expected_proof_target: int) -> None:
        """Batch validation (puzzle/src/lib.rs:299): count limit, unique
        solution IDs, then every solution's epoch hash + proof target.
        Raises ValueError on the first violation."""
        if len(solutions) > MAX_SOLUTIONS:
            raise ValueError(
                f"{len(solutions)} solutions exceed MAX_SOLUTIONS ({MAX_SOLUTIONS})")
        ids = [s.partial.id for s in solutions]
        if len(set(ids)) != len(ids):
            raise ValueError("duplicate solution IDs in the batch")
        for s in solutions:
            if s.partial.epoch_hash != expected_epoch_hash:
                raise ValueError(f"solution {s.partial.id} has a stale epoch hash")
            if not self.check_solution(s, expected_epoch_hash, expected_proof_target):
                raise ValueError(f"solution {s.partial.id} fails the proof target")
