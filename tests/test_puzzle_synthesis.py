"""Epoch synthesis puzzle: sampler determinism + rand-crate algorithm checks.

Covers ledger/puzzle/epoch/src/synthesis/ (sampler, register table, program
assembly) and the rand 0.8 distribution algorithms in utils/chacha.py.
"""
import pytest

from snarkvm_tpu.utils.chacha import ChaCha20Rng, WeightedIndex, seed_bytes_from_u64
from snarkvm_tpu.ledger.puzzle_synthesis import (
    EpochProgram, RegisterTable, sample_instructions, instruction_set,
    NUM_PREAMBLE_INSTRUCTIONS, INPUT_BLOCK,
)


class TestRandAlgorithms:
    def test_seed_from_u64_expansion_is_pcg32(self):
        # self-golden: locks the PCG32 expansion (rand_core seed_from_u64)
        s0 = seed_bytes_from_u64(0)
        s1 = seed_bytes_from_u64(1)
        assert len(s0) == 32 and s0 != s1
        assert seed_bytes_from_u64(0) == s0
        # PCG32 first output for state advanced from 0 with the rand_core
        # constants: state = INC, then xorshift/rotate
        mul, inc = 6364136223846793005, 11634580027462260723
        state = (0 * mul + inc) % (1 << 64)
        xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
        rot = state >> 59
        expected = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF
        assert int.from_bytes(s0[:4], "little") == expected

    def test_stream_word_semantics(self):
        rng1 = ChaCha20Rng.seed_from_u64(7)
        rng2 = ChaCha20Rng.seed_from_u64(7)
        # next_u64 = two consecutive u32 words (lo, hi)
        a, b = rng1.next_u32(), rng1.next_u32()
        assert rng2.next_u64() == (b << 32) | a

    def test_gen_bool_is_sign_bit(self):
        rng1 = ChaCha20Rng.seed_from_u64(3)
        rng2 = ChaCha20Rng.seed_from_u64(3)
        for _ in range(64):
            w = rng1.next_u32()
            assert rng2.gen_bool() == (w >> 31 == 1)

    def test_gen_uint_consumption(self):
        # u8/u16/u32 burn one u32 word; u64 one u64; u128 two u64s (lo first)
        rng1 = ChaCha20Rng.seed_from_u64(9)
        rng2 = ChaCha20Rng.seed_from_u64(9)
        w = rng1.next_u32()
        assert rng2.gen_uint(8) == w & 0xFF
        w = rng1.next_u32()
        assert rng2.gen_uint(16) == w & 0xFFFF
        lo, hi = rng1.next_u64(), rng1.next_u64()
        assert rng2.gen_uint(128) == (hi << 64) | lo

    def test_gen_int_twos_complement(self):
        rng = ChaCha20Rng.seed_from_u64(11)
        vals = [rng.gen_int(8) for _ in range(200)]
        assert all(-128 <= v <= 127 for v in vals)
        assert any(v < 0 for v in vals) and any(v >= 0 for v in vals)

    def test_weighted_index_matches_linear_scan(self):
        weights = [0, 5, 0, 1, 10, 0, 3]
        widx = WeightedIndex(weights)
        rng = ChaCha20Rng.seed_from_u64(42)
        # reproduce: uniform draw in [0, total), walk cumulative
        for _ in range(500):
            shadow = ChaCha20Rng(rng.key)
            shadow.counter, shadow.buffer = rng.counter, rng.buffer
            chosen = shadow.gen_range_u32(sum(weights))
            idx = widx.sample(rng)
            acc = 0
            expect = None
            for i, w in enumerate(weights):
                acc += w
                if chosen < acc:
                    expect = i
                    break
            assert idx == expect
            assert weights[idx] > 0  # zero-weight entries are never drawn

    def test_rand_field_is_montgomery_repr(self):
        from snarkvm_tpu.params import bls12_377 as P
        rng1 = ChaCha20Rng.seed_from_u64(5)
        rng2 = ChaCha20Rng.seed_from_u64(5)
        v = rng1.rand_field(P.R, 3)
        # reproduce by hand: limbs -> shave -> reject -> * R^-1
        r_inv = pow(1 << 256, -1, P.R)
        while True:
            repr_ = sum(rng2.next_u64() << (64 * i) for i in range(4))
            repr_ &= (1 << 253) - 1
            if repr_ < P.R:
                break
        assert v == repr_ * r_inv % P.R


class TestInstructionTable:
    def test_table_shape(self):
        table = instruction_set()
        assert len(table) == 2540
        assert sum(e["weight"] for e in table) == 22904
        assert sum(1 for e in table if e["weight"] > 0) == 312
        assert max(len(e["sequence"]) for e in table) <= 4

    def test_register_table_init(self):
        t = RegisterTable()
        assert t.next_register_locator == 40
        assert t.get_k_th_last_register("I8", 0) == "r35"
        assert t.get_k_th_last_register("I8", 1) == "r3"
        assert t.get_k_th_last_register("I8", 5) == "r3"  # saturates
        assert t.get_input_at_index("Field", 1) == "r13"
        assert t.get_input_at_index("U8", 0) is None
        assert NUM_PREAMBLE_INSTRUCTIONS == 26
        assert INPUT_BLOCK.count(";") == 14 + 26


class TestSampler:
    def test_deterministic_and_bounded(self):
        t1, t2 = RegisterTable(), RegisterTable()
        i1 = sample_instructions(0, t1)
        i2 = sample_instructions(0, t2)
        assert i1 == i2
        assert 90 <= len(i1) <= 100
        assert len(set(i1)) == len(i1)  # IndexSet: no duplicates
        # locators are handed out sequentially from 40
        assert i1[0].split(" into ")[1].split(" ")[0].rstrip(";").startswith("r40")

    def test_different_epochs_differ(self):
        a = sample_instructions(1, RegisterTable())
        b = sample_instructions(2, RegisterTable())
        assert a != b

    def test_typed_opcode_suffix(self):
        # every cast/commit/hash instruction carries an `as <type>` suffix
        for ih in (0, 99):
            for inst in sample_instructions(ih, RegisterTable()):
                opc = inst.split(" ")[0]
                if opc.startswith(("cast", "commit.", "hash.")):
                    assert " as " in inst, inst


class TestEpochProgram:
    def test_program_parses_and_executes(self):
        ep = EpochProgram(0)
        rng = ChaCha20Rng.seed_from_u64(0)
        inputs = ep.construct_inputs(rng)
        assert len(inputs) == 14
        leaves = ep.to_leaves(inputs)
        # power of ARITY=8
        n = len(leaves)
        while n > 1:
            assert n % 8 == 0
            n //= 8
        # deterministic
        rng2 = ChaCha20Rng.seed_from_u64(0)
        assert ep.to_leaves(ep.construct_inputs(rng2)) == leaves
        # different solution rng -> different leaves
        rng3 = ChaCha20Rng.seed_from_u64(1)
        assert ep.to_leaves(ep.construct_inputs(rng3)) != leaves

    def test_synthesis_puzzle_lifecycle(self):
        from snarkvm_tpu.ledger.puzzle import Puzzle
        p = Puzzle()
        sol = p.prove(555, 77, counter=1)
        assert p.check_solution(sol, 555, 0)
        assert not p.check_solution(sol, 556, 0)


class TestCheckSolutions:
    """Batch validation (puzzle/src/lib.rs:299) + the LRU target cache."""

    def _mk(self):
        from snarkvm_tpu.ledger.puzzle import (
            Puzzle, SimpleSynthesisPuzzle, PartialSolution, Solution)
        return Puzzle(SimpleSynthesisPuzzle()), PartialSolution, Solution

    def test_batch_happy_path_and_limits(self):
        import pytest
        from snarkvm_tpu.ledger.puzzle import MAX_SOLUTIONS
        puzzle, PartialSolution, Solution = self._mk()
        epoch = 77
        sols = [puzzle.prove(epoch, 1000 + i, i) for i in range(MAX_SOLUTIONS)]
        floor = min(s.target for s in sols)
        puzzle.check_solutions(sols, epoch, floor)          # passes
        with pytest.raises(ValueError, match="MAX_SOLUTIONS"):
            extra = sols + [puzzle.prove(epoch, 4242, 99)]
            puzzle.check_solutions(extra, epoch, 0)
        with pytest.raises(ValueError, match="duplicate"):
            puzzle.check_solutions([sols[0], sols[0]], epoch, 0)
        with pytest.raises(ValueError, match="stale epoch"):
            puzzle.check_solutions(sols, epoch + 1, 0)
        with pytest.raises(ValueError, match="proof target"):
            puzzle.check_solutions(sols, epoch, floor * 2 + 10)

    def test_lru_cache_bounded(self):
        from snarkvm_tpu.ledger.puzzle import Puzzle, SimpleSynthesisPuzzle, PartialSolution
        puzzle = Puzzle(SimpleSynthesisPuzzle(), cache_size=4)
        for i in range(10):
            puzzle.get_proof_target(PartialSolution(5, 1, i))
        assert len(puzzle._cache) == 4
