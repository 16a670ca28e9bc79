"""Restrictions subsystem (synthesizer/src/restrictions/): block-range
blocklists for programs / functions / arguments, the BHP-1024 restrictions
ID, serde-compatible JSON, and the VM verification gate."""
import pytest

from snarkvm_tpu.synthesizer.restrictions import (
    Restrictions, BlockRange, ArgumentLocator,
)
from snarkvm_tpu.console.types import Literal
from snarkvm_tpu.ledger.block import Transition

# parameters/src/mainnet/resources/restrictions.json ships an EMPTY list
# with this ID — our compute_restrictions_id must reproduce it bit-exact.
MAINNET_EMPTY_ID = 7562506206353711030068167991213732850758501012603348777370400520506564970105


def _transition(prog="restricted.aleo", fn="foo", input_values=None,
                output_values=None):
    return Transition(program_id=prog, function_name=fn, inputs=[],
                      outputs=[], input_values=input_values,
                      output_values=output_values)


class TestBlockRange:
    def test_contains(self):
        assert BlockRange("range", 10, 20).contains(10)
        assert BlockRange("range", 10, 20).contains(19)
        assert not BlockRange("range", 10, 20).contains(20)
        assert not BlockRange("range", 10, 20).contains(5)
        assert BlockRange("from", 10).contains(10 ** 9)
        assert not BlockRange("from", 10).contains(9)
        assert BlockRange("to", end=10).contains(9)
        assert not BlockRange("to", end=10).contains(10)
        assert BlockRange("inclusive", 10, 20).contains(20)
        assert BlockRange("full").contains(0)

    def test_json_round_trip(self):
        for r in (BlockRange("range", 1, 5), BlockRange("from", 3),
                  BlockRange("to", end=9), BlockRange("inclusive", 2, 4),
                  BlockRange("full")):
            assert BlockRange.from_json(r.to_json()) == r


class TestRestrictionsId:
    def test_mainnet_empty_golden(self):
        assert Restrictions.new_blank().restrictions_id == MAINNET_EMPTY_ID

    def test_id_changes_with_content(self):
        r = Restrictions(programs={"restricted.aleo": BlockRange("full")})
        assert r.restrictions_id != MAINNET_EMPTY_ID


class TestQueries:
    def test_program_restricted(self):
        # mirrors restrictions/mod.rs test_restrictions_program_restricted
        r = Restrictions(programs={"restricted.aleo": BlockRange("range", 10, 20)})
        assert not r.is_program_restricted("restricted.aleo", 5)
        assert r.is_program_restricted("restricted.aleo", 10)
        assert r.is_program_restricted("restricted.aleo", 15)
        assert not r.is_program_restricted("restricted.aleo", 20)
        assert not r.is_program_restricted("other.aleo", 15)

    def test_function_restricted(self):
        r = Restrictions(functions={("p.aleo", "bar"): BlockRange("from", 7)})
        assert r.is_function_restricted("p.aleo", "bar", 7)
        assert not r.is_function_restricted("p.aleo", "bar", 6)
        assert not r.is_function_restricted("p.aleo", "baz", 7)

    def test_argument_restricted(self):
        lit = Literal("u64", 42)
        r = Restrictions(arguments={
            ("p.aleo", "f"): {
                ArgumentLocator(True, 1): [(lit, BlockRange("full"))]}})
        t = _transition("p.aleo", "f",
                        input_values=[Literal("u64", 7), Literal("u64", 42)])
        assert r.is_argument_restricted(t, 0)
        t2 = _transition("p.aleo", "f",
                         input_values=[Literal("u64", 42), Literal("u64", 7)])
        assert not r.is_argument_restricted(t2, 0)  # wrong index
        t3 = _transition("p.aleo", "f")              # values unknown
        assert not r.is_argument_restricted(t3, 0)

    def test_contains_restricted_transitions(self):
        r = Restrictions(programs={"bad.aleo": BlockRange("full")})
        ts = [_transition("good.aleo"), _transition("bad.aleo")]
        assert r.contains_restricted_transitions(ts, 1)
        assert not r.contains_restricted_transitions([_transition("good.aleo")], 1)


class TestSerde:
    def test_json_round_trip(self):
        r = Restrictions(
            programs={"a.aleo": BlockRange("range", 1, 9)},
            functions={("b.aleo", "f"): BlockRange("full")},
            arguments={("c.aleo", "g"): {
                ArgumentLocator(False, 0): [
                    (Literal("u8", 3), BlockRange("inclusive", 4, 5))]}})
        r2 = Restrictions.from_json_str(r.to_json_str())
        assert r2.restrictions_id == r.restrictions_id
        assert r2.programs == r.programs
        assert r2.functions == r.functions
        assert r2.is_argument_restricted(
            _transition("c.aleo", "g", output_values=[Literal("u8", 3)]), 4)

    def test_id_mismatch_rejected(self):
        bad = Restrictions.new_blank().to_json_str().replace(
            str(MAINNET_EMPTY_ID), "123")
        with pytest.raises(ValueError, match="restrictions ID"):
            Restrictions.from_json_str(bad)


class TestVMGate:
    def test_vm_rejects_restricted_program(self):
        from snarkvm_tpu.synthesizer.vm import VM
        from snarkvm_tpu.console.account import PrivateKey
        vm = VM()
        vm.process.deploy(
            "program nop_r.aleo;\n"
            "function run:\n    input r0 as u64.public;\n"
            "    add r0 r0 into r1;\n    output r1 as u64.public;\n")
        pk = PrivateKey.from_seed(7)
        pending = vm.execute(pk, "nop_r.aleo", "run", ["3u64"],
                             [("public", "u64")])
        # unrestricted: only the missing-fee check may fire
        with pytest.raises(ValueError, match="missing a fee"):
            vm.check_transaction(pending)
        vm.restrictions = Restrictions(
            programs={"nop_r.aleo": BlockRange("full")})
        with pytest.raises(ValueError, match="restricted"):
            vm.check_transaction(pending)
