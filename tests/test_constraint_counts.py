"""Constraint-count goldens (the UpdatableCount analog,
circuit/environment/src/helpers/updatable_count.rs): every gadget op
asserts exact (constraints, public, private) counts against
tests/goldens/constraint_counts.json; UPDATE_COUNT=1 regenerates.
"""
import json
import os

import pytest

from snarkvm_tpu.circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
from snarkvm_tpu.circuit.types import CField, CBool, CInteger, CGroup
from snarkvm_tpu.circuit import poseidon_gadget
from snarkvm_tpu.curves import edwards as ed

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "constraint_counts.json")


def _counts(build_fn):
    b = CircuitBuilder()
    build_fn(b)
    assert b.is_satisfied()
    return [b.num_constraints, b.num_public, b.num_private]


CASES = {
    "field_mul": lambda b: CField.new(b, PRIVATE, 3) * CField.new(b, PRIVATE, 5),
    "field_inverse": lambda b: CField.new(b, PRIVATE, 3).inverse(),
    "field_is_equal": lambda b: CField.new(b, PRIVATE, 3).is_equal(CField.new(b, PRIVATE, 5)),
    "field_ternary": lambda b: CField.new(b, PRIVATE, 3).ternary(
        CBool.new(b, PRIVATE, True), CField.new(b, PRIVATE, 5)),
    "field_to_bits": lambda b: CField.new(b, PRIVATE, 3).to_bits_le(),
    "bool_and": lambda b: CBool.new(b, PRIVATE, True) & CBool.new(b, PRIVATE, False),
    "bool_xor": lambda b: CBool.new(b, PRIVATE, True) ^ CBool.new(b, PRIVATE, False),
    "u64_add_checked": lambda b: CInteger.new(b, PRIVATE, 7, 64).add_checked(
        CInteger.new(b, PRIVATE, 9, 64)),
    "u64_add_wrapped": lambda b: CInteger.new(b, PRIVATE, 7, 64).add_wrapped(
        CInteger.new(b, PRIVATE, 9, 64)),
    "group_add": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR)
        + CGroup.new(b, PRIVATE, ed.mul(ed.GENERATOR, 2)),
    "poseidon2_hash_1": lambda b: poseidon_gadget.hash_psd(
        b, 2, [CField.new(b, PRIVATE, 7)]),
}


def test_constraint_counts():
    got = {name: _counts(fn) for name, fn in CASES.items()}
    if os.environ.get("UPDATE_COUNT") == "1" or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip("constraint-count goldens regenerated")
    want = json.load(open(GOLDEN))
    assert got == want, (
        "constraint counts drifted — review the gadget change, then rerun "
        "with UPDATE_COUNT=1 to accept")
