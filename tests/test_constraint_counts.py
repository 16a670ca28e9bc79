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


def _int(b, v, w, signed=False):
    return CInteger.new(b, PRIVATE, v, w, signed)


# round-2 gadget surface: every new op family x representative widths
# (the reference pins counts per type via count_is!; these goldens pin
# our structure the same way — any gadget change must be intentional)
CASES.update({
    "field_div": lambda b: CField.new(b, PRIVATE, 3).div(CField.new(b, PRIVATE, 5)),
    "field_sqrt": lambda b: CField.new(b, PRIVATE, 9).sqrt(),
    "field_pow_var": lambda b: CField.new(b, PRIVATE, 3).pow_var(CField.new(b, PRIVATE, 5)),
    "field_lt": lambda b: CField.new(b, PRIVATE, 3).lt(CField.new(b, PRIVATE, 5)),
    "i64_add_checked": lambda b: _int(b, 7, 64, True).add_checked(_int(b, -9, 64, True)),
    "i64_sub_checked": lambda b: _int(b, 7, 64, True).sub_checked(_int(b, 9, 64, True)),
    "u64_mul_checked": lambda b: _int(b, 7, 64).mul_checked(_int(b, 9, 64)),
    "i64_mul_checked": lambda b: _int(b, -7, 64, True).mul_checked(_int(b, 9, 64, True)),
    "u128_mul_checked": lambda b: _int(b, 7, 128).mul_checked(_int(b, 9, 128)),
    "i128_mul_checked": lambda b: _int(b, -7, 128, True).mul_checked(_int(b, 9, 128, True)),
    "u64_mul_wrapped": lambda b: _int(b, 7, 64).mul_wrapped(_int(b, 9, 64)),
    "u64_div_checked": lambda b: _int(b, 76, 64).div_checked(_int(b, 9, 64)),
    "i64_div_checked": lambda b: _int(b, -76, 64, True).div_checked(_int(b, 9, 64, True)),
    "u128_div_checked": lambda b: _int(b, 76, 128).div_checked(_int(b, 9, 128)),
    "u64_rem_checked": lambda b: _int(b, 76, 64).rem_checked(_int(b, 9, 64)),
    "u64_modulo": lambda b: _int(b, 76, 64).modulo(_int(b, 9, 64)),
    "i64_abs_checked": lambda b: _int(b, -7, 64, True).abs_checked(),
    "i64_abs_wrapped": lambda b: _int(b, -7, 64, True).abs_wrapped(),
    "i64_neg_checked": lambda b: _int(b, 7, 64, True).neg_checked(),
    "u8_pow_checked_u8": lambda b: _int(b, 3, 8).pow_checked(_int(b, 5, 8)),
    "u64_pow_wrapped_u8": lambda b: _int(b, 3, 64).pow_wrapped(_int(b, 5, 8)),
    "u64_shl_checked": lambda b: _int(b, 3, 64).shl_checked(_int(b, 5, 8)),
    "u64_shr_checked": lambda b: _int(b, 3, 64).shr_checked(_int(b, 5, 8)),
    "u64_lt": lambda b: _int(b, 3, 64).lt(_int(b, 5, 64)),
    "scalar_add": lambda b: _scalar(b, 5) + _scalar(b, 9),
    "scalar_lt": lambda b: _scalar(b, 5).lt(_scalar(b, 9)),
    "group_neg": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR).neg(),
    "group_double": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR).double(),
    "group_mul_scalar": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR)
        .mul_scalar(_scalar(b, 9)),
    "group_is_equal": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR)
        .is_equal(CGroup.new(b, PRIVATE, ed.mul(ed.GENERATOR, 2))),
    "address_is_equal": lambda b: _addr(b, 1).is_equal(_addr(b, 2)),
    "elligator2": lambda b: _ell(b),
    "bhp256_hash_512bits": lambda b: _bhp(b, 256, 512),
    "bhp256_hash_2blocks_1200bits": lambda b: _bhp(b, 256, 1200),
})


def _scalar(b, v):
    from snarkvm_tpu.circuit.types import CScalar
    return CScalar.new(b, PRIVATE, v)


def _addr(b, k):
    from snarkvm_tpu.circuit.types import CAddress
    return CAddress.new(b, PRIVATE, ed.mul(ed.GENERATOR, k))


def _ell(b):
    from snarkvm_tpu.circuit.elligator_gadget import elligator2_gadget
    return elligator2_gadget(b, CField.new(b, PRIVATE, 12345))


def _bhp(b, variant, nbits):
    from snarkvm_tpu.circuit.bhp_gadget import bhp_hash_gadget
    bits = [CBool.new(b, PRIVATE, (i * 7) % 3 == 1) for i in range(nbits)]
    return bhp_hash_gadget(b, variant, f"AleoBHP{variant}", bits)


# round-3 sweep: the core integer op families at EVERY width x signedness
# (the reference's count_is! covers each op of each type —
# circuit/types/integers/src/*; this is the matching regression net)
def _add_int_sweep():
    ops = {
        "add_checked": lambda a, b2: a.add_checked(b2),
        "add_wrapped": lambda a, b2: a.add_wrapped(b2),
        "sub_checked": lambda a, b2: a.sub_checked(b2),
        "sub_wrapped": lambda a, b2: a.sub_wrapped(b2),
        "mul_checked": lambda a, b2: a.mul_checked(b2),
        "mul_wrapped": lambda a, b2: a.mul_wrapped(b2),
        "div_checked": lambda a, b2: a.div_checked(b2),
        "div_wrapped": lambda a, b2: a.div_wrapped(b2),
        "rem_checked": lambda a, b2: a.rem_checked(b2),
        "rem_wrapped": lambda a, b2: a.rem_wrapped(b2),
        "modulo": lambda a, b2: a.modulo(b2),
        "bitand": lambda a, b2: a.bitand(b2),
        "bitor": lambda a, b2: a.bitor(b2),
        "bitxor": lambda a, b2: a.bitxor(b2),
        "nand": lambda a, b2: a.nand_int(b2),
        "nor": lambda a, b2: a.nor_int(b2),
        "lt": lambda a, b2: a.lt(b2),
        "lte": lambda a, b2: a.lte(b2),
        "gt": lambda a, b2: a.gt(b2),
        "gte": lambda a, b2: a.gte(b2),
        "is_equal": lambda a, b2: a.is_equal(b2),
        "ternary": lambda a, b2: a.ternary(
            CBool.new(a.b, PRIVATE, True), b2),
    }
    unary = {
        "bitnot": lambda a: a.bitnot(),
        "neg_wrapped": lambda a: a.neg_wrapped(),
        "abs_checked": lambda a: a.abs_checked(),
        "abs_wrapped": lambda a: a.abs_wrapped(),
        "is_zero": lambda a: a.is_zero(),
        "to_field": lambda a: a.to_field(),
    }
    shift = {
        "shl_checked": lambda a, s: a.shl_checked(s),
        "shr_checked": lambda a, s: a.shr_checked(s),
        "shl_wrapped": lambda a, s: a.shl_wrapped(s),
        "shr_wrapped": lambda a, s: a.shr_wrapped(s),
    }
    for w in (8, 16, 32, 64, 128):
        for signed in (False, True):
            t = ("i" if signed else "u") + str(w)
            va = 7 if not signed else -7
            vb = 3
            for name, fn in ops.items():
                if name == "modulo" and signed:
                    continue     # modulo is unsigned-only (console halts)
                CASES[f"{t}_{name}"] = (
                    lambda b, fn=fn, w=w, s=signed, va=va, vb=vb:
                    fn(_int(b, va, w, s), _int(b, vb, w, s)))
            for name, fn in unary.items():
                if name.startswith(("abs", "neg")) and not signed:
                    continue     # signed-only ops
                CASES[f"{t}_{name}"] = (
                    lambda b, fn=fn, w=w, s=signed, va=va: fn(_int(b, va, w, s)))
            for name, fn in shift.items():
                CASES[f"{t}_{name}"] = (
                    lambda b, fn=fn, w=w, s=signed, va=va:
                    fn(_int(b, va, w, s), _int(b, 2, 8)))


_add_int_sweep()


def _record_fixture(b):
    import random as _r
    from snarkvm_tpu.console import account, network as NW
    from snarkvm_tpu.console.record import Record, Entry
    from snarkvm_tpu.console.types import Identifier, Plaintext
    from snarkvm_tpu.circuit.record_gadget import RecordGadget
    from snarkvm_tpu.params import bls12_377 as PP
    rng = _r.Random(5)
    sk = account.PrivateKey.new(rng)
    rec = Record(sk.to_address(), "private",
                 [(Identifier("amount"),
                   Entry("private", Plaintext.literal("u64", 777)))],
                 NW.g_scalar_multiply(rng.randrange(PP.S)))
    return RecordGadget.inject(b, rec)


# round-3 gadget families (records, serial numbers, sign.verify, sponge)
CASES.update({
    "record_to_commitment": lambda b: _record_fixture(b)
        .to_commitment("credits.aleo", "credits"),
    "record_serial_number_from_gamma": lambda b: __import__(
        "snarkvm_tpu.circuit.record_gadget", fromlist=["x"])
        .serial_number_from_gamma_gadget(
            b, CGroup.new(b, PRIVATE, ed.mul(ed.GENERATOR, 7)),
            CField.new(b, PRIVATE, 12345)),
    "record_tag": lambda b: __import__(
        "snarkvm_tpu.circuit.record_gadget", fromlist=["x"])
        .record_tag_gadget(b, CField.new(b, PRIVATE, 5),
                           CField.new(b, PRIVATE, 7)),
    "poseidon4_hash_2": lambda b: poseidon_gadget.hash_psd(
        b, 4, [CField.new(b, PRIVATE, 7), CField.new(b, PRIVATE, 9)]),
    "poseidon8_hash_4": lambda b: poseidon_gadget.hash_psd(
        b, 8, [CField.new(b, PRIVATE, i + 2) for i in range(4)]),
    "scalar_to_field": lambda b: _scalar(b, 9).to_field(),
    "group_ternary": lambda b: CGroup.new(b, PRIVATE, ed.GENERATOR).ternary(
        CBool.new(b, PRIVATE, True),
        CGroup.new(b, PRIVATE, ed.mul(ed.GENERATOR, 2))),
    "field_square": lambda b: CField.new(b, PRIVATE, 3).square(),
    "bool_or": lambda b: CBool.new(b, PRIVATE, True) | CBool.new(b, PRIVATE, False),
    "bool_not": lambda b: ~CBool.new(b, PRIVATE, True),
})


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
