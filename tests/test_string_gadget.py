"""CString gadget (circuit/types/string): byte-vector equality and
plaintext packing bit-exact vs the console StringType."""
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CString
from snarkvm_tpu.circuit.response_gadget import plaintext_fields_gadget
from snarkvm_tpu.console.types import Plaintext
from snarkvm_tpu.console import network as N


def test_cstring_equality():
    b = CircuitBuilder()
    s1 = CString.new(b, PRIVATE, "hello")
    s2 = CString.new(b, PRIVATE, "hello")
    s3 = CString.new(b, PRIVATE, "jello")
    s4 = CString.new(b, PRIVATE, "hell")
    assert b.value_of(s1.is_equal(s2).lc) == 1
    assert b.value_of(s1.is_equal(s3).lc) == 0
    assert b.value_of(s1.is_equal(s4).lc) == 0   # length mismatch
    assert b.is_satisfied()


def test_cstring_plaintext_packing_matches_console():
    b = CircuitBuilder()
    g = CString.new(b, PRIVATE, "snarkvm-tpu")
    fields = plaintext_fields_gadget(b, g, "string")
    want = Plaintext.literal("string", "snarkvm-tpu").to_fields()
    assert [b.value_of(x.lc) for x in fields] == want
    assert b.is_satisfied()


def test_cstring_hash_via_dual_exec():
    """is.eq over string registers takes the gadget path (no weak op)."""
    import os, random
    from snarkvm_tpu.synthesizer.program import parse_program
    from snarkvm_tpu.synthesizer.process import Stack
    from snarkvm_tpu.synthesizer.circuit_exec import DualStack
    from snarkvm_tpu.console.types import Literal
    os.environ["SNARKVM_TPU_STRICT_CIRCUIT"] = "1"
    try:
        prog = """program stringy.aleo;

function same:
    input r0 as string.private;
    input r1 as string.private;
    is.eq r0 r1 into r2;
    output r2 as boolean.private;
"""
        stack = Stack(parse_program(prog))
        dual = DualStack(stack)
        outs, b = dual.execute_function(
            "same", [Literal("string", "abc"), Literal("string", "abc")])
        assert outs[0].literal.value is True
        assert dual.weak_ops == []
        assert b.is_satisfied()
    finally:
        os.environ.pop("SNARKVM_TPU_STRICT_CIRCUIT", None)
