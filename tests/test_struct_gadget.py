"""Struct plaintext gadgets (CStruct): cast-to-struct, member access,
struct hashing, and struct inputs/outputs through the FULL transition
circuit with zero weak ops (circuit/program plaintext Struct arm)."""
import os
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.types import Plaintext, Identifier
from snarkvm_tpu.console import network as N
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import execute as E

PROG = """program structy.aleo;

struct pair:
    a as u32;
    b as field;

function mk:
    input r0 as u32.private;
    input r1 as field.private;
    cast r0 r1 into r2 as pair;
    add r2.a r0 into r3;
    hash.psd2 r2 into r4 as field;
    output r2 as pair.private;
    output r3 as u32.private;
    output r4 as field.private;

function eat:
    input r0 as pair.private;
    add r0.a r0.a into r1;
    output r1 as u32.private;
"""

rng = random.Random(3)


@pytest.fixture(autouse=True)
def _strict():
    os.environ["SNARKVM_TPU_STRICT_CIRCUIT"] = "1"
    yield
    os.environ.pop("SNARKVM_TPU_STRICT_CIRCUIT", None)


def test_struct_cast_member_hash_output():
    stack = Stack(parse_program(PROG))
    sk = account.PrivateKey.new(rng)
    types = [("private", "u32"), ("private", "field")]
    req = Request.sign(sk, "structy.aleo", "mk",
                       [Plaintext.literal("u32", 9),
                        Plaintext.literal("field", 77)], types, rng)
    tt = E.execute_function(stack, req, types, verify_in_circuit=True)
    assert tt.builder.is_satisfied()
    assert tt.weak_ops == []
    assert tt.transition.output_values[1].value == 18
    # the struct hash matches the console twin
    st = Plaintext("struct", [(Identifier("a"), Plaintext.literal("u32", 9)),
                              (Identifier("b"), Plaintext.literal("field", 77))])
    assert tt.transition.output_values[2].value == N.hash_psd(2, st.to_fields())
    assert E.transition_public_inputs(tt.transition) == \
        [1] + tt.builder.public[1:]


def test_struct_function_input():
    stack = Stack(parse_program(PROG))
    sk = account.PrivateKey.new(rng)
    st_in = Plaintext("struct", [(Identifier("a"), Plaintext.literal("u32", 4)),
                                 (Identifier("b"), Plaintext.literal("field", 5))])
    types = [("private", "pair")]
    req = Request.sign(sk, "structy.aleo", "eat", [st_in], types, rng)
    tt = E.execute_function(stack, req, types, verify_in_circuit=True)
    assert tt.builder.is_satisfied()
    assert tt.weak_ops == []
    assert tt.transition.output_values[0].value == 8
    assert E.transition_public_inputs(tt.transition) == \
        [1] + tt.builder.public[1:]
