"""The developer loop (snarkvm run analog): parse -> dual-execute -> prove -> verify."""
import random

from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.snark import varuna
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer.circuit_exec import DualStack, prove_run

PROGRAM = """
program demo.aleo;

function compute:
    input r0 as field.public;
    input r1 as field.private;
    mul r0 r1 into r2;
    add r2 r1 into r3;
    square r3 into r4;
    output r4 as field.private;
"""

rng = random.Random(1234)


def test_dual_execution_consistency():
    stack = Stack(parse_program(PROGRAM))
    dual = DualStack(stack)
    outputs, builder = dual.execute_function("compute", ["3field", "5field"])
    # console result: ((3*5)+5)^2 = 400
    assert outputs[0].literal.value == 400
    assert builder.is_satisfied()
    # tampering with a witness breaks satisfaction
    builder.private[0] = (builder.private[0] + 1) % varuna.R
    assert not builder.is_satisfied()


def test_prove_run_end_to_end():
    srs = kzg.test_srs(64)
    stack = Stack(parse_program(PROGRAM))
    outputs, proof, vk, public, _ = prove_run(srs, stack, "compute", ["3field", "5field"], rng)
    assert outputs[0].literal.value == 400
    assert varuna.verify_batch(srs, [(vk, [public])], proof)
    bad = list(public)
    bad[1] = (bad[1] + 1) % varuna.R
    assert not varuna.verify_batch(srs, [(vk, [bad])], proof)
