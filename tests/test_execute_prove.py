"""Full execution pipeline: Request -> dual execution -> Transition -> batched proof."""
import random

from snarkvm_tpu.console import account
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.types import Plaintext
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import execute as E

rng = random.Random(8080)

PROGRAM = """
program math.aleo;

function combine:
    input r0 as field.public;
    input r1 as field.private;
    mul r0 r1 into r2;
    add r2 r1 into r3;
    output r3 as field.private;

function square_it:
    input r0 as field.private;
    square r0 into r1;
    output r1 as field.private;
"""


def test_execute_and_prove_batch():
    stack = Stack(parse_program(PROGRAM))
    srs = kzg.test_srs(64)
    sk = account.PrivateKey.new(rng)

    trace = E.Trace()
    # two instances of `combine`, one of `square_it` — multi-circuit batch
    for a, b in [(3, 5), (7, 11)]:
        req = Request.sign(sk, "math.aleo", "combine",
                           [Plaintext.literal("field", a), Plaintext.literal("field", b)],
                           [("public", "field"), ("private", "field")], rng)
        trace.insert(E.execute_function(stack, req, [("public", "field"), ("private", "field")]))
    req = Request.sign(sk, "math.aleo", "square_it",
                       [Plaintext.literal("field", 9)], [("private", "field")], rng)
    trace.insert(E.execute_function(stack, req, [("private", "field")]))

    assert trace.traced[0].transition.outputs[0][1] == (3 * 5 + 5)
    assert trace.traced[2].transition.outputs[0][1] == 81

    proof, vks = trace.prove_execution(srs, rng)
    assert E.verify_execution(srs, proof, vks)
    # tampering with a public input breaks verification
    bad_vks = [(k, vk, [list(i) for i in inputs]) for k, vk, inputs in vks]
    bad_vks[0][2][0][1] = (bad_vks[0][2][0][1] + 1) % E.R
    assert not E.verify_execution(srs, proof, bad_vks)


def test_execute_with_in_circuit_request_verify():
    """Transition circuit with the full Request::verify gadget."""
    stack = Stack(parse_program(PROGRAM))
    sk = account.PrivateKey.new(rng)
    req = Request.sign(sk, "math.aleo", "square_it",
                       [Plaintext.literal("field", 4)], [("private", "field")], rng)
    tt = E.execute_function(stack, req, [("private", "field")], verify_in_circuit=True)
    assert tt.builder.is_satisfied()
    assert tt.builder.num_constraints > 5000  # request verification dominates
    # full mode carries the in-circuit OUTPUT ID (not the raw value) —
    # reconstructible from the wire transition (verify_execution.rs:186)
    assert tt.transition.output_values[0].value == 16
    assert E.transition_public_inputs(tt.transition) == [1] + tt.builder.public[1:]


def test_authorize_then_execute_authorization():
    """Process::authorize -> Authorization -> Process::execute
    (process/src/authorize.rs:21 + execute.rs:21): the console-only
    authorization materializes the call, and the replay proves it."""
    stack = Stack(parse_program(PROGRAM))
    srs = kzg.test_srs(64)
    sk = account.PrivateKey.new(rng)

    types = [("public", "field"), ("private", "field")]
    auth = E.authorize(stack, sk, "combine",
                       [Plaintext.literal("field", 4),
                        Plaintext.literal("field", 9)], types, rng)
    assert len(auth.requests) == 1
    assert not auth.is_fee()
    assert auth.next().function_name == "combine"

    # light mode explicitly: this test exercises the authorize->replay
    # plumbing at toy SRS scale (the full protocol circuit is covered by
    # test_vm_proofs / test_transfer_private)
    trace = E.execute_authorization(stack, auth, verify_in_circuit=False)
    assert len(auth.transitions) == 1
    assert auth.to_execution_id() != 0
    proof, vks = trace.prove_execution(srs, rng)
    assert E.verify_execution(srs, proof, vks)

    # CallStack mode constants exist and are distinct
    modes = {E.CallStack.AUTHORIZE, E.CallStack.SYNTHESIZE,
             E.CallStack.CHECK_DEPLOYMENT, E.CallStack.EVALUATE,
             E.CallStack.EXECUTE, E.CallStack.PACKAGE_RUN}
    assert len(modes) == 6
