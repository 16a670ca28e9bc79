"""sign.verify + hash_many.psd* circuit gadgets (VERDICT r2 #5
stragglers; reference circuit/account/src/signature/verify.rs)."""
import random

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import Literal, Plaintext
from snarkvm_tpu.console import network as N
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer.circuit_exec import DualStack

PROG = """program sigcheck.aleo;

function check:
    input r0 as signature.private;
    input r1 as address.private;
    input r2 as field.private;
    sign.verify r0 r1 r2 into r3;
    hash_many.psd2 r2 into r4 r5;
    output r3 as boolean.private;
    output r4 as field.private;
"""

rng = random.Random(11)


def _run(sig, addr, msg):
    stack = Stack(parse_program(PROG))
    dual = DualStack(stack)
    outs, b = dual.execute_function("check", [
        Literal("signature", sig), Literal("address", addr),
        Literal("field", msg)])
    return outs, b, dual


def test_sign_verify_gadget_true_and_constrained():
    sk = account.PrivateKey.new(rng)
    msg = 987654321
    msg_fields = Plaintext("literal", Literal("field", msg)).to_fields()
    sig = account.Signature.sign(sk, msg_fields, rng)
    outs, b, dual = _run(sig, sk.to_address(), msg)
    assert outs[0].literal.value is True
    assert dual.weak_ops == []        # fully constrained, no fallback
    assert b.is_satisfied()
    assert b.num_constraints > 8000   # two fixed-base muls + psd8 chain
    # hash_many output matches the console twin
    want = N.hash_many_psd(2, msg_fields, 2)
    assert outs[1].literal.value == want[0]


def test_sign_verify_gadget_false_on_wrong_address():
    sk = account.PrivateKey.new(rng)
    msg = 31337
    msg_fields = Plaintext("literal", Literal("field", msg)).to_fields()
    sig = account.Signature.sign(sk, msg_fields, rng)
    other = account.PrivateKey.new(rng).to_address()
    outs, b, dual = _run(sig, other, msg)
    assert outs[0].literal.value is False
    assert dual.weak_ops == []
    assert b.is_satisfied()           # the gadget yields false, no halt
