"""In-circuit Request verification."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.types import Plaintext
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CField
from snarkvm_tpu.circuit.request_gadget import verify_request_gadget

rng = random.Random(42424)


def _build(request, types, inputs):
    b = CircuitBuilder()
    gadget_inputs = []
    for inp in inputs:
        fields = inp.to_fields()
        gadget_inputs.append([CField.new(b, PRIVATE, f) for f in fields])
    verify_request_gadget(b, request, types, gadget_inputs)
    return b


def test_request_gadget_satisfied():
    sk = account.PrivateKey.new(rng)
    inputs = [Plaintext.literal("u64", 1000), Plaintext.literal("field", 7)]
    types = [("public", "u64"), ("private", "field")]
    req = Request.sign(sk, "credits.aleo", "transfer_public", inputs, types, rng)
    assert req.verify(types)
    b = _build(req, types, inputs)
    assert b.is_satisfied()
    print("constraints:", b.num_constraints, "public:", b.num_public)


def test_request_gadget_rejects_forged_challenge():
    sk = account.PrivateKey.new(rng)
    inputs = [Plaintext.literal("u64", 5)]
    types = [("public", "u64")]
    req = Request.sign(sk, "demo.aleo", "f", inputs, types, rng)
    from snarkvm_tpu.console.account import Signature
    forged = Signature((req.signature.challenge + 1), req.signature.response,
                       req.signature.compute_key)
    import dataclasses
    bad = dataclasses.replace(req, signature=forged)
    b = _build(bad, types, inputs)
    assert not b.is_satisfied()
