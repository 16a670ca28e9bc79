"""Full protocol transition circuit: Request::verify + function body +
Response::from_outputs in ONE circuit with shared witnesses
(stack/execute.rs:225 A::assert(request.verify) ... response/from_outputs).

The typed input gadgets are bit-bound to the packed plaintext fields used
by the request commitments, and the output IDs are recomputed in-circuit
and exposed publicly — matching console Response::new exactly."""
import random

import pytest

from snarkvm_tpu.console import account, network as N
from snarkvm_tpu.console.request import Request, Response
from snarkvm_tpu.console.types import Plaintext, literal_from_str
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import execute as E

rng = random.Random(0x9E5)

PROG = """program demo.aleo;

function combine:
    input r0 as u32.public;
    input r1 as u32.private;
    mul.w r0 r1 into r2;
    xor r2 r0 into r3;
    output r3 as u32.private;

function reveal:
    input r0 as field.private;
    square r0 into r1;
    output r1 as field.public;
"""


def _request(stack, pk, fn, inputs, itypes):
    pts = [Plaintext("literal", literal_from_str(i)) for i in inputs]
    return Request.sign(pk, "demo.aleo", fn, pts, itypes, rng), pts


@pytest.fixture(scope="module")
def env():
    return Stack(parse_program(PROG)), account.PrivateKey.new(rng)


class TestProtocolCircuit:
    def test_private_output_id_matches_response(self, env):
        stack, pk = env
        itypes = [("public", "u32"), ("private", "u32")]
        req, _ = _request(stack, pk, "combine", ["7u32", "9u32"], itypes)
        tt = E.execute_function(stack, req, itypes, verify_in_circuit=True)
        assert tt.builder.is_satisfied()
        out = Plaintext("literal", literal_from_str(f"{(7 * 9) ^ 7}u32"))
        resp = Response.new(N.ID, "demo.aleo", "combine", 2, req.tvk, req.tcm,
                            [out], [("private", "u32")])
        assert tt.builder.public[-1] == resp.output_ids[0].fields[0]

    def test_public_output_id_matches_response(self, env):
        stack, pk = env
        itypes = [("private", "field")]
        req, _ = _request(stack, pk, "reveal", ["5field"], itypes)
        tt = E.execute_function(stack, req, itypes, verify_in_circuit=True)
        assert tt.builder.is_satisfied()
        out = Plaintext("literal", literal_from_str("25field"))
        resp = Response.new(N.ID, "demo.aleo", "reveal", 1, req.tvk, req.tcm,
                            [out], [("public", "field")])
        assert tt.builder.public[-1] == resp.output_ids[0].fields[0]

    def test_circuit_has_real_constraints(self, env):
        stack, pk = env
        itypes = [("public", "u32"), ("private", "u32")]
        req, _ = _request(stack, pk, "combine", ["3u32", "4u32"], itypes)
        tt = E.execute_function(stack, req, itypes, verify_in_circuit=True)
        # request verify (~9k) + body + response hashing
        assert tt.builder.num_constraints > 9_500

    def test_tampered_signature_fails(self, env):
        stack, pk = env
        itypes = [("public", "u32"), ("private", "u32")]
        req, _ = _request(stack, pk, "combine", ["3u32", "4u32"], itypes)
        import dataclasses
        req.signature = dataclasses.replace(
            req.signature, response=(req.signature.response + 1) % (2**250))
        with pytest.raises(Exception):
            tt = E.execute_function(stack, req, itypes, verify_in_circuit=True)
            assert not tt.builder.is_satisfied()
            raise AssertionError("unsatisfied")
