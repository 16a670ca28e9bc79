"""Dump the transition-circuit synthesis ORDER (constraint/variable
spans per block) for a credits function — the working map for the
circuit-id interop grind (VERDICT r4 #1 step b).

The REFERENCE synthesis order (stack/execute.rs:215-240 +
circuit/program/src/request/mod.rs:150 Request::new evaluation order):

    1. root_tvk            Field::new(Private)            [1 var]
    2. tpk                 Group::new(Public)             [on-curve checks]
    3. Request::new:
       a. tcm              Field::new(Public)
       b. scm              Field::new(Public)
       c. inputs           Value::new(Private) per input  [plaintext bits]
       d. signer           Address::new(Private)          [group inject]
       e. network/program/function ids: constants         [no vars]
       f. input_ids        InputID::new(Public) per input
       g. signature        challenge, response Scalars; pk_sig, pr_sig
                           Groups; sk_prf = hash_to_scalar at inject
       h. sk_tag, tvk      Field::new(Private)
    4. is_root             Boolean::new(Public)
    5. parent              Address::new(Public)
    6. caller              Ternary(is_root, signer, parent)
    7. A::assert(request.verify(...))  -- the check phase
       (verify.rs:24: per-input message/checks in input order, then
        tcm == hash_psd2([tvk]), scm == hash_psd2([signer.x, root_tvk]),
        tpk binding + signature verify)
    8. function body (instruction gadgets in program order)
    9. Response::from_outputs (output arms in output order)

OUR current order (synthesizer/execute.py execute_function):
    1. typed input gadgets (3c FIRST)
    2. verify_request_gadget: tpk, tcm, scm, input_ids, ... checks
       (root_tvk injected late, at the scm check)
    3. body
    4. response

Matching the reference order is the prerequisite for row_M commitment
parity (tools/compare_index_commitments.py gives the pass/fail per
polynomial). Use CircuitBuilder.scope() to annotate blocks and this
tool to print the spans.

Usage: JAX_PLATFORMS=cpu python tools/dump_circuit_order.py [fn]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_credits_circuits import (  # noqa: E402
    SAMPLE_INPUTS, CREDITS, synthesize, synthesize_sampled)
from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import literal_to_str, Literal
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer.program import parse_program

import random

rng = random.Random(0xC4ED)


def main(fname):
    with open(CREDITS) as f:
        stack = Stack(parse_program(f.read()))
    pk = account.PrivateKey.new(rng)
    pk2 = account.PrivateKey.new(rng)
    addr_str = literal_to_str(Literal("address", pk2.to_address()))
    fn = stack.program.functions.get(fname)
    itypes = [(fi.value_type.split(".")[-1], fi.value_type.split(".")[0])
              for fi in fn.inputs]
    inputs = SAMPLE_INPUTS.get(fname)
    if inputs is None:
        builder = synthesize_sampled(stack, fname)
    else:
        inputs = [addr_str if i is None or i.startswith("aleo1qqq") else i
                  for i in inputs]
        builder = synthesize(stack, pk, fname, inputs, itypes)
    print(f"{fname}: {builder.num_constraints} constraints, "
          f"{len(builder.private)} private vars")
    if not builder.scopes:
        print("  (no scope annotations recorded — annotate the synthesis "
              "path with CircuitBuilder.scope())")
        return
    for label, c0, c1, v0, v1 in builder.scopes:
        print(f"  {label:40s} c[{c0:6d}:{c1:6d}] (+{c1-c0:5d})  "
              f"v[{v0:6d}:{v1:6d}] (+{v1-v0:5d})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "set_validator_state")
