"""Structural-parity diagnostic (VERDICT r1 item 3): synthesize
credits.aleo functions through the FULL transition circuit
(Request::verify + body + Response::from_outputs) and compare the
resulting circuit shape against the SHIPPED mainnet verifier keys'
CircuitInfo (parameters/src/mainnet/resources/<fn>.verifier, id per
algorithms/src/snark/varuna/ahp/indexer/circuit.rs:40).

This is the measuring stick for gadget-structure parity: exact equality
of (constraints, variables, non-zeros) — and ultimately the Blake2
circuit id — proves byte-compatibility with Aleo's shipped proving keys.

Usage: JAX_PLATFORMS=cpu python tools/compare_credits_circuits.py [fn ...]
"""
import random
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snarkvm_tpu.console import account
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.types import Plaintext, literal_from_str
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer import execute as E
from snarkvm_tpu.params.mainnet_artifacts import credits_verifying_key

rng = random.Random(0xC4ED)

CREDITS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "snarkvm_tpu", "synthesizer", "resources", "credits.aleo")

SAMPLE_INPUTS = {
    "transfer_public": ["aleo1qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq5g5tz2", "1000000u64"],
    "transfer_public_as_signer": [None, "1000000u64"],
    "fee_public": ["1000u64", "10u64", "123field"],
    "bond_validator": [None, "1000000u64", "10u8"],
    "bond_public": [None, None, "1000000u64"],
    "unbond_public": [None, "1000000u64"],
    "claim_unbond_public": [None],
    "set_validator_state": ["true"],
}


def synthesize(stack, pk, fname, inputs, itypes):
    pts = [Plaintext("literal", literal_from_str(i)) for i in inputs]
    req = Request.sign(pk, "credits.aleo", fname, pts, itypes, rng)
    tt = E.execute_function(stack, req, itypes, verify_in_circuit=True)
    return tt.builder


def synthesize_sampled(stack, fname):
    """Burner-sampled synthesis — the deploy/key-synthesis path
    (stack/helpers/synthesize.rs shape); handles record inputs."""
    from snarkvm_tpu.synthesizer.deploy import synthesize_function_circuit
    return synthesize_function_circuit(stack, fname, rng).builder


def main(names):
    with open(CREDITS) as f:
        stack = Stack(parse_program(f.read()))
    pk = account.PrivateKey.new(rng)
    from snarkvm_tpu.console.types import literal_to_str, Literal
    # a SECOND keypair's address for targets: bond_validator and friends
    # assert.neq the signer against the withdrawal/validator address
    pk2 = account.PrivateKey.new(rng)
    addr_str = literal_to_str(Literal("address", pk2.to_address()))

    for fname in names:
        fn = stack.program.functions.get(fname)
        if fn is None:
            print(f"{fname}: no such function")
            continue
        itypes = [(fi.value_type.split(".")[-1], fi.value_type.split(".")[0])
                  for fi in fn.inputs]
        inputs = SAMPLE_INPUTS.get(fname)
        try:
            if inputs is None:
                builder = synthesize_sampled(stack, fname)
            else:
                inputs = [addr_str if i is None or i.startswith("aleo1qqq")
                          else i for i in inputs]
                builder = synthesize(stack, pk, fname, inputs, itypes)
        except Exception as e:
            print(f"{fname}: synthesis failed: {type(e).__name__}: {e}")
            continue
        # apples-to-apples: the reference CircuitInfo records the
        # POST-PADDING counts (ahp/indexer/indexer.rs:170
        # num_padded_public_variables) — index ours the same way
        from snarkvm_tpu.snark import varuna as V
        circ = V.index(builder.to_synthesizer(), V.VarunaHidingMode)
        info = circ.info
        try:
            vk, _ = credits_verifying_key(fname)
            ref = vk.circuit_info
            print(f"{fname}:")
            print(f"  ours:    constraints={info.num_constraints} "
                  f"variables={info.num_variables} "
                  f"public={info.num_public_inputs} "
                  f"nz=({info.num_non_zero_a}, {info.num_non_zero_b}, "
                  f"{info.num_non_zero_c})")
            print(f"  shipped: constraints={ref.num_constraints} "
                  f"variables={ref.num_variables} "
                  f"public={ref.num_public_inputs} "
                  f"nz=({ref.num_non_zero_a}, {ref.num_non_zero_b}, "
                  f"{ref.num_non_zero_c})")
        except FileNotFoundError:
            print(f"{fname}: ours constraints={builder.num_constraints} "
                  f"(no shipped key)")


ALL_SHIPPED = list(SAMPLE_INPUTS) + [
    "join", "split", "transfer_private", "transfer_private_to_public",
    "transfer_public_to_private", "fee_private",
]

if __name__ == "__main__":
    names = sys.argv[1:] or ALL_SHIPPED
    main(names)
