"""Index-polynomial commitment parity vs the SHIPPED mainnet verifying
keys — the gradient signal for full circuit-id interop (VERDICT r4 #1).

For each credits.aleo function we synthesize the full transition circuit,
arithmetize (matrices.rs matrix_evals), interpolate the 12 index
polynomials, commit the ones whose non-zero domain fits the SHIPPED low
SRS powers (powers-of-beta-15.usrs = 2^15 powers; nz domains of 2^16+
are not coverable offline), and compare each against the corresponding
commitment inside the shipped <fn>.verifier key.

What each label tells us when it MATCHES:
  row_M          constraint ORDER + per-row nz profile of M are exact
  col_M          variable numbering (allocation order) is exact
  row_col_M      both of the above
  row_col_val_M  the above + coefficient VALUES are exact
All 12 matching (plus counts) == the Blake2s circuit id matches ==
byte-compatibility with the shipped proving keys.

Usage: JAX_PLATFORMS=cpu python tools/compare_index_commitments.py [fn ...]
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snarkvm_tpu.params.mainnet_artifacts import MainnetSRS, credits_verifying_key
from snarkvm_tpu.snark import varuna as V
from snarkvm_tpu.polycommit import kzg

from compare_credits_circuits import (  # noqa: E402
    SAMPLE_INPUTS, ALL_SHIPPED, CREDITS, synthesize, synthesize_sampled)
from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import Plaintext, literal_from_str, literal_to_str, Literal
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer.program import parse_program

rng = random.Random(0xC4ED)

MAX_COVERABLE = 1 << 15     # powers-of-beta-15.usrs


def compare_function(stack, pk, addr_str, fname, srs):
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

    circuit = V.index(builder.to_synthesizer(), V.VarunaHidingMode)
    vk, _ = credits_verifying_key(fname)
    ref = vk.circuit_info
    info = circuit.info

    count_ok = (info.num_constraints == ref.num_constraints
                and info.num_public_inputs == ref.num_public_inputs
                and (info.num_non_zero_a, info.num_non_zero_b, info.num_non_zero_c)
                == (ref.num_non_zero_a, ref.num_non_zero_b, ref.num_non_zero_c))
    var_delta = info.num_variables - ref.num_variables

    # shipped commitments arrive in sorted-label order
    names = [(name, m) for m in "abc"
             for name in ("row", "col", "row_col", "row_col_val")]
    sorted_suffixes = sorted(f"{name}_{m}" for name, m in names)
    shipped = dict(zip(sorted_suffixes, vk.circuit_commitments))

    results = {}
    for m in "abc":
        nz_dom = circuit.non_zero_domain(m)
        ev = circuit.arith[m]
        if nz_dom > MAX_COVERABLE:
            for name in ("row", "col", "row_col", "row_col_val"):
                results[f"{name}_{m}"] = "uncoverable"
            continue
        for name, evals in (("row", ev.row), ("col", ev.col),
                            ("row_col", ev.row_col),
                            ("row_col_val", ev.row_col_val)):
            poly = V.interpolate(evals)
            comm, _ = kzg.commit(srs, poly)
            results[f"{name}_{m}"] = "MATCH" if comm == shipped[f"{name}_{m}"] \
                else "differ"

    id_match = circuit.id == vk.id
    print(f"{fname}: counts={'ok' if count_ok else 'DIFFER'} "
          f"vars{var_delta:+d} id={'MATCH' if id_match else 'differ'}")
    for m in "abc":
        line = "  " + " ".join(
            f"{name}_{m}={results[f'{name}_{m}']}"
            for name in ("row", "col", "row_col", "row_col_val"))
        print(line)
    return results, id_match


def main(names):
    with open(CREDITS) as f:
        stack = Stack(parse_program(f.read()))
    pk = account.PrivateKey.new(rng)
    pk2 = account.PrivateKey.new(rng)
    addr_str = literal_to_str(Literal("address", pk2.to_address()))
    srs = MainnetSRS()
    for fname in names:
        try:
            compare_function(stack, pk, addr_str, fname, srs)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{fname}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["transfer_public", "set_validator_state"])
